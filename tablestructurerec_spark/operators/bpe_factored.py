"""Vocabulary-factored BPE token counting — the 100 TB tokenization trick.

`operators/bpe.py q_token_count_bpe` runs the ~35-pass regexp merge chain
over every DOCUMENT.  But natural-language corpora obey Heaps' law: a
corpus with 10^12 word *occurrences* has only ~10^7–10^8 distinct word
*types*, and this tokenizer's merges never cross the space separator
(spaces are never marker-wrapped, so no merge pattern
``\\x02a\\x03\\x02b\\x03`` can span one — the same structural fact
``tests/test_bpe.py`` pins).  Token count is therefore exactly
word-decomposable::

    tokens(doc) = Σ_word count(word, doc) · tokens(word)

so the merge chain needs to run once per distinct WORD, not once per
document occurrence — a 10^4–10^5× reduction in regexp work at corpus
scale.  This module computes byte-identical ``(n_words, n_bpe_tokens,
bpe_per_word)`` to the direct encoder via that factoring (pinned exactly
by ``tests/test_bpe_factored.py``); only ``enc_md5`` (a hash of the full
per-doc encoding) is inherently non-factorable and is omitted.

Spark shape, audited for 100 TB:

* occurrences: explode tokens → ``groupBy(doc_id, word).count()`` — one
  shuffle with map-side combine (the combine collapses each document's
  repeated words before anything moves);
* vocabulary: ``groupBy(word)`` partial-agg distinct — shuffles only
  (word) pairs, already tiny;
* the regexp chain runs on the DISTINCT-WORD frame only — at most one
  encode per word type in the corpus, the whole point;
* re-attach: equi-join occurrences × encoded-vocab on word.  The vocab
  side is millions of short rows (MBs–GBs); AQE broadcasts it at small
  scale and shuffle-joins it at large — either way it is the join's
  bounded side;
* per-doc sum: one ``groupBy(doc_id)`` with partial agg; a left join from
  ``documents`` preserves zero-word docs.

Three high-cardinality shuffles of small rows replace 35 regexp passes ×
every byte of the corpus — at 100 TB the regexp chain is the dominant
cost and this is the difference between a tokenization job that takes a
day and one that takes minutes.

Measured crossover (SCALING.md §6g): on the fixture's short word-soup
docs the direct encoder wins (regexp work too small to amortize the
shuffles); scaling document LENGTH 20× at constant vocabulary flips it
(direct 5.32 s — linear in bytes — vs factored 3.13 s, flat), which is
the asymptote that matters at web-document lengths.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bpe import _bpe_encode_sql, _sql_chr, _E, bpe_encode_col, bpe_token_count_col
from .textstats import tokens_col, tokens_sql

__all__ = ["QUERIES", "q_token_count_bpe_factored", "_TOKEN_COUNT_BPE_FACTORED_SQL"]


def q_token_count_bpe_factored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document ``(doc_id, n_words, n_bpe_tokens, bpe_per_word)`` —
    byte-identical to ``q_token_count_bpe``'s same-named columns, computed
    with one BPE encode per distinct word type instead of per document."""
    from tablestructurerec_spark.sources.read import read_table

    docs = read_table(spark, sf_dir, "documents")
    occurrences = (
        docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = occurrences.select("word").groupBy("word").agg(F.lit(1).alias("_one"))
    # the ~35-pass merge chain — once per distinct word type, staged so the
    # chain is evaluated a single time (SCALING.md §4d)
    encoded = vocab.select("word", bpe_encode_col(F.col("word")).alias("enc"))
    vocab_tok = encoded.select(
        "word", bpe_token_count_col(F.col("enc")).alias("n_tok")
    )
    per_doc = (
        occurrences.join(vocab_tok, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_tok")).alias("n_bpe"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_words"), F.lit(0)).cast("int").alias("n_words"),
            F.coalesce(F.col("n_bpe"), F.lit(0)).cast("int").alias("n_bpe_tokens"),
            F.when(
                F.coalesce(F.col("n_words"), F.lit(0)) > 0,
                F.round(F.col("n_bpe") / F.col("n_words"), 6),
            )
            .otherwise(0.0)
            .alias("bpe_per_word"),
        )
        .orderBy("doc_id")
    )


_TOKEN_COUNT_BPE_FACTORED_SQL = f"""
WITH occurrences AS (
  SELECT doc_id, word, count(*) AS cnt
  FROM (SELECT doc_id, unnest({tokens_sql()}) AS word FROM documents)
  GROUP BY doc_id, word
), vocab_tok AS (
  SELECT word,
         CAST(length(e) - length(replace(e, {_sql_chr(_E)}, '')) AS INT) AS n_tok
  FROM (SELECT word, {_bpe_encode_sql('word')} AS e
        FROM (SELECT DISTINCT word FROM occurrences))
), per_doc AS (
  SELECT doc_id, SUM(cnt) AS n_words, SUM(cnt * n_tok) AS n_bpe
  FROM occurrences JOIN vocab_tok USING (word)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_words, 0) AS INT) AS n_words,
       CAST(coalesce(p.n_bpe, 0) AS INT) AS n_bpe_tokens,
       CASE WHEN coalesce(p.n_words, 0) > 0
            THEN ROUND(p.n_bpe * 1.0 / p.n_words, 6)
            ELSE 0.0 END AS bpe_per_word
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_token_count_bpe_factored": q_token_count_bpe_factored,
}
