"""BPE token counting — real tokenizer-token budgets, JVM-side.

Real pretraining pipelines budget sequence packing and domain mixing in
tokenizer (BPE) tokens, not regex splits.  The classic BPE encode loop
("find the lowest-rank adjacent pair present, merge all its occurrences,
repeat") looks iterative and Python-bound, but for a FIXED merge table it
collapses to a rank-ordered chain of global string replacements, because a
merge's components always predate it: rank r's pair is built from single
characters and outputs of ranks < r, so no later merge can create an
occurrence of an earlier pair (``tests/test_bpe.py`` pins this equivalence
against the classic min-rank reference encoder on random strings).  A chain
of ``regexp_replace`` calls is whole-stage-codegen'd JVM work — no Python in
the hot path — and has a byte-identical DuckDB twin, so the operator gets a
full value-hash oracle (unlike a UDF-bound tokenizer).

Token-boundary encoding: each token is wrapped ``\\x02 token \\x03``.  The
markers make every merge pattern ``\\x02 a \\x03 \\x02 b \\x03`` anchor at
token boundaries (no mid-token false matches — RE2 has no lookarounds to do
this with bare separators) and make adjacent matches non-overlapping, so one
global left-to-right replace pass IS the exhaustive merge step: with a
shared single separator, ``[a,b,a,b]`` under merge (a,b) would consume the
second pair's leading separator and miss it.

The merge table is a deterministic in-repo literal (common English digraphs
in classic BPE-training order — the shape, not the weights, is what the
engine must handle); swapping in a production tokenizer's merges is a data
change, not a code change.  A pandas_udf twin (``bpe_tokens_pandas``) holds
the seat real tokenizer libraries would occupy and is asserted equal to the
native chain.

At 100 TB: scan + ~35 chained regexp passes per doc, no shuffle, no Python —
embarrassingly parallel; the presentation sort is the only exchange.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .textstats import tokens_sql

__all__ = [
    "MERGES",
    "QUERIES",
    "ORACLE_SQL",
    "bpe_encode_col",
    "bpe_token_count_col",
    "bpe_encode_py",
    "bpe_encode_classic",
    "q_token_count_bpe",
]

_S, _E = "\x02", "\x03"  # token start / end markers

# Ordered merge table: every component is a single character or the output
# of an earlier merge, and outputs are distinct — the two structural facts
# the rank-ordered-chain equivalence proof needs (asserted by test_bpe.py).
MERGES: List[Tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("o", "n"),
    ("r", "e"), ("e", "r"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("e", "s"), ("s", "t"), ("a", "r"), ("a", "l"), ("o", "u"),
    ("in", "g"), ("an", "d"), ("t", "o"), ("i", "t"), ("i", "s"),
    ("e", "d"), ("o", "f"), ("th", "at"), ("er", "s"), ("c", "on"),
    ("d", "e"), ("c", "h"), ("l", "e"), ("r", "o"), ("u", "s"),
    ("m", "e"), ("w", "h"), ("0", "0"), ("1", "9"),
]


def _normalized(text: Column) -> Column:
    """The corpus tokenizer's normal form: lowercase, non-alnum runs → one
    space (mirrors textstats.tokens_col so BPE and regex counts share a
    pre-tokenization)."""
    return F.regexp_replace(F.lower(text), "[^a-z0-9]+", " ")


def bpe_encode_col(text: Column, merges: List[Tuple[str, str]] = MERGES) -> Column:
    """Marker-wrapped BPE encoding of ``text`` as one Column expression."""
    s = F.regexp_replace(_normalized(text), "([a-z0-9])", f"{_S}$1{_E}")
    for a, b in merges:
        s = F.regexp_replace(s, f"{_S}{a}{_E}{_S}{b}{_E}", f"{_S}{a}{b}{_E}")
    return s


def bpe_token_count_col(encoded: Column) -> Column:
    """Token count = number of end markers in a MATERIALIZED encoded column
    (pass a plain ref: the encode chain is ~35 regexp passes and must not be
    re-evaluated per consumer)."""
    return (F.length(encoded) - F.length(F.regexp_replace(encoded, _E, ""))).cast(
        "int"
    )


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tablestructurerec_spark.sources.read import read_table

    docs = read_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.trim(_normalized(F.col("text"))), " +"), lambda x: x != "")
        ).cast("int").alias("n_words"),
        bpe_encode_col(F.col("text")).alias("enc"),
    )
    n_bpe = bpe_token_count_col(F.col("enc"))
    return staged.select(
        "doc_id",
        "n_words",
        n_bpe.alias("n_bpe_tokens"),
        F.when(F.col("n_words") > 0, F.round(n_bpe / F.col("n_words"), 6))
        .otherwise(0.0)
        .alias("bpe_per_word"),
        F.md5(F.col("enc")).alias("enc_md5"),
    ).orderBy("doc_id")


def _sql_chr(tok: str) -> str:
    """DuckDB e-string literal for a marker-delimited fragment."""
    return (
        "e'"
        + tok.replace(_S, r"\x02").replace(_E, r"\x03").replace("'", "''")
        + "'"
    )


def _bpe_encode_sql(expr: str, merges: List[Tuple[str, str]] = MERGES) -> str:
    s = (
        f"regexp_replace(regexp_replace(lower({expr}), '[^a-z0-9]+', ' ', 'g'),"
        f" '([a-z0-9])', {_sql_chr(_S)} || '\\1' || {_sql_chr(_E)}, 'g')"
    )
    for a, b in merges:
        pat = _sql_chr(f"{_S}{a}{_E}{_S}{b}{_E}")
        rep = _sql_chr(f"{_S}{a}{b}{_E}")
        s = f"regexp_replace({s}, {pat}, {rep}, 'g')"
    return s


_TOKEN_COUNT_BPE_SQL = f"""
WITH enc AS (
  SELECT doc_id,
         CAST(len({tokens_sql()}) AS INT) AS n_words,
         {_bpe_encode_sql('text')} AS e
  FROM documents
)
SELECT doc_id, n_words,
       CAST(length(e) - length(replace(e, {_sql_chr(_E)}, '')) AS INT) AS n_bpe_tokens,
       CASE WHEN n_words > 0
            THEN ROUND((length(e) - length(replace(e, {_sql_chr(_E)}, ''))) * 1.0 / n_words, 6)
            ELSE 0.0 END AS bpe_per_word,
       md5(e) AS enc_md5
FROM enc
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# python twins — the reference semantics the Column chain is pinned against
# ---------------------------------------------------------------------------
def bpe_encode_py(text: str, merges: List[Tuple[str, str]] = MERGES) -> List[str]:
    """Rank-ordered exhaustive application (the chain's semantics) on one
    normalized word list; returns the flat token sequence."""
    import re

    words = re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
    out: List[str] = []
    for w in words:
        toks = list(w)
        for a, b in merges:
            i, merged = 0, []
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            toks = merged
        out.extend(toks)
    return out


def bpe_encode_classic(text: str, merges: List[Tuple[str, str]] = MERGES) -> List[str]:
    """The textbook encoder: repeatedly merge the lowest-rank pair present.
    test_bpe.py asserts it equals :func:`bpe_encode_py` — the equivalence
    that justifies the regexp chain."""
    import re

    rank = {pair: i for i, pair in enumerate(merges)}
    words = re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
    out: List[str] = []
    for w in words:
        toks = list(w)
        while len(toks) > 1:
            pairs = {(toks[i], toks[i + 1]) for i in range(len(toks) - 1)}
            best = min((rank[p] for p in pairs if p in rank), default=None)
            if best is None:
                break
            a, b = merges[best]
            i, merged = 0, []
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            toks = merged
        out.extend(toks)
    return out


def bpe_tokens_pandas(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Arrow-batched pandas_udf twin — the seat a real tokenizer library
    (tiktoken/sentencepiece) occupies in production; same contract as the
    native chain (asserted equal by test_bpe.py)."""
    def n_bpe(texts):
        return texts.map(lambda t: len(bpe_encode_py(t or ""))).astype("int32")

    # F.pandas_udf(fn, type) form: immune to `from __future__ import
    # annotations` stringifying the type hints (same pattern as dedup._sig_udf)
    return df.withColumn(
        "n_bpe_tokens", F.pandas_udf(n_bpe, "int")(F.col(text_col))
    )


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_token_count_bpe": q_token_count_bpe,
}

ORACLE_SQL: Dict[str, str] = {
    "t_token_count_bpe": _TOKEN_COUNT_BPE_SQL,
}
