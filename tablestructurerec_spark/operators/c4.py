"""C4-style line-level corpus cleaning (Raffel et al. 2020, §2.2) — the
other classic shape of web-corpus hygiene: where ``q_strip_repeated``
removes corpus-repeated spans and ``q_corpus_filter`` drops whole
documents, C4 cleans *within* each document line by line and only then
decides the page's fate.

Rules (the C4 paper's list, minus the dirty-word lexicon, which the paper
ships as an external blocklist we don't embed):

* keep a line only if it ends in terminal punctuation (``. ! ? " ”``),
  has >= 5 whitespace-separated words, and does not mention
  ``javascript``;
* drop the whole page if it contains ``lorem ipsum`` or a ``{`` (code),
  or if fewer than 3 lines survive (the paper counts sentences; kept
  lines is the standard line-structured approximation, documented here).

Spark shape, audited for 100 TB:

* the whole transform is **map-only — zero shuffles**: line split, line
  predicate, and reassembly all run as higher-order functions
  (``filter`` over ``split``) inside one projection, so a 100 TB corpus
  streams through scan→project→sink without a single exchange (compare
  the explode→groupBy formulation, which shuffles every surviving line
  on doc_id just to put documents back together);
* the surviving-lines array is STAGED as its own projection —
  ``n_kept``, the page predicate, and the reassembled text all reference
  it, and CollapseProject's duplicate-expensive-expression guard keeps
  the filter+regexp evaluated once instead of three times (the measured
  1000→1 regexp-instance effect documented in SCALING.md §4d);
* every predicate is engine-portable by construction: ``right(x,1)``
  membership instead of a ``$``-anchored regex (Java ``$`` also matches
  before a trailing newline, RE2's does not), ``contains`` instead of
  ``\\b`` word-boundary regex, and the word count is
  ``length(regexp_extract_all(x, '\\S+'))`` in both engines — the DuckDB
  oracle is value-exact, not merely statistically close.

The trailing ``orderBy(doc_id)`` is presentation for the parity harness
only; the transform itself introduces no exchange.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["QUERIES", "q_c4_line_filter", "_C4_SQL"]

_TERMINALS = (".", "!", "?", '"', "”")
_MIN_WORDS = 5
_MIN_KEPT_LINES = 3


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from tablestructurerec_spark.sources.read import read_table

    return read_table(spark, sf_dir, name)


def _line_keep(x: Column) -> Column:
    words = F.size(F.regexp_extract_all(x, F.lit(r"\S+"), F.lit(0)))
    return (
        F.right(x, F.lit(1)).isin(*_TERMINALS)
        & (words >= _MIN_WORDS)
        & ~F.contains(F.lower(x), F.lit("javascript"))
    )


def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document C4 cleaning report ``(doc_id, n_lines, n_kept, kept,
    clean_text)`` — ``clean_text`` is the newline-join of surviving lines
    for kept pages and ``''`` for dropped ones (dropped pages still report
    their line counts, so the filter's yield is auditable per source)."""
    docs = _t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        "text",
        F.filter(F.split(F.col("text"), "\n"), _line_keep).alias("kept_lines"),
    )
    page_ok = (
        ~F.contains(F.lower("text"), F.lit("lorem ipsum"))
        & ~F.contains(F.col("text"), F.lit("{"))
        & (F.size("kept_lines") >= _MIN_KEPT_LINES)
    )
    return (
        staged.select(
            "doc_id",
            F.size(F.split(F.col("text"), "\n")).alias("n_lines"),
            F.size("kept_lines").alias("n_kept"),
            page_ok.alias("kept"),
            F.when(page_ok, F.array_join("kept_lines", "\n"))
            .otherwise(F.lit(""))
            .alias("clean_text"),
        )
        .orderBy("doc_id")
    )


_TERMINALS_SQL = ", ".join("'" + t.replace("'", "''") + "'" for t in _TERMINALS)

_C4_SQL = f"""
WITH staged AS (
  SELECT doc_id, text,
         list_filter(string_split(text, chr(10)),
           x -> right(x, 1) IN ({_TERMINALS_SQL})
                AND length(regexp_extract_all(x, '\\S+')) >= {_MIN_WORDS}
                AND NOT contains(lower(x), 'javascript')) AS kept_lines
  FROM documents
), flagged AS (
  SELECT doc_id, text, kept_lines,
         (NOT contains(lower(text), 'lorem ipsum'))
           AND (NOT contains(text, '{{'))
           AND length(kept_lines) >= {_MIN_KEPT_LINES} AS kept
  FROM staged
)
SELECT doc_id,
       CAST(length(string_split(text, chr(10))) AS INT) AS n_lines,
       CAST(length(kept_lines) AS INT) AS n_kept,
       kept,
       CASE WHEN kept THEN array_to_string(kept_lines, chr(10)) ELSE '' END
         AS clean_text
FROM flagged
ORDER BY doc_id
"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_c4_line_filter": q_c4_line_filter,
}
