"""Luhn-validated credit-card detection — the checksum the regex-only PII
scrub (``hygiene.q_pii_scrub``) cannot express.

A 13-16 digit run is usually NOT a card (ids, timestamps, hashes); shipping
a scrubber that redacts every digit run destroys data, shipping one that
redacts none leaks PAN data.  The industry rule is regex candidates +
Luhn mod-10 checksum.  Both stages here are pure Catalyst expressions —
no UDF:

* candidates: one alternation-free regex ``[0-9](?:[ -]?[0-9]){12,}`` —
  UNBOUNDED, so a 20-digit account id is extracted whole and rejected by
  the 13-16 length guard rather than truncated to a 16-digit prefix that
  passes Luhn by chance (~10% of long ids would false-positive under a
  bounded pattern; found in review).  No alternation and no backreference,
  so Java regex (Spark) and RE2 (DuckDB) match identically (the hygiene
  PII discipline);
* checksum: strip separators, reject lengths outside 13..16, then the Luhn
  fold as a two-arg ``transform`` over the REVERSED digit array — the
  (elem, idx) binding of two-arg lambdas (the SCALING.md §2 footgun) is
  exactly what Luhn's every-second-digit doubling needs — summed and
  tested mod 10.  DuckDB mirrors with list_zip(range) + list_sum.

MAP-ONLY: one scan, nothing leaves the row; the audit aggregate is one
partial-agg count per source.  Returns per-doc rows for docs with at least
one candidate: ``(doc_id, n_candidates, n_valid, has_valid_cc)``.
Standalone operator with a pytest DuckDB-parity oracle (the driver
registry sits at its 50-row cap).
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["QUERIES", "q_cc_audit", "cc_audit", "cc_sql", "CAND_RE"]

CAND_RE = "[0-9](?:[ -]?[0-9]){12,}"

# Luhn over a candidate string column expression: strip separators, digits
# right-to-left, double every second, subtract 9 above 9, sum % 10 == 0.
_SPARK_VALID = """
transform(
  regexp_extract_all(text, '[0-9](?:[ -]?[0-9]){12,}', 0),
  m -> CASE
    WHEN length(regexp_replace(m, '[ -]', '')) BETWEEN 13 AND 16 THEN
      IF(aggregate(
           transform(
             reverse(split(regexp_replace(m, '[ -]', ''), '')),
             (d, i) -> IF(i % 2 = 1,
                          IF(CAST(d AS INT) * 2 > 9, CAST(d AS INT) * 2 - 9, CAST(d AS INT) * 2),
                          CAST(d AS INT))),
           0, (acc, x) -> acc + x) % 10 = 0, 1, 0)
    ELSE 0 END)
"""


def q_cc_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tablestructurerec_spark.sources.read import read_table

    return cc_audit(read_table(spark, sf_dir, "documents"))


def cc_audit(docs: DataFrame) -> DataFrame:
    staged = docs.select(
        "doc_id", F.expr(_SPARK_VALID).alias("valid_flags")
    )
    return (
        staged.select(
            "doc_id",
            F.size("valid_flags").cast("long").alias("n_candidates"),
            F.expr(
                "CAST(aggregate(valid_flags, 0, (a, x) -> a + x) AS BIGINT)"
            ).alias("n_valid"),
        )
        .where(F.col("n_candidates") > 0)
        .withColumn("has_valid_cc", F.col("n_valid") > 0)
        .orderBy("doc_id")
    )


def cc_sql() -> str:
    """DuckDB twin of :func:`q_cc_audit` — value-exact."""
    return r"""
WITH cands AS (
  SELECT doc_id,
         regexp_extract_all(text, '[0-9](?:[ -]?[0-9]){12,}', 0) AS ms
  FROM documents
), flags AS (
  SELECT doc_id,
         list_transform(ms, m -> CASE
           WHEN length(regexp_replace(m, '[ -]', '', 'g')) BETWEEN 13 AND 16 THEN
             CASE WHEN list_sum(
               list_transform(
                 list_zip(list_reverse(string_split_regex(regexp_replace(m, '[ -]', '', 'g'), '')),
                          range(1, length(regexp_replace(m, '[ -]', '', 'g')) + 1)),
                 p -> CASE WHEN (p[2] - 1) % 2 = 1
                           THEN CASE WHEN p[1]::INT * 2 > 9 THEN p[1]::INT * 2 - 9 ELSE p[1]::INT * 2 END
                           ELSE p[1]::INT END)) % 10 = 0
             THEN 1 ELSE 0 END
           ELSE 0 END) AS valid_flags
  FROM cands
)
SELECT doc_id,
       CAST(len(valid_flags) AS BIGINT) AS n_candidates,
       CAST(coalesce(list_sum(valid_flags), 0) AS BIGINT) AS n_valid,
       coalesce(list_sum(valid_flags), 0) > 0 AS has_valid_cc
FROM flags
WHERE len(valid_flags) > 0
ORDER BY doc_id
"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_cc_audit": q_cc_audit,
}
