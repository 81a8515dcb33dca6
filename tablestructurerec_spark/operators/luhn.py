"""Luhn-validated credit-card detection — the checksum the regex-only PII
scrub (``hygiene.q_pii_scrub``) cannot express.

A 13-16 digit run is usually NOT a card (ids, timestamps, hashes); shipping
a scrubber that redacts every digit run destroys data, shipping one that
redacts none leaks PAN data.  The industry rule is regex candidates +
Luhn mod-10 checksum.  Both stages here are pure Catalyst expressions —
no UDF:

* candidates: five ordered alternatives — 4-4-4-x and Amex 4-6-5
  groupings, each with a SINGLE consistent separator (all-space or
  all-hyphen), plus an UNBOUNDED contiguous run ``[0-9]{13,}``.  The
  contiguous alternative stays unbounded, so a 20-digit account id is
  extracted whole and rejected by the 13-16 length guard rather than
  truncated to a 16-digit prefix that passes Luhn by chance (~10% of long
  ids would false-positive under a bounded pattern; found in review).
  Separators are only accepted at group boundaries with a consistent
  separator: an earlier fully unbounded ``[0-9](?:[ -]?[0-9]){12,}``
  merged a valid card with ANY adjacent space/hyphen-separated digit
  group ("4111111111111111 99", "...1111 exp 2023", "1234 4111-...")
  into one 18+-digit run the length guard then rejected — a false
  NEGATIVE that let real PANs past the audit (ADVICE r3).  Residual
  documented merges (all still extract-whole-and-reject, the original
  anti-truncation intent): digits glued with NO separator
  ("12344111111111111111"), digits glued to the LAST group of a grouped
  card ("4111 1111 1111 111199"), and a 4-digit junk group joined to a
  grouped card by the SAME separator ("2023 4111 1111 1111 1111" — the
  leftmost-first match consumes "2023 4111 1111 1111"); disambiguating
  that last case needs lookbehind, which RE2 (DuckDB) lacks.  Plain
  ordered alternation without backreferences is leftmost-first in BOTH
  Java regex (Spark) and RE2, and the adversarial parity test pins the
  agreement;
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

CAND_RE = (
    "[0-9]{4} [0-9]{4} [0-9]{4} [0-9]{1,7}"
    "|[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{1,7}"
    "|[0-9]{4} [0-9]{6} [0-9]{5}"
    "|[0-9]{4}-[0-9]{6}-[0-9]{5}"
    "|[0-9]{13,}"
)

# Luhn over a candidate string column expression: strip separators, digits
# right-to-left, double every second, subtract 9 above 9, sum % 10 == 0.
_SPARK_VALID = """
transform(
  regexp_extract_all(text, '__CAND_RE__', 0),
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
""".replace("__CAND_RE__", CAND_RE)


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
         regexp_extract_all(text, '__CAND_RE__', 0) AS ms
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
""".replace("__CAND_RE__", CAND_RE)


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_cc_audit": q_cc_audit,
}
