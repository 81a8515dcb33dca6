"""Fused pipeline-operations audit row — FIVE ops/risk operators, one
driver-certified result (round-5 registry rotation #2; tall-format
``t_sketch_audit`` pattern).

A 100 TB ingest runs a standing operational audit beside the data path:
day-over-day category drift (did a source change its mix?), snapshot
diffing (what did the last crawl add/change/remove?), key-skew
measurement (will the next join melt a task?), input-file balance (is
one part-file 100× the others?), and the k-anonymity privacy gate.
Each exists as a standalone operator with its own value-exact DuckDB
oracle and pytest (``drift`` / ``snapshot`` / ``skewaudit`` /
``filestats`` / ``kanon``) — none has ever held a row in the driver's
capped 50-row registry.  Their outputs are heterogeneous (per-day-pair,
per-status, single-row, per-file, per-equivalence-class), so the fusion
is the TALL reshape ``(metric, key, value)`` — every column of every
operator becomes its own metric row, so the single value-hash still
pins each operator's full output.

Nothing is re-implemented: the Spark side calls the five modules' own
query functions; the oracle composes their module-level SQL verbatim as
CTEs, with only the reshape written here (both engines reshape with the
same expressions).  All values are integers by each operator's own
contract (ppm scaling, counts, flags), so the tall ``value`` column is
BIGINT and reduction-order-free.

Scale shape: inherited from the home modules (each is a bounded-output
audit: O(days), O(4), O(1), O(files), O(quasi-id cross product) rows);
the reshape is a union of tiny frames — no new shuffle of corpus-sized
data.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tablestructurerec_spark.operators.drift import drift_sql, q_distribution_drift
from tablestructurerec_spark.operators.filestats import file_balance_sql, q_file_balance
from tablestructurerec_spark.operators.kanon import _KANON_SQL, q_k_anonymity
from tablestructurerec_spark.operators.skewaudit import q_skew_audit, skew_audit_sql
from tablestructurerec_spark.operators.snapshot import q_snapshot_diff, snapshot_sql

__all__ = ["QUERIES", "q_ops_audit", "ops_audit_sql"]


def _tall(df: DataFrame, key: F.Column, metrics: List[Tuple[str, str]]) -> DataFrame:
    """Reshape ``(…, m1, m2, …)`` → rows of ``(metric, key, value)``.

    One explode per component, NOT one union branch per metric: a
    per-metric select re-executes the component's subtree once per metric
    and stacks 32 shuffle partitions per branch under the final sort
    (measured: 358-task sort stages, fused 3× the sum of its parts).
    The explode keeps each component at ONE scan and one partition set —
    row-identical to the union form (same structs, same order class)."""
    row = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("metric"),
                    key.cast("string").alias("key"),
                    F.col(col).cast("long").alias("value"),
                )
                for name, col in metrics
            ]
        )
    ).alias("x")
    return df.select(row).select("x.metric", "x.key", "x.value")


def q_ops_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tall ``(metric, key, value)`` rows over the five operational audits
    (``drift_*`` keyed by day pair, ``snapshot_docs`` by status, ``skew_*``
    by audited key column, ``file_*`` by input file, ``kanon_*`` by
    quasi-identifier class)."""
    dr = q_distribution_drift(spark, sf_dir)
    dr_key = F.concat(
        F.date_format("day_from", "yyyy-MM-dd"),
        F.lit(">"),
        F.date_format("day_to", "yyyy-MM-dd"),
    )
    sn = q_snapshot_diff(spark, sf_dir)
    sk = q_skew_audit(spark, sf_dir)
    fb = q_file_balance(spark, sf_dir)
    ka = q_k_anonymity(spark, sf_dir)
    ka_key = F.concat_ws(
        "|",
        F.col("c_nationkey").cast("string"),
        F.col("c_mktsegment"),
        F.col("bal_bucket").cast("string"),
    )
    parts = [
        _tall(
            dr,
            dr_key,
            [
                ("drift_ppm", "drift_ppm"),
                ("drift_n_types", "n_types"),
                ("drift_n_from", "n_from"),
                ("drift_n_to", "n_to"),
            ],
        ),
        _tall(sn, F.col("status"), [("snapshot_docs", "n_docs")]),
        _tall(
            sk,
            F.col("key_col"),
            [
                ("skew_n_rows", "n_rows"),
                ("skew_n_keys", "n_keys"),
                ("skew_max_key_rows", "max_key_rows"),
                ("skew_p50_key_rows", "p50_key_rows"),
                ("skew_p99_key_rows", "p99_key_rows"),
                ("skew_top1_share_ppm", "top1_share_ppm"),
                ("skew_salt_factor", "salt_factor"),
            ],
        ),
        _tall(
            fb,
            F.col("file"),
            [
                ("file_n_rows", "n_rows"),
                ("file_share_ppm", "share_ppm"),
                ("file_split_factor", "split_factor"),
            ],
        ),
        _tall(
            ka.withColumn("at_risk_i", F.col("at_risk").cast("long")),
            ka_key,
            [("kanon_class_size", "class_size"), ("kanon_at_risk", "at_risk_i")],
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("metric", "key")


def ops_audit_sql(sf_dir: str) -> str:
    """DuckDB twin — the five home-module oracle strings composed verbatim
    as CTEs, reshaped tall with the same key expressions.  ``sf_dir`` is
    needed because the file-balance oracle reads the parquet with
    ``filename=true`` (the ``ivf_kmeans_oracle(sf_dir)`` precedent)."""

    def rows(cte: str, key: str, metrics: List[Tuple[str, str]]) -> str:
        return "\nUNION ALL\n".join(
            f"SELECT '{name}' AS metric, {key} AS key,"
            f" CAST({col} AS BIGINT) AS value FROM {cte}"
            for name, col in metrics
        )

    dr_key = "strftime(day_from, '%Y-%m-%d') || '>' || strftime(day_to, '%Y-%m-%d')"
    ka_key = (
        "CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment"
        " || '|' || CAST(bal_bucket AS VARCHAR)"
    )
    body = "\nUNION ALL\n".join(
        [
            rows(
                "dr",
                dr_key,
                [
                    ("drift_ppm", "drift_ppm"),
                    ("drift_n_types", "n_types"),
                    ("drift_n_from", "n_from"),
                    ("drift_n_to", "n_to"),
                ],
            ),
            rows("sn", "status", [("snapshot_docs", "n_docs")]),
            rows(
                "sk",
                "key_col",
                [
                    ("skew_n_rows", "n_rows"),
                    ("skew_n_keys", "n_keys"),
                    ("skew_max_key_rows", "max_key_rows"),
                    ("skew_p50_key_rows", "p50_key_rows"),
                    ("skew_p99_key_rows", "p99_key_rows"),
                    ("skew_top1_share_ppm", "top1_share_ppm"),
                    ("skew_salt_factor", "salt_factor"),
                ],
            ),
            rows(
                "fb",
                "file",
                [
                    ("file_n_rows", "n_rows"),
                    ("file_share_ppm", "share_ppm"),
                    ("file_split_factor", "split_factor"),
                ],
            ),
            rows(
                "ka",
                ka_key,
                [
                    ("kanon_class_size", "class_size"),
                    ("kanon_at_risk", "at_risk"),
                ],
            ),
        ]
    )
    return f"""
WITH dr AS ({drift_sql()}),
sn AS ({snapshot_sql()}),
sk AS ({skew_audit_sql()}),
fb AS ({file_balance_sql(f"{sf_dir}/documents.parquet")}),
ka AS ({_KANON_SQL})
{body}
ORDER BY metric, key
"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_ops_audit": q_ops_audit,
}
