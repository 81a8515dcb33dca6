"""Checkpoint-resumable extraction with per-partition lineage + metrics.

north_rule requirement: "resumable from checkpoint with per-partition lineage
and metrics tables".  Design (SURVEY.md §4):

* the input keyspace is bucketed by ``pmod(xxhash64(conv_id), n_buckets)`` —
  a stable, data-independent partitioning that also *salts* skewed
  conversations across buckets at the granularity that matters (bucket
  count ≫ conversation count per bucket);
* each bucket is one atomic unit of work: its table output lands under
  ``out_dir/tables/bucket=<b>/`` (a parquet partition directory, written
  with dynamic partition overwrite so re-runs are idempotent), and a lineage
  row (bucket, n_turns, n_tables, wall_s, status, run_id) is appended to
  ``out_dir/_lineage/``;
* resume = anti-join: buckets whose latest lineage status is ``ok`` are
  skipped; everything else re-runs.  Crash-mid-bucket leaves no ``ok`` row,
  so the overwrite re-run is exactly-once at bucket granularity.

At 100 TB the bucket loop is a driver-side loop over a few thousand
*distributed jobs*, each scanning only its bucket's partition pruning range —
the standard Iceberg-style backfill shape.  On Iceberg the same logic rides
on partition transforms + snapshot commits; parquet directories stand in
here with identical semantics.
"""

from __future__ import annotations

import time
from typing import Iterable, List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import extract_tables

__all__ = ["bucket_col", "completed_buckets", "run_with_lineage"]

LINEAGE_SCHEMA = "bucket int, status string, n_turns long, n_tables long, wall_s double, run_id string"


def bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, out_dir: str) -> List[int]:
    # existence pre-check via the Hadoop FS API where available (avoids the
    # JVM logging an alarming PATH_NOT_FOUND trace on every fresh run); the
    # read itself stays guarded so an unreadable _lineage dir (e.g. only a
    # _temporary left by a crash mid-append) or a Connect session without
    # the py4j bridge degrades to "no completed buckets" and re-runs them
    try:
        path = spark._jvm.org.apache.hadoop.fs.Path(f"{out_dir}/_lineage")
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(path):
            return []
    except Exception:
        pass
    try:
        lin = spark.read.parquet(f"{out_dir}/_lineage")
    except Exception:
        return []
    ok = lin.where(F.col("status") == "ok").select("bucket").distinct()
    return sorted(r.bucket for r in ok.collect())


def run_with_lineage(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    n_buckets: int = 16,
    run_id: str = "run0",
    fail_after: int | None = None,
) -> List[int]:
    """Extract all buckets not yet marked ok; returns the buckets processed.

    ``fail_after`` aborts after N buckets (test hook simulating a crash).
    """
    done = set(completed_buckets(spark, out_dir))
    todo = [b for b in range(n_buckets) if b not in done]
    src = transcripts.withColumn("bucket", bucket_col(n_buckets))
    processed: List[int] = []
    for i, b in enumerate(todo):
        if fail_after is not None and i >= fail_after:
            break
        t0 = time.perf_counter()
        part = src.where(F.col("bucket") == b).drop("bucket")
        n_turns = part.count()
        tables = extract_tables(part)
        (
            tables.withColumn("bucket", F.lit(b))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/tables/bucket={b}")
        )
        n_tables = spark.read.parquet(f"{out_dir}/tables/bucket={b}").count()
        row = [(b, "ok", n_turns, n_tables, time.perf_counter() - t0, run_id)]
        spark.createDataFrame(row, LINEAGE_SCHEMA).write.mode("append").parquet(
            f"{out_dir}/_lineage"
        )
        processed.append(b)
    return processed


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/tables/bucket=*")
