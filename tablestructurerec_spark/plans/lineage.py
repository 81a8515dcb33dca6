"""Checkpoint-resumable extraction with per-partition lineage + metrics.

north_rule requirement: "resumable from checkpoint with per-partition lineage
and metrics tables".  Design (SURVEY.md §4):

* the input keyspace is bucketed by ``pmod(xxhash64(conv_id), n_buckets)`` —
  a stable, data-independent partitioning that also *salts* skewed
  conversations across buckets at the granularity that matters (bucket
  count ≫ conversation count per bucket);
* ONE distributed job per run covers every not-yet-done bucket: the input
  is scanned ONCE, extraction output lands under
  ``out_dir/tables/bucket=<b>/`` via ``write.partitionBy("bucket")`` with
  dynamic partition overwrite (only this run's buckets are replaced, so
  re-runs are idempotent), and a lineage row
  (bucket, status, n_turns, n_tables, wall_s, run_id) is appended to
  ``out_dir/_lineage/`` per bucket;
* resume = anti-join: buckets whose latest lineage status is ``ok`` are
  skipped; everything else re-runs.  A crash mid-write commits nothing (the
  parquet committer stages to _temporary), leaves no ``ok`` rows, and the
  next run redoes exactly the unfinished buckets — exactly-once at bucket
  granularity;
* metrics cost ~nothing extra at 100 TB: ``n_turns`` comes from a
  ``groupBy(bucket).count()`` whose scan prunes to the ``conv_id`` column
  only (a tiny fraction of the bytes of a text-heavy corpus), and
  ``n_tables`` from the *written* files' parquet footers — the full-width
  input is read exactly once, by the extraction job itself.

Storage is either a directory (``out_dir`` = path: ``<dir>/tables`` +
``<dir>/_lineage`` parquet) or a catalog (``out_dir`` = ``catalog:<prefix>``:
tables ``<prefix>_tables`` + ``<prefix>_lineage`` resolved through the
session catalog).  The catalog mode is the Iceberg path on a real cluster —
``INSERT OVERWRITE`` with dynamic partition overwrite maps to an Iceberg
replace-partitions snapshot commit, and the lineage append to an
append-files commit; the same code runs against the plain session catalog
here (tested), only the catalog config differs.
"""

from __future__ import annotations

import time
from typing import Iterable, List

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import extract_tables

__all__ = ["bucket_col", "completed_buckets", "run_with_lineage"]

LINEAGE_SCHEMA = "bucket int, status string, n_turns long, n_tables long, wall_s double, run_id string"


def bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")


_CATALOG = "catalog:"


def _names(out_dir: str):
    """(is_catalog, tables_target, lineage_target) for either storage mode."""
    if out_dir.startswith(_CATALOG):
        prefix = out_dir[len(_CATALOG):]
        return True, f"{prefix}_tables", f"{prefix}_lineage"
    return False, f"{out_dir}/tables", f"{out_dir}/_lineage"


def completed_buckets(spark: SparkSession, out_dir: str) -> List[int]:
    is_cat, _tables, lin_t = _names(out_dir)
    if is_cat:
        if not spark.catalog.tableExists(lin_t):
            return []
        lin = spark.table(lin_t)
        ok = lin.where(F.col("status") == "ok").select("bucket").distinct()
        return sorted(r.bucket for r in ok.collect())
    return _completed_buckets_path(spark, out_dir)


def _completed_buckets_path(spark: SparkSession, out_dir: str) -> List[int]:
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

    Single-pass: one distributed write job covers every todo bucket (the
    input is never re-scanned per bucket).  ``wall_s`` is the run's wall
    time, recorded on each of the run's lineage rows.

    ``fail_after`` caps the run at N buckets (test hook simulating a crash
    between runs).
    """
    done = set(completed_buckets(spark, out_dir))
    todo = [b for b in range(n_buckets) if b not in done]
    if fail_after is not None:
        todo = todo[:fail_after]
    if not todo:
        return []
    t0 = time.perf_counter()
    src = transcripts.withColumn("bucket", bucket_col(n_buckets)).where(
        F.col("bucket").isin(todo)
    )
    # bucket is a pure function of conv_id, so the output re-derives it —
    # extract_tables keeps its narrow 3-column projection into mapInPandas
    tables = extract_tables(src).withColumn("bucket", bucket_col(n_buckets))
    is_cat, tables_t, lin_t = _names(out_dir)
    overwrite_key = "spark.sql.sources.partitionOverwriteMode"
    old_mode = spark.conf.get(overwrite_key, None)
    spark.conf.set(overwrite_key, "dynamic")
    try:
        if is_cat:
            # catalog mode: INSERT OVERWRITE under dynamic partition
            # overwrite replaces only this run's bucket partitions — on an
            # Iceberg catalog this is one replace-partitions snapshot commit
            if not spark.catalog.tableExists(tables_t):
                tables.write.partitionBy("bucket").saveAsTable(tables_t)
            else:
                cols = spark.table(tables_t).columns  # insertInto is positional
                tables.select(*cols).write.mode("overwrite").insertInto(tables_t)
        else:
            tables.write.mode("overwrite").partitionBy("bucket").parquet(tables_t)
    finally:
        if old_mode is None:
            spark.conf.unset(overwrite_key)
        else:
            spark.conf.set(overwrite_key, old_mode)
    wall = time.perf_counter() - t0
    # metrics: n_turns prunes the input scan to conv_id only; n_tables counts
    # the freshly written partitions (parquet footer counts, no data read)
    n_turns = {
        r["bucket"]: r["count"] for r in src.groupBy("bucket").count().collect()
    }
    try:
        written = read_output(spark, out_dir).where(F.col("bucket").isin(todo))
        n_tables = {
            r["bucket"]: r["count"]
            for r in written.groupBy("bucket").count().collect()
        }
    except AnalysisException:  # no bucket produced any table → nothing written
        n_tables = {}
    rows = [
        (b, "ok", n_turns.get(b, 0), n_tables.get(b, 0), wall, run_id) for b in todo
    ]
    lineage = spark.createDataFrame(rows, LINEAGE_SCHEMA)
    if is_cat:
        lineage.write.mode("append").saveAsTable(lin_t)
    else:
        lineage.write.mode("append").parquet(lin_t)
    return todo


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    is_cat, tables_t, _lin = _names(out_dir)
    return spark.table(tables_t) if is_cat else spark.read.parquet(tables_t)
