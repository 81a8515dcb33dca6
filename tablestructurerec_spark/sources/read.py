"""Input-split equalization for parquet reads.

A parquet scan parallelizes at row-group granularity: a table written as a
single row group yields a single input split, and every expression in the
scan stage — tokenizers, MinHash signatures, regex scrubs, the extraction
``mapInPandas`` — runs on ONE core no matter how many the cluster has,
because nothing redistributes until the first exchange (if the plan has one
at all).

``read_spread`` reads a parquet table and, ONLY when the scan delivers
fewer splits than the session's parallelism, round-robin repartitions it up
to the core count.  At real scale this is a no-op: a 100 TB table has
millions of row groups and the guard never fires, so no full-corpus
exchange is ever added.  It fires exactly in the case where it is cheap —
the table is so small it fit in fewer splits than cores, so the exchange
moves at most a few partition-buffers of rows.

This is the leaf-stage analogue of what AQE already does for post-shuffle
stages (coalesce/split to fit parallelism); Spark has no knob that does it
for a scan feeding CPU-heavy projections.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_spread", "read_table"]

# The split-count probe (df.rdd.getNumPartitions()) runs no job but does
# plan the scan — a few hundred ms of JVM round-trips.  Probe once per
# (path, parallelism, file fingerprint); the mtime/size component means a
# rewritten file re-probes instead of silently keeping a stale count.
_PROBE_CACHE: dict = {}


def _fingerprint(path: str):
    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None  # non-local / unstat-able: never cache


def read_spread(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    target = spark.sparkContext.defaultParallelism
    fp = _fingerprint(path)
    key = (path, target, fp)
    n = _PROBE_CACHE.get(key) if fp is not None else None
    if n is None:
        n = df.rdd.getNumPartitions()
        if fp is not None:
            _PROBE_CACHE[key] = n
    if n < target:
        df = df.repartition(target)
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read ``{sf_dir}/{name}.parquet`` with input-split equalization — the
    shared read idiom of the per-row-heavy operator modules."""
    return read_spread(spark, f"{sf_dir}/{name}.parquet")
