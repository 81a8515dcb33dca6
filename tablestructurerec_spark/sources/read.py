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

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_spread"]

# The split-count probe (df.rdd.getNumPartitions()) runs no job but does
# plan the scan — a few hundred ms of JVM round-trips.  Split layout is
# fixed for a given (session, path), so probe once per process.
_PROBE_CACHE: dict = {}


def read_spread(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    target = spark.sparkContext.defaultParallelism
    key = (id(spark), path, target)
    n = _PROBE_CACHE.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        _PROBE_CACHE[key] = n
    if n < target:
        df = df.repartition(target)
    return df
