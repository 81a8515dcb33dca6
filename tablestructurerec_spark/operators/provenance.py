"""Cross-source duplication matrix — which sources copy from which.

Corpus forensics: near-duplicate pairs are not uniformly distributed across
source pairs — mirrors, scraped re-posts, and syndication show up as hot
(source_a, source_b) cells, and the matrix decides which source to treat as
canonical before dedup keep-policies run.  This composes the MinHash-LSH
candidate machinery (``dedup._banded_docs`` / ``_banded_cte`` — shared with
``q_dedup_minhash_lsh`` and the near-dup leakage audit, so all three can
never drift) with source attribution:

* banding as in dedup (map-side signatures, self-join on (band, bucket)
  tiny groups);
* the source label rides on each banded row (joined from the thin
  ``(doc_id, source)`` projection BEFORE the self-join — text never moves);
* the pair count aggregates distinct candidate pairs per unordered source
  pair (``least/greatest`` normalization).

Returns ``(src_a, src_b, n_pairs)`` with ``src_a <= src_b``, ordered.
Standalone operator with a pytest DuckDB-parity oracle (the driver registry
sits at its 50-row cap).
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["QUERIES", "q_dup_source_matrix", "dup_source_matrix_sql"]


def q_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tablestructurerec_spark.operators.dedup import (
        _BAND_ROWS,
        _N_HASHES,
        _banded_docs,
        _hv_docs,
        _t,
    )

    srcs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    banded = (
        _banded_docs(_hv_docs(spark, sf_dir), _N_HASHES, _BAND_ROWS)
        .join(srcs, "doc_id")
        .repartition("band", "bucket")
    )
    pairs = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.least("x.source", "y.source").alias("src_a"),
            F.greatest("x.source", "y.source").alias("src_b"),
        )
        .distinct()
    )
    return (
        pairs.groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("src_a", "src_b")
    )


def dup_source_matrix_sql() -> str:
    """DuckDB twin of :func:`q_dup_source_matrix` — value-exact (reuses the
    minhash banding CTE)."""
    from tablestructurerec_spark.operators.dedup import _banded_cte

    return f"""
{_banded_cte()},
tagged AS (
  SELECT b.doc_id, b.band, b.bucket, d.source
  FROM banded b JOIN documents d USING (doc_id)
), pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         least(x.source, y.source) AS src_a,
         greatest(x.source, y.source) AS src_b
  FROM tagged x JOIN tagged y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
)
SELECT src_a, src_b, count(*) AS n_pairs
FROM pairs GROUP BY src_a, src_b
ORDER BY src_a, src_b
"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_dup_source_matrix": q_dup_source_matrix,
}
