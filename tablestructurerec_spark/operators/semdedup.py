"""SemDeDup — semantic deduplication via k-means clustering + intra-cluster
cosine pruning (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540).

The web-scale trick: never compute the corpus-wide pairwise cosine matrix.
Cluster the embedding space with a coarse k-means quantizer, then compare
pairs ONLY inside each cluster — semantic near-duplicates land in the same
cluster by construction, and the pair count drops from O(N²) to
O(Σ |cluster|²) with |cluster| ≈ N/k held bounded by scaling k with the
corpus.  Within a cluster, items are ranked by distance to the centroid
(FARTHEST first — the paper keeps the least-redundant "edge" examples as
group representatives) and an item is a duplicate iff its cosine similarity
to ANY earlier-ranked cluster member reaches ``tau`` — the same greedy
upper-triangular rule as the paper's released implementation (the earlier
member's own dup status does not matter).

Spark shape, audited for 100 TB:

* quantizer fit: driver-side deterministic Lloyd (``core/kmeans.lloyd``) on
  a BOUNDED id-range sample — identical bounding rule and determinism
  contract as ``similarity.q_ann_ivf_kmeans_topk``, which is what makes a
  full value-hash DuckDB oracle possible (the oracle refits bit-identical
  centers in its own process and replays everything in SQL);
* assignment: broadcast the O(k·dim) centers, map-side argmin over one
  corpus scan — no shuffle;
* the ONLY shuffle is the intra-cluster self-join on ``cluster_id`` (equi
  key → SortMergeJoin, AQE-skew-splittable; the ``rk_a < rk_b`` rank
  predicate rides as a post-join filter).  Per-cluster work is quadratic in
  cluster size, which is the knob the paper turns (k ∝ N);
* never all-pairs, never a corpus-side broadcast, no Python in the plan.

Reference surface: this is a training-data operator beyond the reference
repo (which has no embedding pipeline); the clustering/oracle determinism
contract follows ``operators/similarity.py``.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tablestructurerec_spark.operators.similarity import (
    _cos_sql,
    _dot,
    _kmeans_sample_np,
    _norm,
    _sqdist,
    _SQDIST_SQL,
)

__all__ = ["QUERIES", "q_semdedup", "semdedup_oracle"]

_SEM_K = 16  # clusters fit on the bounded sample; scale with corpus size
_SEM_TAU = 0.4  # dup threshold; testdata embeddings are isotropic (max
# pairwise cos ≈ 0.48 at sf0.001), so the default sits where a meaningful
# dup set exists — production text embeddings use 0.95+ (paper table 1)
_SEM_ITERS = 8
_SAMPLE_MAX_ID = 131_072  # same bounded-sample rule as similarity.py


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from tablestructurerec_spark.sources.read import read_table

    return read_table(spark, sf_dir, name)


def _fit_centers(spark: SparkSession, emb: DataFrame, k: int) -> DataFrame:
    """Bounded-sample Lloyd fit → broadcast-sized (cid, cv) frame."""
    from tablestructurerec_spark.core.kmeans import lloyd

    sample = (
        emb.where(F.col("vec_id") < _SAMPLE_MAX_ID)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    centers = lloyd(_kmeans_sample_np([r.embedding for r in sample]), k, _SEM_ITERS)
    return spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(centers)],
        "cid int, cv array<double>",
    )


def q_semdedup(
    spark: SparkSession,
    sf_dir: str,
    n_clusters: int = _SEM_K,
    tau: float = _SEM_TAU,
) -> DataFrame:
    """Per-vector SemDeDup verdict: ``(vec_id, cluster_id, rk,
    max_prior_cos, is_dup)``.

    ``rk`` is the greedy order inside the cluster (1 = farthest from the
    centroid, kept unconditionally); ``max_prior_cos`` is the best cosine
    to any earlier-ranked member (−1 when none); ``is_dup`` = 1 iff that
    best cosine reaches ``tau``.
    """
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = _fit_centers(spark, emb, n_clusters)

    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .groupBy("vec_id")
        .agg(
            F.min(
                F.struct(
                    F.round(_sqdist(F.col("embedding"), F.col("cv")), 6).alias("d"),
                    F.col("cid").alias("cid"),
                )
            ).alias("best")
        )
        .select(
            "vec_id",
            F.col("best.cid").alias("cluster_id"),
            F.col("best.d").alias("cdist"),
        )
    )
    # per-member norm hoisted OUT of the pair frame: computed N times here
    # instead of 2·|pairs| times inside the join (the triplet-mine lesson;
    # numerically identical — no intermediate rounding)
    member = (
        emb.join(assigned, "vec_id")
        .withColumn("nrm", _norm(F.col("embedding")))
        .withColumn(
            "rk",
            F.row_number()
            .over(
                Window.partitionBy("cluster_id").orderBy(
                    F.desc("cdist"), F.asc("vec_id")
                )
            )
            .cast("int"),
        )
    )
    a = member.select(
        F.col("cluster_id").alias("c"),
        F.col("rk").alias("rk_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = member.select(
        "cluster_id",
        F.col("vec_id").alias("bid"),
        F.col("rk").alias("rk_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    prior = (
        b.join(a, (a["c"] == b["cluster_id"]) & (a["rk_a"] < b["rk_b"]))
        .groupBy("bid")
        .agg(
            F.max(
                F.round(
                    _dot(F.col("emb_a"), F.col("emb_b"))
                    / (F.col("nrm_a") * F.col("nrm_b")),
                    6,
                )
            ).alias("max_prior_cos")
        )
    )
    return (
        member.join(prior, member["vec_id"] == prior["bid"], "left")
        .select(
            "vec_id",
            "cluster_id",
            "rk",
            F.coalesce(F.col("max_prior_cos"), F.lit(-1.0)).alias("max_prior_cos"),
            (F.coalesce(F.col("max_prior_cos"), F.lit(-1.0)) >= F.lit(tau))
            .cast("int")
            .alias("is_dup"),
        )
        .orderBy("vec_id")
    )


def semdedup_oracle(
    sf_dir: str, n_clusters: int = _SEM_K, tau: float = _SEM_TAU
) -> str:
    """Full value-hash DuckDB oracle: refit the quantizer with the same
    :func:`core.kmeans.lloyd` kernel on the same bounded sample read
    straight off the parquet, embed the centers as exact float64 literals,
    and replay assignment → rank → upper-triangular pair max → verdict in
    ANSI SQL.  Built per sf_dir (centers are data-dependent), lazily.
    """
    import duckdb

    from tablestructurerec_spark.core.kmeans import lloyd

    rows = duckdb.connect().execute(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        f"WHERE vec_id < {_SAMPLE_MAX_ID} ORDER BY vec_id"
    ).fetchall()
    centers = lloyd(
        _kmeans_sample_np([r[0] for r in rows]), n_clusters, _SEM_ITERS
    )
    vals = ",\n    ".join(
        f"({i}, [{', '.join(f'{v:.17g}' for v in c)}]::DOUBLE[])"
        for i, c in enumerate(centers)
    )
    return f"""
WITH cents AS (
  SELECT * FROM (VALUES
    {vals}
  ) AS t(cid, cv)
), scoredc AS (
  SELECT e.vec_id, e.embedding, c.cid,
         {_SQDIST_SQL.format(a='e.embedding', b='c.cv')} AS d,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_SQDIST_SQL.format(a='e.embedding', b='c.cv')} ASC, c.cid ASC
         ) AS rnk
  FROM embeddings e CROSS JOIN cents c
), member AS (
  SELECT vec_id, embedding, cid AS cluster_id, d AS cdist,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY cid ORDER BY d DESC, vec_id ASC
         ) AS INT) AS rk
  FROM scoredc WHERE rnk = 1
), prior AS (
  SELECT b.vec_id AS bid,
         MAX(ROUND({_cos_sql('a.embedding', 'b.embedding')}, 6)) AS max_prior_cos
  FROM member a JOIN member b
    ON a.cluster_id = b.cluster_id AND a.rk < b.rk
  GROUP BY b.vec_id
)
SELECT m.vec_id, m.cluster_id, m.rk,
       COALESCE(p.max_prior_cos, -1.0) AS max_prior_cos,
       CAST(CASE WHEN COALESCE(p.max_prior_cos, -1.0) >= {tau!r} THEN 1 ELSE 0 END AS INT) AS is_dup
FROM member m LEFT JOIN prior p ON m.vec_id = p.bid
ORDER BY m.vec_id
"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_semdedup": q_semdedup,
}
