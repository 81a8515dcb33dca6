"""Per-label embedding centroids + pairwise centroid cosine — the
embedding-space hygiene check (are the labels separable? did an ingest mix
two populations?) run before any ANN/semdedup pass trusts the labels.

Float discipline (the refit-literal lesson generalized): a cross-row float
SUM is reduction-order-dependent, so a naive centroid can never carry a
value-exact oracle.  Here every embedding value is integer-scaled map-side
(``floor(v * 10^6 + 0.5)`` — floor+0.5, not banker's round, identical in
both engines) and the per-(label, dim) aggregation sums INTEGERS — exact
under any reduction order.  Cosine is scale-invariant, so the cosine of the
integer per-dim AVERAGES (``sum DIV n``, exact) equals the centroid cosine
to within the stated 1e-6 quantization; dot/norm stay in BIGINT (envelope:
|dim| <= ~2*10^6 scaled, D=512 → dot <= 2*10^15), and the final
``dot / (sqrt(na) * sqrt(nb))`` is deterministic IEEE double on exact
integers — identical in Spark and DuckDB, surfaced UNROUNDED (decimal
rounding, not the arithmetic, is the cross-engine hazard).  The envelope
is enforced by a driver-side guard over the tiny centroid frame, which
also rejects ragged dimensionality — ACROSS labels (the dim equi-join
would silently cosine only the shared prefix) and WITHIN a label (mixed
vector lengths make per-dim support vary, so the centroid would average
differing populations per dimension; detected as non-constant n across a
label's dims, since posexplode makes per-dim n non-increasing).  Cauchy–Schwarz keeps |dot| under the guarded norms.

Spark shape, audited for 100 TB: posexplode → ``groupBy(label, dim)`` with
map-side partial aggregation (the only corpus-sized edge carries (label,
dim, partial-sum) — labels × D rows per map partition, not vectors); the
centroid frame (labels × D) is tiny, and the pairwise self-join on dim runs
over it, never over the corpus.

Returns ``(label_a, label_b, n_a, n_b, cos)`` for label_a < label_b,
ordered.  Standalone operator with a pytest DuckDB-parity oracle (the
driver registry sits at its 50-row cap).
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["QUERIES", "q_label_centroid_sim", "label_centroid_sim", "centroid_sql"]

_SCALE = 1_000_000


def q_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tablestructurerec_spark.sources.read import read_table

    return label_centroid_sim(read_table(spark, sf_dir, "embeddings"))


def label_centroid_sim(embs: DataFrame, materialize: bool = True) -> DataFrame:
    """By default the bounded result (≤ labels² pair rows) is eagerly
    collected and the persisted centroid frame released in a ``finally``
    (ADVICE r3: a long session otherwise accumulates live caches with no
    release path).  ``materialize=False`` returns ``(result, centroids)``
    instead — the lazy plan PLUS a handle to the persisted centroid frame,
    so the caller that now owns the cache's lifetime can actually release
    it (ADVICE r4: returning only the plan made the cache unreleasable
    except via ``spark.catalog.clearCache()``)."""
    dims = embs.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "label",
        "dim",
        F.expr(f"CAST(floor(CAST(v AS DOUBLE) * {_SCALE} + 0.5) AS BIGINT)").alias(
            "sv"
        ),
    )
    cent = dims.groupBy("label", "dim").agg(
        F.sum("sv").alias("s"), F.count(F.lit(1)).alias("n")
    ).select(
        "label", "dim", F.expr("s DIV n").alias("c"), "n"
    ).persist()  # tiny (labels x D); the guard collect + result both read it
    keep = False
    try:
        result = _guarded_pairs(cent)
        if not materialize:
            keep = True
            return result, cent
        rows, schema = result.collect(), result.schema
    finally:
        if not keep:
            cent.unpersist()
    return embs.sparkSession.createDataFrame(rows, schema)


def _guarded_pairs(cent: DataFrame) -> DataFrame:
    # Review-hardened guards, both driver-side over the tiny frame:
    # (a) BIGINT envelope is ENFORCED, not just documented — Spark's non-ANSI
    #     sum would wrap silently on |v| ≳ 134 at D=512 while DuckDB promotes
    #     to HUGEINT, breaking parity with garbage cosines;
    # (b) ragged dimensionality across labels is THE ingest pathology this
    #     check exists for — the dim equi-join would silently cosine only
    #     the shared prefix, so it must surface as an error instead.
    g = cent.groupBy("label").agg(
        F.max(F.abs(F.col("c"))).alias("mx"),
        F.count(F.lit(1)).alias("d"),
        F.min("n").alias("n_min"),
        F.max("n").alias("n_max"),
    ).collect()
    if g:
        max_c = max(r["mx"] for r in g)
        max_d = max(r["d"] for r in g)
        if max_c * max_c * max_d >= (1 << 63):
            raise ValueError(
                f"embedding magnitude too large for the BIGINT envelope "
                f"(max |scaled dim| {max_c}, D={max_d}); normalize vectors "
                f"or lower the scale before centroid cosine"
            )
        if len({r["d"] for r in g}) > 1:
            raise ValueError(
                "labels have differing dimensionality "
                f"({sorted((r['label'], r['d']) for r in g)}); mixed "
                "populations must be fixed upstream, not averaged away"
            )
        # Intra-label raggedness (ADVICE r3): posexplode makes per-dim n
        # non-increasing in dim, so vectors of MIXED lengths inside one
        # label show up as n varying across that label's dims — the
        # centroid would then average differing support per dimension and
        # max(a.n) would misreport the population size.  Constant n per
        # label is the raggedness-free certificate.
        ragged = sorted(
            (r["label"], r["n_min"], r["n_max"]) for r in g
            if r["n_min"] != r["n_max"]
        )
        if ragged:
            raise ValueError(
                "labels contain vectors of differing dimensionality "
                f"((label, min n, max n) = {ragged}); mixed-length vectors "
                "inside a label must be fixed upstream, not averaged away"
            )
    a, b = cent.alias("a"), cent.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.dim") == F.col("b.dim"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .agg(
            F.max("a.n").alias("n_a"),
            F.max("b.n").alias("n_b"),
            F.sum(F.col("a.c") * F.col("b.c")).alias("dot"),
            F.sum(F.col("a.c") * F.col("a.c")).alias("na"),
            F.sum(F.col("b.c") * F.col("b.c")).alias("nb"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        # raw IEEE double, deliberately UNROUNDED: div/sqrt/mul on exact
        # integer inputs are correctly-rounded and bit-identical in both
        # engines, while round(x, 6) is a cross-engine tie hazard (Spark
        # HALF_UP on the shortest decimal repr vs DuckDB's binary rounding
        # — review finding)
        (F.col("dot") / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb")))).alias("cos"),
    ).orderBy("label_a", "label_b")


def centroid_sql() -> str:
    """DuckDB twin of :func:`q_label_centroid_sim` — value-exact."""
    return f"""
WITH dims AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_SCALE} + 0.5) AS BIGINT) AS sv
  FROM embeddings
), cent AS (
  SELECT label, dim, sum(sv) // count(*) AS c, count(*) AS n
  FROM dims GROUP BY label, dim
), pairs AS (
  SELECT a.label AS label_a, b.label AS label_b,
         max(a.n) AS n_a, max(b.n) AS n_b,
         sum(a.c * b.c) AS dot,
         sum(a.c * a.c) AS na,
         sum(b.c * b.c) AS nb
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT label_a, label_b, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cos
FROM pairs
ORDER BY label_a, label_b
"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_label_centroid_sim": q_label_centroid_sim,
}
