"""Fused data-selection pipeline row — FOUR selection operators, one
driver-certified result (round-5 registry rotation #2, the
``t_text_profile`` / ``t_sketch_audit`` consolidation pattern).

A pretraining corpus is *selected*, not just cleaned: CCNet perplexity
bucketing picks the in-distribution slice, a distilled quality classifier
generalizes the verdict beyond the teacher's reach, DSIR importance
weights re-balance toward the target domain, and curriculum ordering
decides what the model sees first.  Each stage already exists as a
standalone operator with its own value-exact DuckDB oracle and pytest
(``ccnet`` / ``distill`` / ``sampling.q_dsir_weights`` / ``curriculum``)
— but none of the four has ever had a green row in the driver's capped
50-row correctness registry.  This module joins their PER-DOCUMENT
outputs on ``doc_id`` into one wide row, so a single driver row
rows+schema+hash-pins all four kernels at once.

Nothing is re-implemented: the Spark side calls the four modules' own
query functions verbatim; the oracle composes their module-level SQL
strings (``_CCNET_SQL`` / ``_DISTILL_SQL`` / ``_DSIR_SQL`` /
``_CURRICULUM_SQL``) byte-for-byte as CTEs — zero transcription drift,
the ``profile.py`` discipline.

Scale shape (audited in each home module, inherited unchanged here):
every stage is scan → bounded-model broadcast join → per-doc partial
agg; the only new physical work this fusion adds is three doc_id
equi-joins between 1-row-per-doc frames (AQE-planned; on a bucketed
layout they are exchange-free).  The fused plan IS the production
plan: a real selection run wants all four verdicts per document in one
table, not four separate passes over the catalog.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tablestructurerec_spark.operators.ccnet import _CCNET_SQL, q_ccnet_buckets
from tablestructurerec_spark.operators.curriculum import (
    _CURRICULUM_SQL,
    q_curriculum_order,
)
from tablestructurerec_spark.operators.distill import _DISTILL_SQL, q_quality_distill
from tablestructurerec_spark.operators.sampling import _DSIR_SQL, q_dsir_weights

__all__ = ["QUERIES", "q_selection_pipeline", "selection_sql"]


def q_selection_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per document: ``(doc_id, lang, n_tokens, ppl, ppl_bucket,
    nb_feats, nb_score, pred_head, dsir_feats, dsir_logw, keep_target,
    n_chars, order_idx, shard)`` — the CCNet verdict, the distilled-NB
    verdict, the DSIR importance weight, and the curriculum position,
    joined on ``doc_id`` (all four stages emit exactly one row per doc,
    so the inner joins are total)."""
    cc_raw = q_ccnet_buckets(spark, sf_dir)
    cc = cc_raw.select(
        "doc_id",
        "lang",
        "n_tokens",
        "ppl",
        F.col("bucket").alias("ppl_bucket"),
    )
    # the SAME DataFrame object feeds the distill teacher fit, so the two
    # consumers carry identical expression IDs — the precondition for
    # runtime exchange reuse of the CCNet aggregates (separate
    # q_ccnet_buckets calls can never be deduped; shared ones can be,
    # stage-permitting — measured a modest win, not a halving, because the
    # teacher's filter sits between the shared aggregates and its consumer)
    nb = q_quality_distill(spark, sf_dir, teacher=cc_raw).select(
        "doc_id",
        F.col("n_feats").alias("nb_feats"),
        "nb_score",
        "pred_head",
    )
    ds = q_dsir_weights(spark, sf_dir).select(
        "doc_id",
        F.col("n_feats").alias("dsir_feats"),
        F.col("logw").alias("dsir_logw"),
        "keep_target",
    )
    cu = q_curriculum_order(spark, sf_dir).select(
        "doc_id", "n_chars", "order_idx", "shard"
    )
    return (
        cc.join(nb, "doc_id")
        .join(ds, "doc_id")
        .join(cu, "doc_id")
        .orderBy("doc_id")
    )


def selection_sql() -> str:
    """DuckDB twin — the four home-module oracle strings composed verbatim
    as CTEs and joined on ``doc_id`` with the same renames."""
    return f"""
WITH cc AS ({_CCNET_SQL}),
nb AS ({_DISTILL_SQL}),
ds AS ({_DSIR_SQL}),
cu AS ({_CURRICULUM_SQL})
SELECT cc.doc_id, cc.lang, cc.n_tokens, cc.ppl, cc.bucket AS ppl_bucket,
       nb.n_feats AS nb_feats, nb.nb_score, nb.pred_head,
       ds.n_feats AS dsir_feats, ds.logw AS dsir_logw, ds.keep_target,
       cu.n_chars, cu.order_idx, cu.shard
FROM cc
JOIN nb USING (doc_id)
JOIN ds USING (doc_id)
JOIN cu USING (doc_id)
ORDER BY doc_id
"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_selection_pipeline": q_selection_pipeline,
}

ORACLE_SQL: Dict[str, str] = {
    "t_selection_pipeline": selection_sql(),
}
