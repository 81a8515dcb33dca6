"""Streaming corpus-quality scoring — the stateless twin of the distilled
NB filter (``operators/distill.py``).

The production shape for quality-filtering an unbounded ingest: the model
is FIT OFFLINE in batch (teacher labels → hashed-NB student,
``distill.nb_model`` collects it as ≤1024 integers), then the stream is
scored by a pure per-row expression — no shuffle, no streaming state, no
watermark, so exactly-once comes free from the sink checkpoint and
throughput scales with input partitions (the ``stream_extract_tables``
argument).  This is precisely why the distillation step exists: the CCNet
teacher needs corpus aggregations (impossible statelessly on a stream);
the student's whole model rides along as a map literal.

Plan-shape note: the model map is STAGED as its own projected column and
the per-token lambda references that attribute — embedding the 1024-entry
``create_map`` literal inside the higher-order lambda would re-inline it
per element (the SCALING.md §4d / langid lesson).  The interpreted HOF sum
trades whole-stage codegen for statelessness — the right trade on a
stream; the batch path keeps the codegen'd join+aggregate form.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tablestructurerec_spark.operators.distill import (
    _SCALE_NB,
    _hash_bucket,
)
from tablestructurerec_spark.operators.textstats import tokens_col

__all__ = ["stream_quality_assign"]


def stream_quality_assign(
    stream_df: DataFrame, ratio: Dict[int, int], prior: int
) -> DataFrame:
    """Score a (streaming or batch) documents frame with a collected NB
    model: emits ``(doc_id, n_feats, nb_score, pred_head)`` with values
    IDENTICAL to ``distill.q_quality_distill`` (integer sums over the same
    scaled log-ratios — asserted stream-vs-batch in tests)."""
    pairs = [x for kv in sorted(ratio.items()) for x in (F.lit(kv[0]), F.lit(kv[1]))]
    staged = stream_df.select(
        "doc_id",
        tokens_col(F.col("text")).alias("toks"),
        F.create_map(*pairs).alias("m"),
    )
    s = F.aggregate(
        F.transform(
            F.col("toks"),
            lambda t: F.coalesce(
                F.element_at(F.col("m"), _hash_bucket(t)), F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    logodds = F.lit(int(prior)) + s
    return staged.select(
        "doc_id",
        F.size(F.col("toks")).alias("n_feats"),
        F.round(logodds / float(_SCALE_NB), 6).alias("nb_score"),
        (logodds > 0).cast("int").alias("pred_head"),
    )
