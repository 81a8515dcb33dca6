"""Streaming twins for the round-3 audit family (VERDICT r3 #8): health,
mojibake, and ingest-drift monitoring over an unbounded ingest.

Discipline (the ``quality_stream`` precedent): the streaming face REUSES
the batch operator's own column expressions verbatim — nothing is
re-implemented, so stream and batch cannot drift, and the tests assert
stream == batch byte-for-byte through a real ``readStream`` →
``writeStream`` run.

Shapes:

* :func:`stream_encoding_damage` — MAP-ONLY (``mojibake.encoding_damage``
  with the presentation sort dropped): zero stateful operators, zero
  shuffles; exactly-once comes free from the sink checkpoint and
  throughput scales with input partitions.
* :func:`stream_health_report` — ``health.doc_flags`` (stateless) into
  ``health.aggregate_flags``: ONE bounded-key stateful aggregate (state =
  four counters per source — O(|sources|), never per-doc), run in
  complete/update output mode.
* :func:`stream_ingest_counts` — ``drift.ingest_counts`` as a bounded-key
  streaming aggregate (state = one counter per (day, category)); the
  day-pairing L1 step (``drift.drift_from_counts``) is a driver-side
  batch computation over the TINY counts result, run per trigger (e.g.
  inside ``foreachBatch``) — the standard split for a monitor whose
  output depends on the whole history of a bounded key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from tablestructurerec_spark.operators.drift import ingest_counts
from tablestructurerec_spark.operators.health import aggregate_flags, doc_flags
from tablestructurerec_spark.operators.mojibake import encoding_damage

__all__ = [
    "stream_encoding_damage",
    "stream_health_report",
    "stream_ingest_counts",
]


def stream_encoding_damage(stream_df: DataFrame) -> DataFrame:
    """Per-doc mojibake damage over a streaming documents frame —
    stateless; append output mode."""
    return encoding_damage(stream_df, ordered=False)


def stream_health_report(stream_df: DataFrame) -> DataFrame:
    """Per-source health counters over a streaming documents frame —
    bounded-key aggregate; complete (or update) output mode."""
    return aggregate_flags(doc_flags(stream_df))


def stream_ingest_counts(stream_df: DataFrame, cat_col: str) -> DataFrame:
    """(day, category) ingest counts over a streaming events frame —
    bounded-key aggregate; complete output mode.  Feed the collected
    result to ``drift.drift_from_counts`` per trigger for the day-over-day
    L1 drift rows."""
    return ingest_counts(stream_df, cat_col)
