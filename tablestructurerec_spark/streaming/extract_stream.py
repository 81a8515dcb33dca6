"""Streaming extraction: the same plan over a transcript stream.

The reference is batch-only (SURVEY.md §2: no streaming operators), but a
10^12-turn ingest is naturally incremental, so the engine exposes:

* ``stream_extract_tables``  — the identical narrow ``mapInPandas`` stage on
  a streaming DataFrame (mapInPandas is streaming-capable; the per-turn
  kernel is stateless, so exactly-once comes free from the sink+checkpoint).
* ``stream_turn_stats``      — a watermarked sliding-window aggregate of
  turn/table counts per conversation, for ingest monitoring (late turns up
  to 10 minutes).

Both run with any source (kafka/files/rate); tests use a file source with
``trigger(availableNow=True)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import has_table_col, n_tables_col
from ..plans.extract import TABLES_SCHEMA, _extract_batch

__all__ = ["stream_extract_tables", "stream_turn_stats"]


def stream_extract_tables(stream_df: DataFrame) -> DataFrame:
    """Streaming twin of :func:`plans.extract.extract_tables`."""
    src = stream_df.where(has_table_col(F.col("text"))).select(
        "conv_id", "turn_idx", "text"
    )
    return src.mapInPandas(_extract_batch, schema=TABLES_SCHEMA)


def stream_turn_stats(stream_df: DataFrame, window: str = "10 minutes") -> DataFrame:
    """Watermarked windowed ingest stats: turns + embedded tables per conv."""
    return (
        stream_df.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(n_tables_col(F.col("text"))).alias("n_tables"),
        )
    )
