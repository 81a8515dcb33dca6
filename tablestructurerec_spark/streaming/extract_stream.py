"""Streaming extraction: the same plan over a transcript stream.

The reference is batch-only (SURVEY.md §2: no streaming operators), but a
10^12-turn ingest is naturally incremental, so the engine exposes:

* ``stream_extract_tables``  — the identical narrow ``mapInPandas`` stage on
  a streaming DataFrame (mapInPandas is streaming-capable; the per-turn
  kernel is stateless, so exactly-once comes free from the sink+checkpoint).
* ``stream_turn_stats``      — a watermarked sliding-window aggregate of
  turn/table counts per conversation, for ingest monitoring (late turns up
  to 10 minutes).
* ``stream_conversation_sessions`` — a CUSTOM STATEFUL operator
  (``applyInPandasWithState`` + event-time timeout): gap-based session
  assembly per conversation, one row per closed session.

Both run with any source (kafka/files/rate); tests use a file source with
``trigger(availableNow=True)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import has_table_col, n_tables_col
from ..plans.extract import TABLES_SCHEMA, _extract_batch

__all__ = [
    "stream_extract_tables",
    "stream_turn_stats",
    "stream_conversation_sessions",
]


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


def stream_conversation_sessions(
    stream_df: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful operator: per-conversation session assembly with
    ``applyInPandasWithState`` (the A1 sessionization contract, streaming).

    A conversation's session stays open in the state store while turns keep
    arriving; ``gap`` of event-time silence (enforced via event-time timeout
    against the watermark) closes it and emits ONE row:
    ``(conv_id, session_start, session_end, n_turns, n_tables)``.

    Scale shape: state is 4 scalars per live conversation — O(live convs),
    not O(turns); the per-turn table count is computed as a native column
    BEFORE the stateful stage so the Python side only sums.  RocksDB state
    store + watermark eviction make this runnable on the 10^12-turn ingest.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = _duration_ms(gap)
    src = (
        stream_df.withWatermark("ts", watermark)
        .select(
            "conv_id",
            F.col("ts"),
            n_tables_col(F.col("text")).alias("n_tab"),
        )
    )

    out_schema = (
        "conv_id string, session_start timestamp, session_end timestamp, "
        "n_turns long, n_tables long"
    )
    state_schema = "n_turns long, n_tables long, start_ms long, last_ms long"

    def fn(key, pdfs, state):
        import pandas as pd

        def frame(sessions):
            return pd.DataFrame(
                {
                    "conv_id": [conv_id] * len(sessions),
                    "session_start": [pd.Timestamp(s[2], unit="ms") for s in sessions],
                    "session_end": [pd.Timestamp(s[3], unit="ms") for s in sessions],
                    "n_turns": [s[0] for s in sessions],
                    "n_tables": [s[1] for s in sessions],
                }
            )

        (conv_id,) = key
        if state.hasTimedOut:
            closed = [list(state.get)]
            state.remove()
            yield frame(closed)
            return
        cur = list(state.get) if state.exists else None  # [n_turns, n_tables, start, last]
        closed = []
        # sort this batch's turns by event time so a gap INSIDE the batch
        # splits sessions exactly like the same turns arriving across
        # batches would (replay/backfill delivers a whole conversation in
        # one batch — batch boundaries must not define session boundaries)
        rows = []
        for pdf in pdfs:
            ms = pdf["ts"].astype("int64") // 1_000_000
            rows.extend(zip((int(v) for v in ms), (int(v) for v in pdf["n_tab"])))
        rows.sort()
        for ms, ntab in rows:
            if cur is None:
                cur = [1, ntab, ms, ms]
            elif ms - cur[3] > gap_ms:
                closed.append(cur)
                cur = [1, ntab, ms, ms]
            else:
                cur[0] += 1
                cur[1] += ntab
                cur[2] = min(cur[2], ms)
                cur[3] = max(cur[3], ms)
        state.update(tuple(cur))
        state.setTimeoutTimestamp(cur[3] + gap_ms)
        if closed:
            yield frame(closed)

    return src.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _duration_ms(s: str) -> int:
    n, unit = s.split()
    mult = {
        "millisecond": 1, "milliseconds": 1,
        "second": 1000, "seconds": 1000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
        "day": 86_400_000, "days": 86_400_000,
    }[unit]
    return int(n) * mult
