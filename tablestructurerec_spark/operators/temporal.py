"""Temporal operators over ``events``: as-of join and tumbling-window rollup.

Two operator families a transcript/event pipeline needs that no other module
covers:

* **As-of join** (``t_asof_join``) — for every ``purchase`` event, the most
  recent ``click`` by the same user at or before it.  Implemented as the
  scalable *tagged-window* form, not a join: ONE scan projects a side tag,
  then one window per user carries the last click forward as a single
  struct (``last(struct(...), ignorenulls)`` — one struct, not per-column
  windows, so a NULL click payload field can never desynchronize the
  carried id/value/ts).  Exactly ONE shuffle (on ``user_id``) and ONE scan
  for the whole operator; the running frame is evaluated incrementally.
  The naive alternative — a ``left.ts >= right.ts`` range join — is
  O(clicks × purchases) per user and collapses on power users; this form is
  O(events log events) per user: a hot key is one sorted task (sorts spill
  to disk and degrade linearly — window partitions are NOT splittable by
  AQE skew handling, so a single pathological key is a straggler, never a
  quadratic blowup; if one key outgrows a task, pre-split it by time range
  and stitch the boundary carry in a second tiny pass).
* **Hierarchical tumbling rollup** (``t_event_rollup``) — hour-grain counts
  and value sums per event type, plus the day grain computed FROM the hourly
  partials rather than from raw events.  That cascade is the 100 TB rollup
  shape: the raw table is scanned ONCE (pinned by a plan test — naively
  unioning ``hourly`` with ``daily(hourly)`` defeats Catalyst exchange reuse
  because grouping-expression IDs diverge per union branch, re-scanning raw
  events; instead each hourly row explodes into its two grain memberships
  and one tiny re-aggregation emits both grains).  The only other scan is
  the 1-column ``min(ts)`` anchor (broadcast 1 row); buckets are microsecond
  arithmetic against that anchor — no ``date_trunc``/``date_format``, so
  Spark-vs-DuckDB session-timezone semantics can never disagree.

Both pure Catalyst with DuckDB ANSI-SQL oracles over the same parquet.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["QUERIES", "ORACLE_SQL"]

_LEFT_TYPE = "purchase"  # rows that receive the carried value
_RIGHT_TYPE = "click"  # rows whose payload is carried forward
_US_PER_HOUR = 3_600_000_000


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# as-of join — union-window form, single shuffle
# ---------------------------------------------------------------------------
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most recent prior-or-equal click per purchase, per user.

    Tie rule: at equal ``ts`` the click is visible to the purchase
    (<= semantics) — the sort key ``(ts, side, src_id)`` places side=0
    (click) rows first.  Purchases before any click keep NULL click columns
    (left-outer semantics).
    """
    ev = _t(spark, sf_dir, "events")
    is_right = F.col("event_type") == _RIGHT_TYPE
    tagged = ev.where(F.col("event_type").isin(_RIGHT_TYPE, _LEFT_TYPE)).select(
        "user_id",
        "ts",
        F.col("event_id").alias("src_id"),
        F.when(is_right, F.lit(0)).otherwise(F.lit(1)).alias("side"),
        # the whole carried payload as ONE nullable struct: a NULL field
        # inside a click can never desynchronize id/value/ts
        F.when(
            is_right,
            F.struct(
                F.col("event_id").alias("id"),
                F.col("value").alias("v"),
                F.col("ts").alias("t"),
            ),
        ).alias("payload"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "src_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn("click", F.last("payload", True).over(w))
    return (
        carried.where(F.col("side") == 1)
        .select(
            F.col("src_id").alias("purchase_id"),
            "user_id",
            F.col("click.id").alias("click_id"),
            F.round(F.col("click.v"), 6).alias("click_value"),
            F.expr("timestampdiff(MICROSECOND, click.t, ts)")
            .cast("long")
            .alias("gap_us"),
        )
        .orderBy("purchase_id")
    )


_ASOF_SQL = f"""
WITH u AS (
  SELECT user_id, ts, event_id AS src_id,
         CASE WHEN event_type = '{_RIGHT_TYPE}' THEN 0 ELSE 1 END AS side
  FROM events
  WHERE event_type IN ('{_RIGHT_TYPE}', '{_LEFT_TYPE}')
), c AS (
  SELECT user_id, ts, src_id, side,
         last_value(CASE WHEN side = 0 THEN src_id END IGNORE NULLS) OVER w
             AS click_id
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, src_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
-- the carried payload columns come from re-joining the picked click row,
-- so they are consistent-by-construction (mirrors the Spark struct carry)
SELECT c.src_id AS purchase_id, c.user_id, c.click_id,
       ROUND(e.value, 6) AS click_value,
       CAST(date_diff('microsecond', e.ts, c.ts) AS BIGINT) AS gap_us
FROM c LEFT JOIN events e ON e.event_id = c.click_id
WHERE c.side = 1
ORDER BY purchase_id
"""


# ---------------------------------------------------------------------------
# hierarchical tumbling rollup — day grain from hourly partials
# ---------------------------------------------------------------------------
def q_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    anchor = ev.agg(F.min("ts").alias("t0"))  # 1 row — broadcast by AQE
    bucket = (
        F.expr("timestampdiff(MICROSECOND, t0, ts)") / F.lit(_US_PER_HOUR)
    ).cast("long")
    hourly = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy(bucket.alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )
    # Cascade without re-scanning raw events: referencing `hourly` from two
    # union branches defeats Catalyst exchange reuse (grouping-expression IDs
    # diverge per branch), so instead each hourly row explodes into its two
    # grain memberships and ONE tiny re-aggregation produces both grains.
    # Hour keys are unique post-agg, so their second sum is the identity.
    grains = F.explode(
        F.array(
            F.struct(F.lit("hour").alias("grain"), F.col("bucket").alias("b")),
            F.struct(
                F.lit("day").alias("grain"),
                F.floor(F.col("bucket") / 24).cast("long").alias("b"),
            ),
        )
    )
    return (
        hourly.select(grains.alias("g"), "event_type", "n_events", "sum_value")
        .groupBy(F.col("g.grain").alias("grain"), F.col("g.b").alias("bucket"), "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.round(F.sum("sum_value"), 4).alias("sum_value"),
        )
        .orderBy("grain", "bucket", "event_type")
    )


_ROLLUP_SQL = f"""
WITH anchor AS (SELECT min(ts) AS t0 FROM events),
hourly AS (
  SELECT CAST(floor(date_diff('microsecond', t0, ts) / {_US_PER_HOUR}.0) AS BIGINT)
             AS bucket,
         event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         sum(value) AS sum_value
  FROM events, anchor
  GROUP BY 1, 2
)
SELECT 'hour' AS grain, bucket, event_type, n_events,
       ROUND(sum_value, 4) AS sum_value
FROM hourly
UNION ALL
SELECT 'day', CAST(floor(bucket / 24.0) AS BIGINT), event_type,
       CAST(sum(n_events) AS BIGINT), ROUND(sum(sum_value), 4)
FROM hourly GROUP BY 2, 3
ORDER BY grain, bucket, event_type
"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_asof_join": q_asof_join,
    "t_event_rollup": q_event_rollup,
}

ORACLE_SQL: Dict[str, str] = {
    "t_asof_join": _ASOF_SQL,
    "t_event_rollup": _ROLLUP_SQL,
}
