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


# ---------------------------------------------------------------------------
# sequenced funnel — view → click → purchase, each step AFTER the previous
# ---------------------------------------------------------------------------
_FUNNEL_STEPS = ("view", "click", "purchase")


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: the classic ORDERED funnel — first ``view``, first
    ``click`` at-or-after that view, first ``purchase`` at-or-after that
    click (an unordered ``count distinct event_type`` overstates
    conversion; the sequencing is the point).

    Shape: a conditional min-ts cascade — three aggregations all keyed on
    ``user_id`` (high-cardinality, no skew pivot) with the step-N frame
    (#users rows, shrinking each step) joined back to the filtered event
    stream.  No window over the raw stream and no per-user array
    materialization, so a power user costs three partial-agg passes, never
    an in-memory event list.  Timestamps surface as anchor-relative
    microseconds BIGINT (the rollup's tz-free bucketing trick — the source
    column is TIMESTAMP_NTZ, so absolute epoch extraction would be
    session-timezone-dependent) with ``-1`` for "did not reach" — integer
    outputs hash exactly; a nullable timestamp would compare NaT != NaT in
    the driver.
    """
    raw = _t(spark, sf_dir, "events")
    anchor = raw.agg(F.min("ts").alias("t0"))  # 1 row — broadcast by AQE
    ev = raw.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.expr("timestampdiff(MICROSECOND, t0, ts)").cast("long").alias("us"),
        "event_type",
    )
    v = (
        ev.where(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("v_us"))
    )
    c = (
        ev.where(F.col("event_type") == _FUNNEL_STEPS[1])
        .join(v, "user_id")
        .where(F.col("us") >= F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    p = (
        ev.where(F.col("event_type") == _FUNNEL_STEPS[2])
        .join(c, "user_id")
        .where(F.col("us") >= F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    stage = (
        F.when(F.col("p_us").isNotNull(), F.lit(_FUNNEL_STEPS[2]))
        .when(F.col("c_us").isNotNull(), F.lit(_FUNNEL_STEPS[1]))
        .otherwise(F.lit(_FUNNEL_STEPS[0]))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.col("v_us").alias("view_us"),
            F.coalesce("c_us", F.lit(-1)).alias("click_us"),
            F.coalesce("p_us", F.lit(-1)).alias("purchase_us"),
            stage.alias("stage"),
        )
        .orderBy("user_id")
    )


_FUNNEL_SQL = f"""
WITH anchor AS (
  SELECT MIN(ts) AS t0 FROM events
), ev AS (
  SELECT user_id, CAST(date_diff('microsecond', t0, ts) AS BIGINT) AS us,
         event_type
  FROM events, anchor
), v AS (
  SELECT user_id, MIN(us) AS v_us FROM ev
  WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.us) AS c_us
  FROM ev e JOIN v USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND e.us >= v.v_us
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.us) AS p_us
  FROM ev e JOIN c USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND e.us >= c.c_us
  GROUP BY e.user_id
)
SELECT v.user_id, v.v_us AS view_us,
       COALESCE(c.c_us, -1) AS click_us,
       COALESCE(p.p_us, -1) AS purchase_us,
       CASE WHEN p.p_us IS NOT NULL THEN '{_FUNNEL_STEPS[2]}'
            WHEN c.c_us IS NOT NULL THEN '{_FUNNEL_STEPS[1]}'
            ELSE '{_FUNNEL_STEPS[0]}' END AS stage
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
ORDER BY v.user_id
"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_asof_join": q_asof_join,
    "t_event_rollup": q_event_rollup,
    "t_event_funnel": q_event_funnel,
}

ORACLE_SQL: Dict[str, str] = {
    "t_asof_join": _ASOF_SQL,
    "t_event_rollup": _ROLLUP_SQL,
    "t_event_funnel": _FUNNEL_SQL,
}
