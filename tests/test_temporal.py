"""Temporal operators: as-of join semantics + rollup cascade plan shape.

The DuckDB oracle parity for both queries is covered by
``test_oracle_parity``; these pin the *semantics* independently (pandas
recomputation of the as-of rule) and the *plan shapes* SCALING.md claims
(single shuffle for the as-of, scan-once cascade for the rollup).
"""

import pandas as pd

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_join_matches_pandas_recompute(spark):
    from tablestructurerec_spark.operators.temporal import q_asof_join

    got = q_asof_join(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    clicks = ev[ev.event_type == "click"]
    purchases = ev[ev.event_type == "purchase"]
    assert len(got) == len(purchases)

    by_id = got.set_index("purchase_id")
    for p in purchases.itertuples(index=False):
        cand = clicks[(clicks.user_id == p.user_id) & (clicks.ts <= p.ts)]
        row = by_id.loc[p.event_id]
        if cand.empty:
            assert pd.isna(row.click_id)
        else:
            best = cand.sort_values(["ts", "event_id"]).iloc[-1]
            assert row.click_id == best.event_id
            assert row.gap_us == int((p.ts - best.ts).value // 1000)


def test_asof_join_null_payload_does_not_desync(spark, tmp_path):
    """A NULL click value must not split the carried columns across two
    different clicks (regression: per-column ignorenulls windows would take
    click_id from the newest click but click_value from an older one)."""
    from tablestructurerec_spark.operators.temporal import q_asof_join

    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:05", "2024-01-01 00:00:10", "2024-01-01 00:00:20"]
            ).astype("datetime64[us]"),  # Spark cannot read nanosecond parquet timestamps
            "user_id": [7, 7, 7],
            "event_type": ["click", "click", "purchase"],
            "value": [3.0, None, 9.9],
            "props": ["{}", "{}", "{}"],
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")
    got = q_asof_join(spark, str(tmp_path)).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row.click_id == 2  # the newest click, even though its value is NULL
    assert pd.isna(row.click_value)  # NOT 3.0 from the older click
    assert row.gap_us == 10_000_000


def test_asof_join_is_single_shuffle_no_join(spark):
    from tablestructurerec_spark.operators.temporal import q_asof_join

    plan = _plan(q_asof_join(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # tagged-window form, not a range join
    assert plan.count("FileScan parquet") == 1  # one scan, not per-side scans


def test_rollup_day_equals_sum_of_hours(spark):
    from tablestructurerec_spark.operators.temporal import q_event_rollup

    df = q_event_rollup(spark, SF).toPandas()
    hours = df[df.grain == "hour"].copy()
    days = df[df.grain == "day"]
    hours["day_bucket"] = hours.bucket // 24
    re = (
        hours.groupby(["day_bucket", "event_type"])
        .agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        .reset_index()
    )
    merged = days.merge(
        re, left_on=["bucket", "event_type"], right_on=["day_bucket", "event_type"]
    )
    assert len(merged) == len(days) == len(re)
    assert (merged.n_events_x == merged.n_events_y).all()
    # hour-level values are rounded to 4dp before the day re-sum here, so
    # allow only that re-rounding slack
    assert (merged.sum_value_x - merged.sum_value_y).abs().max() < 1e-2


def test_rollup_scans_raw_events_once(spark):
    from tablestructurerec_spark.operators.temporal import q_event_rollup

    plan = _plan(q_event_rollup(spark, SF))
    # exactly 2 scans: the value scan and the 1-column min(ts) anchor scan
    assert plan.count("FileScan parquet") == 2
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert any("[ts#" in ln and "value#" not in ln for ln in scans), "anchor scan must prune to ts"


def test_event_funnel_matches_python_recompute(spark):
    """Sequenced funnel vs a from-scratch per-user walk over the raw
    events (independent of both the Spark plan and the SQL oracle;
    duckdb serves only as the parquet reader)."""
    import duckdb

    from tablestructurerec_spark.operators.temporal import q_event_funnel

    rows = duckdb.connect().execute(
        f"SELECT user_id, ts, event_type FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    t0 = min(ts for _, ts, _ in rows)

    def us(td):
        # exact integer microseconds — total_seconds() goes through a
        # float and misrounds ~1% of this fixture's rows by 1 µs
        return td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds

    by_user: dict = {}
    for uid, ts, et in rows:
        by_user.setdefault(uid, []).append((us(ts - t0), et))
    want = {}
    for uid, evs in by_user.items():
        views = [us for us, et in evs if et == "view"]
        if not views:
            continue
        v = min(views)
        clicks = [us for us, et in evs if et == "click" and us >= v]
        c = min(clicks) if clicks else -1
        purchases = [us for us, et in evs if et == "purchase" and c != -1 and us >= c]
        p = min(purchases) if purchases else -1
        stage = "purchase" if p != -1 else ("click" if c != -1 else "view")
        want[uid] = (v, c, p, stage)
    got = {
        r.user_id: (r.view_us, r.click_us, r.purchase_us, r.stage)
        for r in q_event_funnel(spark, SF).collect()
    }
    assert got == want
