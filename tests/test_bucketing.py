"""Bucketed co-located joins: shuffle paid at write time, zero Exchange at
join time — pinned on the physical plan and value-checked vs the plain join."""

import pytest
from pyspark.sql import functions as F

from tablestructurerec_spark.plans.bucketing import (
    bucketed_extraction_tables,
    write_bucketed,
)
from tablestructurerec_spark.sources.synthetic import synth_transcripts


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Force the SMJ path so the test exercises bucketing, not broadcast."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange_and_matches_plain_join(spark, no_broadcast):
    transcripts = synth_transcripts(spark, n_convs=20, mean_turns=5, seed=7)
    t_turns, t_tables = bucketed_extraction_tables(
        spark, transcripts, prefix="tsr_test_bkt", n_buckets=8
    )
    turns, tables = spark.table(t_turns), spark.table(t_tables)

    joined = turns.join(tables, ["conv_id", "turn_idx"]).select(
        "conv_id", "turn_idx", "table_idx", "n_cells", F.length("main_text").alias("len")
    )
    plan = _plan(joined)
    # co-located: bucketing metadata satisfies the join's distribution
    # requirement on BOTH sides — the whole point of paying the bucketed
    # write.  A plain parquet round-trip of the same data shuffles twice.
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan

    plain = (
        transcripts.sparkSession.createDataFrame(turns.collect(), turns.schema)
        .join(
            transcripts.sparkSession.createDataFrame(tables.collect(), tables.schema),
            ["conv_id", "turn_idx"],
        )
        .select(
            "conv_id", "turn_idx", "table_idx", "n_cells",
            F.length("main_text").alias("len"),
        )
    )
    key = lambda r: (r.conv_id, r.turn_idx, r.table_idx)
    assert sorted(joined.collect(), key=key) == sorted(plain.collect(), key=key)


def test_bucketed_write_roundtrips_rows(spark):
    df = spark.range(100).select(
        (F.col("id") % 10).cast("string").alias("k"), F.col("id").alias("v")
    )
    write_bucketed(df, "tsr_test_bkt_small", "k", n_buckets=4)
    got = sorted(spark.table("tsr_test_bkt_small").collect(), key=lambda r: r.v)
    assert [r.v for r in got] == list(range(100))
