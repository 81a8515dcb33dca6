"""Conversation prefix dedup (convdedup) — planted retry-stub scenarios:
strict-prefix domination, equal-sequence keep-first, chains resolving to
the maximal conversation, order/role sensitivity, and DuckDB value parity
of the standalone SQL (registry at the driver's 50-row cap).
"""

import os

import duckdb
import pytest

from tablestructurerec_spark.operators.convdedup import (
    _CONV_PREFIX_SQL,
    dedup_conv_prefix,
    q_dedup_conv_prefix,
)

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")


def _run(spark, convs):
    """convs: {conv_id: [(role, text), ...]} → {conv_id: Row}"""
    rows = [
        (cid, i, role, text)
        for cid, turns in convs.items()
        for i, (role, text) in enumerate(turns)
    ]
    df = spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string"
    )
    return {r["conv_id"]: r for r in dedup_conv_prefix(df).collect()}


U, A = "user", "assistant"


def test_strict_prefix_dominated(spark):
    got = _run(
        spark,
        {
            1: [(U, "hi"), (A, "hello"), (U, "bye")],
            2: [(U, "hi"), (A, "hello")],  # retry stub of 1
        },
    )
    assert not got[1]["is_dup"] and got[1]["kept_by"] is None
    assert got[2]["is_dup"] and got[2]["kept_by"] == 1


def test_equal_sequences_keep_first(spark):
    got = _run(spark, {5: [(U, "x"), (A, "y")], 3: [(U, "x"), (A, "y")]})
    assert not got[3]["is_dup"]
    assert got[5]["is_dup"] and got[5]["kept_by"] == 3


def test_chain_resolves_to_maximal(spark):
    got = _run(
        spark,
        {
            1: [(U, "a")],
            2: [(U, "a"), (A, "b")],
            3: [(U, "a"), (A, "b"), (U, "c")],
        },
    )
    assert got[1]["is_dup"] and got[1]["kept_by"] == 3  # longest dominator wins
    assert got[2]["is_dup"] and got[2]["kept_by"] == 3
    assert not got[3]["is_dup"]


def test_order_and_role_sensitive(spark):
    got = _run(
        spark,
        {
            1: [(U, "a"), (A, "b")],
            2: [(A, "b"), (U, "a")],  # same turns, different order
            3: [(A, "a"), (U, "b")],  # same texts, roles swapped
        },
    )
    assert not any(got[c]["is_dup"] for c in (1, 2, 3))


def test_mid_sequence_match_is_not_prefix(spark):
    # conv 2's sequence appears INSIDE conv 1 but not at the start
    got = _run(
        spark,
        {1: [(U, "a"), (A, "b"), (U, "c")], 2: [(A, "b"), (U, "c")]},
    )
    assert not got[2]["is_dup"]


def test_turn_hash_no_separator_ambiguity(spark):
    # role+text concatenation must not collide across the boundary
    got = _run(spark, {1: [("user", "x")], 2: [("use", "rx")]})
    assert not got[1]["is_dup"] and not got[2]["is_dup"]


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata absent"
)
def test_duckdb_parity(spark):
    sdf = q_dedup_conv_prefix(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    odf = con.execute(_CONV_PREFIX_SQL).df()
    assert len(sdf) == len(odf)
    import pandas as pd

    def vals(s):  # kept_by is nullable: NaN != NaN under tolist comparison
        return [None if pd.isna(x) else x for x in s]

    for col in sdf.columns:
        assert vals(sdf[col]) == vals(odf[col]), col


def test_no_cartesian_in_plan(spark):
    df = _plan_frame(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan, plan


def _plan_frame(spark):
    rows = [(1, 0, U, "a"), (1, 1, A, "b"), (2, 0, U, "a")]
    df = spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string"
    )
    return dedup_conv_prefix(df)
