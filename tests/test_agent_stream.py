"""Streaming agent-loop monitor (streaming/agent_stream.py) — final stream
verdicts must equal the batch audit through a real readStream run, state
must survive a checkpoint restart with the second half of each
conversation arriving later, and disordered rows must be counted, not
silently folded.
"""

import os

import pytest

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata absent"
)


def _agent_turns(spark):
    from tablestructurerec_spark.operators.tooluse import _agent_view
    from tablestructurerec_spark.sources.read import read_table

    return _agent_view(read_table(spark, SF_DIR, "documents"))


def _run_stream(spark, src_dir, sink, checkpoint):
    """Drive the monitor with foreachBatch (memory sink cannot recover from
    a checkpoint); emitted rows append to `sink` across triggers/restarts."""
    from tablestructurerec_spark.streaming.agent_stream import (
        stream_agent_loop_alerts,
    )

    schema = (
        "conv_id BIGINT, turn_idx INT, role STRING, tool STRING, ts TIMESTAMP_NTZ"
    )
    stream = spark.readStream.schema(schema).parquet(src_dir)

    def absorb(batch_df, _bid):
        sink.extend(batch_df.collect())

    q = (
        stream_agent_loop_alerts(stream)
        .writeStream.foreachBatch(absorb)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _final_verdicts(rows):
    # update mode emits one row per (conv, trigger); the monitored metrics
    # are monotone, so the final verdict is the per-conv max
    out = {}
    for r in rows:
        g = out.setdefault(
            r["conv_id"],
            {"n_tool_turns": 0, "max_run_len": 0, "n_loop_runs": 0, "n_disordered": 0},
        )
        for k in g:
            g[k] = max(g[k], r[k])
    return out


def test_stream_equals_batch_single_run(spark, tmp_path):
    from tablestructurerec_spark.operators.tooluse import agent_loop_audit

    turns = _agent_turns(spark)
    src = str(tmp_path / "src")
    turns.write.parquet(src)
    sink = []
    _run_stream(spark, src, sink, str(tmp_path / "ckpt"))

    got = _final_verdicts(sink)
    want = {r["conv_id"]: r for r in agent_loop_audit(turns).collect()}
    assert set(got) == {str(k) for k in want}
    for cid, w in want.items():
        g = got[str(cid)]
        assert g["max_run_len"] == w["max_run_len"], cid
        assert g["n_loop_runs"] == w["n_loop_runs"], cid
        assert g["n_disordered"] == 0, cid


def test_state_survives_checkpoint_restart(spark, tmp_path):
    """First run sees turns 0-3, restart on the same checkpoint sees 4-7:
    runs that STRADDLE the split must still be detected."""
    from pyspark.sql import functions as F

    from tablestructurerec_spark.operators.tooluse import agent_loop_audit

    turns = _agent_turns(spark)
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    turns.where(F.col("turn_idx") < 4).write.parquet(src)
    sink = []
    _run_stream(spark, src, sink, ckpt)
    turns.where(F.col("turn_idx") >= 4).write.mode("append").parquet(src)
    _run_stream(spark, src, sink, ckpt)

    got = _final_verdicts(sink)
    want = {r["conv_id"]: r for r in agent_loop_audit(turns).collect()}
    assert set(got) == {str(k) for k in want}
    for cid, w in want.items():
        g = got[str(cid)]
        assert g["max_run_len"] == w["max_run_len"], cid
        assert g["n_loop_runs"] == w["n_loop_runs"], cid


def test_disordered_rows_counted_not_folded(spark, tmp_path):
    """A replayed turn_idx must surface in n_disordered and leave the
    verdict untouched."""
    import datetime

    base = datetime.datetime(2025, 1, 1)
    rows = [
        (0, 0, "tool", "search", base),
        (0, 1, "tool", "search", base),
        (0, 2, "tool", "search", base),
    ]
    schema = (
        "conv_id BIGINT, turn_idx INT, role STRING, tool STRING, ts TIMESTAMP_NTZ"
    )
    src = str(tmp_path / "src3")
    ckpt = str(tmp_path / "ckpt3")
    spark.createDataFrame(rows, schema).write.parquet(src)
    sink = []
    _run_stream(spark, src, sink, ckpt)
    # replay turn 1 (stale) plus a fresh turn 3 breaking the run
    spark.createDataFrame(
        [(0, 1, "tool", "search", base), (0, 3, "user", None, base)], schema
    ).write.mode("append").parquet(src)
    _run_stream(spark, src, sink, ckpt)

    last = max(sink, key=lambda r: r["n_disordered"])
    assert last["n_disordered"] == 1
    assert last["max_run_len"] == 3
    assert last["n_loop_runs"] == 1 and last["is_looping"]


def test_conversation_spanning_arrow_chunks(spark, tmp_path):
    """A single conversation whose trigger data spans multiple Arrow chunks
    must fold in turn order, not per-chunk (review finding: per-chunk
    sorting misread spanning conversations as disordered)."""
    import datetime

    base = datetime.datetime(2025, 1, 1)
    # 100 tool turns, alternating tools except a planted run of 4
    rows = []
    for i in range(100):
        tool = "search" if 40 <= i < 44 else ("python" if i % 2 else "browser")
        rows.append((0, i, "tool", tool, base))
    schema = (
        "conv_id BIGINT, turn_idx INT, role STRING, tool STRING, ts TIMESTAMP_NTZ"
    )
    src = str(tmp_path / "src4")
    # REVERSED on disk: with 8-row Arrow chunks the group iterator yields
    # descending turn ranges, so the old per-chunk fold would count ~92
    # rows as disordered; the concat-then-sort fold must see order
    rows.reverse()
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        sink = []
        _run_stream(spark, src, sink, str(tmp_path / "ckpt4"))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = _final_verdicts(sink)["0"]
    assert got["n_disordered"] == 0
    assert got["n_tool_turns"] == 100
    assert got["max_run_len"] == 4
    assert got["n_loop_runs"] == 1
