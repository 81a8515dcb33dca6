"""Cluster durability profile: checkpoint dir wiring → reliable checkpoint.

dedup_components defaults to localCheckpoint (fast, executor-loss-fragile)
locally and MUST flip to durable checkpoint() when the session carries a
checkpoint dir — the launcher (scripts/submit.sh → SPARK_GRAFT_CKPT_DIR →
run_extract --checkpoint-dir) sets one on every cluster run.
"""

import os
import re


def test_has_reliable_checkpoint_follows_checkpoint_dir(spark, tmp_path):
    from tablestructurerec_spark.session import has_reliable_checkpoint

    sc = spark.sparkContext
    assert not has_reliable_checkpoint(spark)
    try:
        sc.setCheckpointDir(str(tmp_path / "ckpt"))
        assert has_reliable_checkpoint(spark)
    finally:
        # scala has no un-set; point at a throwaway local dir and accept the
        # session now reports reliable — so this test must run the negative
        # branch FIRST (it does), and other tests must not rely on the
        # checkpoint dir being unset (none do: the spark fixture never sets
        # one, and auto mode is exercised explicitly here)
        pass


def test_components_auto_mode_uses_checkpoint_dir(spark, tmp_path, monkeypatch):
    """With a checkpoint dir configured, auto mode writes durable checkpoint
    files under it during q_dedup_components."""
    sf_dir = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        import pytest

        pytest.skip("testdata absent")
    from tablestructurerec_spark.operators.dedup import q_dedup_components

    ckpt = tmp_path / "ckpt-auto"
    spark.sparkContext.setCheckpointDir(str(ckpt))
    out = q_dedup_components(spark, sf_dir)  # reliable_checkpoint=None → auto
    n = out.count()
    assert n > 0
    rdd_dirs = [p for p in ckpt.rglob("rdd-*") if p.is_dir()]
    assert rdd_dirs, "auto mode did not write durable checkpoints"


def test_launcher_wires_checkpoint_dir():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    submit = open(os.path.join(root, "scripts", "submit.sh")).read()
    assert "SPARK_GRAFT_CKPT_DIR" in submit
    runner = open(os.path.join(root, "scripts", "run_extract.py")).read()
    assert "setCheckpointDir" in runner
    assert re.search(r"SPARK_GRAFT_CKPT_DIR", runner)
