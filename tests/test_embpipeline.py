"""Fused embedding pipeline (operators/embpipeline.py) — planted-paraphrase
recovery through the full JL → banding → leakage chain, DuckDB value parity
at two thresholds, and the no-all-pairs plan shape.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from tablestructurerec_spark.operators.embpipeline import (
    COS_THRESH,
    emb_pipeline_sql,
    q_emb_pipeline,
)

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")


def _run_both(spark, sf_dir, thresh):
    got = q_emb_pipeline(spark, sf_dir, thresh=thresh).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = con.execute(emb_pipeline_sql(thresh)).fetchdf()
    cols = sorted(got.columns)
    return (
        [tuple(r) for r in got[cols].itertuples(index=False)],
        [tuple(r) for r in want[cols].itertuples(index=False)],
    )


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/embeddings.parquet"), reason="testdata absent"
)
def test_duckdb_parity_default_and_low_thresh(spark):
    # default thresh: the registered face; low thresh: forces the verdict
    # filter through a dense candidate set so parity is non-trivial even if
    # the default returns few rows at some sf
    for thresh in (COS_THRESH, 0.0):
        got, want = _run_both(spark, SF_DIR, thresh)
        assert got == want
        assert len(got) > 0


def test_planted_paraphrase_recovered_through_projection(spark, tmp_path):
    # A train/eval twin pair (same direction, tiny noise) must survive the
    # JL projection AND the banding AND the threshold; orthogonal vectors
    # must not pair with it.  Split labels are hash-derived from vec_id, so
    # first find a train id and an eval id among 0..39.
    from tablestructurerec_spark.operators.sampling import split_label_col
    from pyspark.sql import functions as F

    labels = {
        r["id"]: r["s"]
        for r in spark.range(40)
        .select("id", split_label_col(F.col("id")).alias("s"))
        .collect()
    }
    train_id = next(i for i in sorted(labels) if labels[i] == "train")
    eval_id = next(i for i in sorted(labels) if labels[i] != "train")

    rng = np.random.RandomState(11)
    base = rng.randn(64)
    base /= np.linalg.norm(base)
    vecs = {}
    for i in sorted(labels):
        v = rng.randn(64)
        vecs[i] = (v / np.linalg.norm(v)).astype("float32")
    vecs[train_id] = base.astype("float32")
    vecs[eval_id] = (base + rng.randn(64) * 0.01).astype("float32")
    pd.DataFrame(
        {
            "vec_id": sorted(labels),
            "embedding": [vecs[i].tolist() for i in sorted(labels)],
            "label": ["x"] * len(labels),
        }
    ).to_parquet(str(tmp_path / "embeddings.parquet"))

    out = q_emb_pipeline(spark, str(tmp_path)).toPandas()
    pairs = {
        (r.train_vec_id, r.eval_vec_id): r.cos for r in out.itertuples(index=False)
    }
    assert (train_id, eval_id) in pairs
    assert pairs[(train_id, eval_id)] > 0.99
    # and it cross-checks against the oracle on the planted corpus too
    got, want = _run_both(spark, str(tmp_path), COS_THRESH)
    assert got == want


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/embeddings.parquet"), reason="testdata absent"
)
def test_no_all_pairs_plan(spark):
    out = q_emb_pipeline(spark, SF_DIR)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the pair join must ride the bucket equi key — never a cross product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
