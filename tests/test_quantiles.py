"""Exact histogram-refinement quantiles (quantiles.q_exact_quantiles) —
value parity vs the naive sort-based DuckDB oracle, python ground truth on
skewed/tied synthetic data, pass-count bound, tie-collapse early exit, and
broadcast plan shape of the per-pass count frame.
"""

import os
import random

import duckdb

from tablestructurerec_spark.operators.quantiles import (
    N_BUCKETS,
    PROBS,
    exact_quantiles_with_stats,
    q_exact_quantiles,
    quantiles_sql,
)

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")


def _write(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(rows).to_parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _truth(lengths, num, den):
    s = sorted(lengths)
    k = max(1, (num * len(s) + den - 1) // den)
    return s[k - 1]


def test_ground_truth_skewed_with_ties(spark, tmp_path):
    # Heavy tie mass (half the docs share one length) + a long Zipfy tail:
    # the exact answer must match a plain python sort at every prob.
    rng = random.Random(5)
    lengths = [120] * 500 + [int(10 / rng.random()) for _ in range(500)]
    rows = [
        {"doc_id": i, "text": "x" * n, "source": "s"}
        for i, n in enumerate(lengths)
    ]
    d = _write(tmp_path, rows)
    got = {r["p"]: r for r in q_exact_quantiles(spark, d).collect()}
    for num, den, label in PROBS:
        assert got[label]["value"] == _truth(lengths, num, den), label
        assert got[label]["n_docs"] == 1000


def test_pass_count_bound(spark, tmp_path):
    # Range fits in one bucket split twice: ceil(log_256(range)) passes.
    rng = random.Random(9)
    rows = [
        {"doc_id": i, "text": "x" * rng.randrange(1, 70_000), "source": "s"}
        for i in range(400)
    ]
    d = _write(tmp_path, rows)
    docs = spark.read.parquet(d + "/documents.parquet")
    res, n_passes = exact_quantiles_with_stats(spark, docs)
    res.collect()
    # value range < 256^2 = 65536 + slack: at most 3 passes (width rounding
    # can cost one extra), never the row-count-dependent naive behavior.
    assert n_passes <= 3


def test_all_equal_answers_in_zero_passes(spark, tmp_path):
    rows = [{"doc_id": i, "text": "abc", "source": "s"} for i in range(50)]
    d = _write(tmp_path, rows)
    docs = spark.read.parquet(d + "/documents.parquet")
    res, n_passes = exact_quantiles_with_stats(spark, docs)
    assert n_passes == 0
    assert all(r["value"] == 3 for r in res.collect())


def test_per_pass_plan_broadcasts_targets(spark, tmp_path):
    # The per-pass count frame must broadcast the tiny target table — the
    # big side never shuffles rows, only <= |targets| * N_BUCKETS partials.
    from pyspark.sql import functions as F

    rows = [{"doc_id": i, "text": "x" * (i + 1), "source": "s"} for i in range(300)]
    d = _write(tmp_path, rows)
    vals = spark.read.parquet(d + "/documents.parquet").select(
        "source", F.length("text").cast("long").alias("v")
    )
    tdf = spark.createDataFrame(
        [(0, "s", 1, 300, 2)], "tid INT, source STRING, lo BIGINT, hi BIGINT, width BIGINT"
    )
    frame = (
        vals.join(F.broadcast(tdf), "source")
        .where((F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")))
        .groupBy("tid", F.expr("(v - lo) DIV width").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    frame.collect()
    plan = frame._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_null_values_and_null_keys_excluded(spark, tmp_path):
    # Review finding: NULL text counted in n but absent from the histogram
    # made the loop emit the MINIMUM; NULL source keys crashed the driver.
    rows = [
        {"doc_id": i, "text": "x" * (i + 1), "source": "s"} for i in range(9)
    ]
    rows.append({"doc_id": 9, "text": None, "source": "s"})
    rows.append({"doc_id": 10, "text": "zzz", "source": None})
    d = _write(tmp_path, rows)
    got = {r["p"]: r for r in q_exact_quantiles(spark, d).collect()}
    # only the 9 non-null 's' rows count: lengths 1..9
    assert got["p99"]["value"] == 9
    assert got["p50"]["value"] == 5
    assert got["p50"]["n_docs"] == 9
    assert len(got) == 3  # the null-source group is dropped, not crashed


def test_duckdb_parity(spark):
    got = [
        tuple(r)
        for r in q_exact_quantiles(spark, SF_DIR).toPandas().itertuples(index=False)
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(quantiles_sql()).fetchall()]
    assert got == want
    assert len(got) >= 3 * 1  # at least one source x |PROBS|


def test_multi_source_parity_random(spark, tmp_path):
    rng = random.Random(21)
    rows = []
    for src in ["a", "b", "c"]:
        for i in range(rng.randrange(40, 160)):
            rows.append(
                {
                    "doc_id": len(rows),
                    "text": "y" * rng.randrange(1, 5000),
                    "source": src,
                }
            )
    d = _write(tmp_path, rows)
    got = [
        tuple(r)
        for r in q_exact_quantiles(spark, d).toPandas().itertuples(index=False)
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    want = [tuple(r) for r in con.execute(quantiles_sql()).fetchall()]
    assert got == want
