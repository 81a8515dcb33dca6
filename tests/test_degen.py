"""Degenerate-loop detection (degen.q_degen_loops) — hand-built loop
fixtures, map-only plan pin (no exchange), and DuckDB value parity of the
standalone SQL vs the naive islands oracle (registry at the driver's
50-row cap).
"""

import os
import random

import duckdb

from tablestructurerec_spark.operators.degen import (
    degen_loops,
    degen_sql,
    q_degen_loops,
)

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")


def _write(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(rows).to_parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_loop_fixtures(spark, tmp_path):
    rows = [
        {"doc_id": 0, "text": "normal text with no repeats at all", "source": "s"},
        {"doc_id": 1, "text": "the the the the the end", "source": "s"},  # run 5
        {"doc_id": 2, "text": "start yes no yes no yes no yes no yes no", "source": "s"},
        {"doc_id": 3, "text": "one", "source": "s"},
        {"doc_id": 4, "text": "a a b b a a", "source": "s"},  # short runs only
    ]
    d = _write(tmp_path, rows)
    got = {r["doc_id"]: r for r in q_degen_loops(spark, d).collect()}
    assert got[0]["max_run"] == 1 and not got[0]["is_degenerate"]
    assert got[1]["max_run"] == 5 and got[1]["is_degenerate"]
    # doc 2: yes/no alternation of 10 tokens → 8 positions satisfy t[i]=t[i-2]
    assert got[2]["max_cycle2"] == 8 and got[2]["is_degenerate"]
    assert got[3]["n_tok"] == 1 and got[3]["max_run"] == 1
    assert got[4]["max_run"] == 2 and not got[4]["is_degenerate"]
    # "a a b b a a": t[i]=t[i-2] holds at positions 3 and 5..6? ground truth
    # from the oracle below keeps this pinned; here just the flag matters


def test_map_only_plan(spark, tmp_path):
    rows = [{"doc_id": i, "text": "x y z", "source": "s"} for i in range(10)]
    d = _write(tmp_path, rows)
    out = degen_loops(spark.read.parquet(d + "/documents.parquet"))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    runtime = plan.split("== Initial Plan ==")[0]
    # only the presentation orderBy's range exchange; no hash exchange, no
    # aggregation node — the folds run inside the row projection
    assert "Exchange hashpartitioning" not in runtime
    assert "Generate explode" not in runtime


def test_duckdb_parity_sf(spark):
    got = [
        tuple(r)
        for r in q_degen_loops(spark, SF_DIR).toPandas().itertuples(index=False)
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(degen_sql()).fetchall()]
    assert got == want
    assert len(got) > 0


def test_duckdb_parity_planted_loops(spark, tmp_path):
    rng = random.Random(17)
    vocab = ["alpha", "beta", "gamma", "delta"]
    rows = []
    for i in range(60):
        words = [vocab[rng.randrange(4)] for _ in range(40)]
        if i % 3 == 0:  # plant an immediate loop
            p = rng.randrange(0, 30)
            words[p:p + 7] = ["loop"] * 7
        if i % 5 == 0:  # plant a period-2 cycle
            p = rng.randrange(0, 20)
            words[p:p + 12] = ["ping", "pong"] * 6
        rows.append({"doc_id": i, "text": " ".join(words), "source": "s"})
    d = _write(tmp_path, rows)
    got = [
        tuple(r)
        for r in q_degen_loops(spark, d).toPandas().itertuples(index=False)
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    want = [tuple(r) for r in con.execute(degen_sql()).fetchall()]
    assert got == want
    assert any(r[4] for r in got) and any(not r[4] for r in got)
