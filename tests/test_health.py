"""Source health report (health.q_source_health) — planted per-signal
fixtures, single-scan/single-exchange plan pin, and DuckDB value parity
composing the degen/luhn/mojibake oracles (registry at the driver's 50-row
cap).
"""

import os

import duckdb

from tablestructurerec_spark.operators.health import (
    health_sql,
    q_source_health,
    source_health,
)

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")


def _write(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(rows).to_parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_planted_signals(spark, tmp_path):
    rows = [
        {"doc_id": 0, "text": "clean text body here", "source": "good"},
        {"doc_id": 1, "text": "also perfectly fine prose", "source": "good"},
        {"doc_id": 2, "text": "loop loop loop loop loop end", "source": "bad"},
        {"doc_id": 3, "text": "card 4111 1111 1111 1111 leaked", "source": "bad"},
        {"doc_id": 4, "text": "damaged ��� text", "source": "bad"},
        {"doc_id": 5, "text": "one okay doc", "source": "bad"},
    ]
    d = _write(tmp_path, rows)
    got = {r["source"]: r for r in q_source_health(spark, d).collect()}
    assert got["good"]["n_degenerate"] == 0
    assert got["good"]["n_cc_docs"] == 0
    assert got["good"]["n_damaged"] == 0
    assert got["bad"]["n_docs"] == 4
    assert got["bad"]["n_degenerate"] == 1
    assert got["bad"]["n_cc_docs"] == 1
    assert got["bad"]["n_damaged"] == 1
    assert got["bad"]["degen_ppm"] == 250_000


def test_single_scan_single_exchange(spark, tmp_path):
    rows = [{"doc_id": i, "text": f"doc {i} text", "source": "s"} for i in range(20)]
    d = _write(tmp_path, rows)
    out = source_health(spark.read.parquet(d + "/documents.parquet"))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    runtime = plan.split("== Initial Plan ==")[0]
    assert runtime.count("Scan parquet") == 1
    assert runtime.count("Exchange hashpartitioning") == 1


def test_duckdb_parity_planted(spark, tmp_path):
    # Review finding: the sf fixture has zero positive signals, so parity
    # there never exercises the composed oracle's positive paths (join
    # alignment, coalesce polarity).  This fixture fires every signal.
    rows = [
        {"doc_id": 0, "text": "clean text body here", "source": "good"},
        {"doc_id": 1, "text": "also perfectly fine prose", "source": "good"},
        {"doc_id": 2, "text": "loop loop loop loop loop end", "source": "bad"},
        {"doc_id": 3, "text": "card 4111 1111 1111 1111 leaked", "source": "bad"},
        {"doc_id": 4, "text": "damaged ��� text", "source": "bad"},
        {"doc_id": 5, "text": "one okay doc", "source": "bad"},
        {"doc_id": 6, "text": "ping pong ping pong ping pong ping pong ping "
                              "pong and 378282246310005 too", "source": "mixed"},
    ]
    d = _write(tmp_path, rows)
    got = [
        tuple(r)
        for r in q_source_health(spark, d).toPandas().itertuples(index=False)
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    want = [tuple(r) for r in con.execute(health_sql()).fetchall()]
    assert got == want
    by_src = {r[0]: r for r in got}
    assert by_src["bad"][2] == 1 and by_src["bad"][3] == 1 and by_src["bad"][4] == 1
    assert by_src["mixed"][2] == 1 and by_src["mixed"][3] == 1  # degen + cc


def test_duckdb_parity_sf(spark):
    got = [
        tuple(r)
        for r in q_source_health(spark, SF_DIR).toPandas().itertuples(index=False)
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(health_sql()).fetchall()]
    assert got == want
    assert len(got) > 0
