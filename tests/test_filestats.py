"""Input-file balance audit (operators/filestats.py) — DuckDB parity on a
deterministic multi-file directory and on the single-file bench table,
plus the one-scan plan shape.
"""

import os

import duckdb

from tablestructurerec_spark.operators.filestats import (
    TARGET_ROWS_PER_TASK,
    file_balance_audit,
    file_balance_sql,
    q_file_balance,
)

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")


def _oracle(path):
    return [tuple(r) for r in duckdb.connect().execute(file_balance_sql(path)).fetchall()]


def test_multi_file_parity_and_shares(spark, tmp_path):
    src = str(tmp_path / "multi")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(4, "doc_id").write.parquet(src)
    got = [
        tuple(r)
        for r in file_balance_audit(spark, src).toPandas().itertuples(index=False)
    ]
    want = _oracle(src)
    assert got == want
    assert len(got) == 4
    # shares sum to ~1e6 (integer DIV truncation loses at most n_files-1 ppm)
    total_ppm = sum(r[2] for r in got)
    assert 1_000_000 - len(got) < total_ppm <= 1_000_000
    assert all(r[3] == 1 for r in got)  # 500 rows never spans a task chunk


def test_single_file_table(spark):
    got = [
        tuple(r)
        for r in q_file_balance(spark, SF_DIR).toPandas().itertuples(index=False)
    ]
    want = _oracle(f"{SF_DIR}/documents.parquet")
    assert got == want
    assert len(got) == 1
    assert got[0][2] == 1_000_000  # one file holds the whole corpus


def test_split_factor_flags_oversized(spark, tmp_path):
    src = str(tmp_path / "fat")
    spark.range(TARGET_ROWS_PER_TASK + 1).coalesce(1).write.parquet(src)
    got = file_balance_audit(spark, src).collect()
    assert len(got) == 1 and got[0]["split_factor"] == 2


def test_one_scan_no_join_exchange(spark):
    out = q_file_balance(spark, SF_DIR)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    runtime = plan.split("== Initial Plan ==")[0]
    # the scan is column-pruned to NOTHING (footer row counts only), the
    # totals side REUSES the per-file exchange instead of rescanning, and
    # the totals join is a broadcast — one scan, one hash exchange total
    assert "ReadSchema: struct<>" in runtime
    assert runtime.count("FileScan parquet") == 1
    assert "ReusedExchange" in runtime
    assert "SortMergeJoin" not in runtime


def test_special_character_paths_match_duckdb(spark, tmp_path):
    """input_file_name() is percent-encoded; the operator must decode it so
    the basename contract holds for paths with spaces (review finding)."""
    src = str(tmp_path / "dir with space")
    spark.range(10).coalesce(1).write.parquet(src)
    got = [
        tuple(r)
        for r in file_balance_audit(spark, src).toPandas().itertuples(index=False)
    ]
    want = _oracle(src)
    assert got == want and len(got) == 1
    assert "%20" not in got[0][0]


def test_plus_in_basename_not_form_decoded(spark, tmp_path):
    """ADVICE r4: url_decode is FORM decoding ('+' -> space), but a literal
    '+' in a path is not percent-encoded in the URI — the operator must
    percent-decode only, so a file literally named 'a+b 1.parquet' reports
    that exact basename on both engines (the '+' and the space together pin
    that %20 still decodes while '+' survives)."""
    import pandas as pd

    src = str(tmp_path / "mixed")
    os.makedirs(src)
    pd.DataFrame({"x": range(7)}).to_parquet(os.path.join(src, "a+b 1.parquet"))
    pd.DataFrame({"x": range(3)}).to_parquet(os.path.join(src, "plain.parquet"))
    got = [
        tuple(r)
        for r in file_balance_audit(spark, src).toPandas().itertuples(index=False)
    ]
    want = _oracle(src)
    assert got == want and len(got) == 2
    assert got[0][0] == "a+b 1.parquet"
