"""Unicode normalization (normalize.q_normalize_text) — planted-character
pins for each cleanup rule, NFC-composition behaviour (the dedup-fragmentation
motivation: two encodings of the same glyph must converge to one norm_md5),
idempotence, and DuckDB value parity of the standalone SQL (two independent
NFC implementations — Python ``unicodedata`` vs DuckDB ``nfc_normalize`` —
must agree on every document).
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from tablestructurerec_spark.operators.normalize import (
    _NORMALIZE_SQL,
    _cleaned,
    _nfc,
    q_normalize_text,
)

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")


def _clean(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    out = df.select("id", _cleaned(F.col("text")).alias("c")).orderBy("id").collect()
    return [r["c"] for r in out]


def test_control_chars_stripped(spark):
    # C0 controls and DEL go; \n and \t survive the control pass
    got = _clean(spark, ["a\x00b\x01c\x7fd", "keep\nline\ttab"])
    assert got[0] == "abcd"
    assert got[1] == "keep\nline tab"  # tab then collapsed by the ws pass


def test_zero_widths_and_bom_stripped(spark):
    got = _clean(spark, ["a​b‌c‍d﻿e"])
    assert got == ["abcde"]


def test_whitespace_runs_collapse(spark):
    got = _clean(spark, ["a  \t  b", "line   \nnext"])
    assert got == ["a b", "line\nnext"]


def test_blank_runs_capped_and_trim(spark):
    got = _clean(spark, ["  para1\n\n\n\n\npara2  "])
    assert got == ["para1\n\npara2"]


def test_nfc_composes_and_md5_converges(spark):
    # decomposed e + COMBINING ACUTE vs precomposed U+00E9: same norm_md5
    decomposed = "café"
    precomposed = "café"
    df = spark.createDataFrame(
        [(0, decomposed), (1, precomposed)], "id int, t string"
    )
    out = (
        df.select("id", _nfc(F.col("t")).alias("n"), F.md5(_nfc(F.col("t"))).alias("h"))
        .orderBy("id")
        .collect()
    )
    assert out[0]["n"] == precomposed == out[1]["n"]
    assert out[0]["h"] == out[1]["h"]


def test_cleanup_idempotent(spark):
    dirty = "  a\x00  b​\n\n\n\nc\t\td  "
    once = _clean(spark, [dirty])[0]
    twice = _clean(spark, [once])[0]
    assert once == twice


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata absent"
)
def test_duckdb_parity(spark):
    sdf = q_normalize_text(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    odf = con.execute(_NORMALIZE_SQL).df()
    assert len(sdf) == len(odf)
    for col in sdf.columns:
        assert sdf[col].tolist() == odf[col].tolist(), col


def test_map_only_plan(spark, tmp_path):
    # zero Exchange before the presentation orderBy: build the frame without
    # the trailing sort and assert the physical plan has no shuffle
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["a  b", "ć"]})
    p = str(tmp_path / "documents.parquet")
    pdf.to_parquet(p)
    from tablestructurerec_spark.sources.read import read_table

    docs = read_table(spark, str(tmp_path), "documents")
    staged = docs.select("doc_id", _cleaned(F.col("text")).alias("clean_text"))
    nfc = staged.select("doc_id", _nfc("clean_text").alias("n"))
    plan = nfc._jdf.queryExecution().executedPlan().toString()
    # read_table round-robins tiny local inputs (REPARTITION_BY_NUM); the
    # operator itself must add no key-based shuffle on top of the scan
    import re

    key_exchanges = [
        l for l in plan.splitlines()
        if "Exchange" in l and "RoundRobinPartitioning" not in l
    ]
    assert not key_exchanges, plan
    assert len(re.findall(r"Exchange", plan)) <= 1, plan
