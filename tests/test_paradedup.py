"""Paragraph-level exact dedup (paradedup.q_dedup_paragraphs) — planted
cross-doc and within-doc duplicate paragraphs, keep-first ordering, the
short-paragraph exemption (which also routes hot keys around the shuffle),
byte-identical rebuild of untouched documents, and DuckDB value parity of
the standalone SQL (registry at the driver's 50-row cap).
"""

import os

import duckdb
import pytest

from tablestructurerec_spark.operators.paradedup import (
    _PARA_DEDUP_SQL,
    q_dedup_paragraphs,
)

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")

LONG_A = "this paragraph is long enough to dedup"
LONG_B = "a different long paragraph body here"
LONG_C = "yet another unique long paragraph text"


def _run(spark, tmp_path, texts, **kw):
    import pandas as pd

    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).to_parquet(
        str(tmp_path / "documents.parquet")
    )
    out = q_dedup_paragraphs(spark, str(tmp_path), **kw).collect()
    return {r["doc_id"]: r for r in out}


def test_cross_doc_keep_first(spark, tmp_path):
    got = _run(spark, tmp_path, [f"{LONG_A}\n\n{LONG_B}", f"{LONG_A}\n\n{LONG_C}"])
    assert got[0]["n_dropped"] == 0
    assert got[0]["clean_text"] == f"{LONG_A}\n\n{LONG_B}"
    assert got[1]["n_dropped"] == 1
    assert got[1]["clean_text"] == LONG_C


def test_within_doc_dup(spark, tmp_path):
    got = _run(spark, tmp_path, [f"{LONG_A}\n\n{LONG_A}\n\n{LONG_A}"])
    assert got[0]["n_paras"] == 3
    assert got[0]["n_dropped"] == 2
    assert got[0]["clean_text"] == LONG_A


def test_short_paragraphs_exempt(spark, tmp_path):
    got = _run(spark, tmp_path, ["hi\n\nhi", "hi\n\nhi"])
    for d in (0, 1):
        assert got[d]["n_dropped"] == 0
        assert got[d]["clean_text"] == "hi\n\nhi"


def test_untouched_doc_rebuilds_byte_identical(spark, tmp_path):
    texts = [f"{LONG_A}\n\n{LONG_B}", f"{LONG_C}\n\nshort\n\n{LONG_B} tail", ""]
    got = _run(spark, tmp_path, texts[:1] + texts[1:2] + [texts[2]])
    assert got[0]["clean_text"] == texts[0]
    assert got[1]["clean_text"] == texts[1]
    assert got[2]["clean_text"] == "" and got[2]["n_paras"] == 1


def test_all_paras_dropped(spark, tmp_path):
    got = _run(spark, tmp_path, [LONG_A, LONG_A])
    assert got[1]["n_dropped"] == 1
    assert got[1]["clean_text"] == ""


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata absent"
)
def test_duckdb_parity(spark):
    sdf = q_dedup_paragraphs(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    odf = con.execute(_PARA_DEDUP_SQL).df()
    assert len(sdf) == len(odf)
    for col in sdf.columns:
        assert sdf[col].tolist() == odf[col].tolist(), col


def test_shuffle_carries_only_candidates(spark, tmp_path):
    # exactly one Window node, partitioned on the paragraph text; the short
    # branch unions around it without touching that exchange
    import pandas as pd

    pd.DataFrame({"doc_id": [0, 1], "text": [LONG_A, f"x\n\n{LONG_A}"]}).to_parquet(
        str(tmp_path / "documents.parquet")
    )
    df = q_dedup_paragraphs(spark, str(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window [") == 1, plan
    assert "hashpartitioning(para" in plan, plan
    # Spark inserts WindowGroupLimit for the rn=1 filter: per-partition
    # top-1 pruning BEFORE the shuffle — keep that scale win pinned
    assert "WindowGroupLimit" in plan, plan
