"""Per-source data card (datacard.q_data_card) — hand-computed planted
sources (volume, median, language mix, duplicate rate), dup-free source
yields rate 0, and DuckDB value parity of the standalone SQL (registry at
the driver's 50-row cap).
"""

import os

import duckdb
import pytest

from tablestructurerec_spark.operators.datacard import _DATACARD_SQL, q_data_card

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")


def _write(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(rows).to_parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_planted_card(spark, tmp_path):
    rows = [
        # source A: 4 docs, one exact dup pair, 3 en / 1 fr
        {"doc_id": 0, "text": "one two three", "lang": "en", "source": "A"},
        {"doc_id": 1, "text": "one two three", "lang": "en", "source": "A"},
        {"doc_id": 2, "text": "four five", "lang": "en", "source": "A"},
        {"doc_id": 3, "text": "six", "lang": "fr", "source": "A"},
        # source B: 2 distinct docs, all de
        {"doc_id": 4, "text": "sieben acht", "lang": "de", "source": "B"},
        {"doc_id": 5, "text": "neun", "lang": "de", "source": "B"},
    ]
    d = _write(tmp_path, rows)
    got = {r["source"]: r for r in q_data_card(spark, d).collect()}

    a = got["A"]
    assert a["n_docs"] == 4
    assert a["total_tokens"] == 3 + 3 + 2 + 1
    assert a["median_tokens"] == 2.5  # type-7 median of [1,2,3,3]
    assert a["en_share"] == 0.75
    assert a["n_langs"] == 2
    assert a["exact_dup_rate"] == 0.25  # one removable row of four

    b = got["B"]
    assert b["exact_dup_rate"] == 0.0
    assert b["en_share"] == 0.0
    assert b["n_langs"] == 1


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata absent"
)
def test_duckdb_parity(spark):
    sdf = q_data_card(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    odf = con.execute(_DATACARD_SQL).df()
    assert len(sdf) == len(odf)
    for col in sdf.columns:
        assert sdf[col].tolist() == odf[col].tolist(), col
