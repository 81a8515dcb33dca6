"""C4 line-level cleaning (operators/c4.py).

Pins: value-exact DuckDB parity (the operator is unregistered — the driver
registry sits at its 50-row cap — so this test IS its oracle gate), each
C4 rule on planted multi-line pages (the sf corpus is single-line
word-soup, which exercises the plumbing but not the rules), and the
map-only plan claim (zero hash-partition exchanges; the only exchange is
the presentation sort).
"""

import os

import duckdb
import pandas as pd
import pytest

from tablestructurerec_spark.operators.c4 import _C4_SQL, q_c4_line_filter

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")


def _parity(spark, sf_dir):
    sdf = q_c4_line_filter(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    odf = con.execute(_C4_SQL).df()
    assert len(sdf) == len(odf)
    assert list(sdf.columns) == list(odf.columns)
    for col in sdf.columns:
        assert sdf[col].tolist() == odf[col].tolist(), col
    return sdf


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata absent"
)
def test_duckdb_parity_sf(spark):
    sdf = _parity(spark, SF_DIR)
    assert (sdf["n_kept"] <= sdf["n_lines"]).all()
    # dropped pages report counts but carry no text
    assert (sdf.loc[~sdf["kept"], "clean_text"] == "").all()


def _write_docs(tmp_path, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "s",
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


GOOD = "This line has five good words."


def test_each_rule_on_planted_pages(spark, tmp_path):
    pages = [
        # 0: clean page — every line survives
        "\n".join([GOOD] * 3),
        # 1: no terminal punctuation on one line
        "\n".join([GOOD, "this line has no terminal punctuation at all", GOOD, GOOD]),
        # 2: short line (4 words)
        "\n".join([GOOD, "only four words here.", GOOD, GOOD]),
        # 3: javascript mention kills the line, not the page
        "\n".join([GOOD, "Please enable JavaScript to continue viewing.", GOOD, GOOD]),
        # 4: lorem ipsum kills the whole page
        "\n".join([GOOD, "Lorem ipsum dolor sit amet consectetur.", GOOD]),
        # 5: curly brace kills the whole page
        "\n".join([GOOD, "if (x) { return y; } done now ok.", GOOD]),
        # 6: only 2 surviving lines -> page dropped
        "\n".join([GOOD, "short", GOOD]),
    ]
    sf = _write_docs(tmp_path, pages)
    pdf = q_c4_line_filter(spark, sf).toPandas().set_index("doc_id")

    assert pdf.loc[0, "kept"] and pdf.loc[0, "clean_text"] == pages[0]
    for i in (1, 2, 3):
        assert pdf.loc[i, "kept"]
        assert pdf.loc[i, "n_lines"] == 4 and pdf.loc[i, "n_kept"] == 3
        assert pdf.loc[i, "clean_text"] == "\n".join([GOOD] * 3)
    # page-level drops: line counts still reported, text suppressed
    for i in (4, 5, 6):
        assert not pdf.loc[i, "kept"]
        assert pdf.loc[i, "clean_text"] == ""
    assert pdf.loc[4, "n_kept"] == 3  # all lines pass; the PAGE rule drops it
    assert pdf.loc[6, "n_kept"] == 2

    # the planted fixture stays value-exact vs the oracle
    _parity(spark, sf)


def test_terminal_quote_variants_kept(spark, tmp_path):
    pages = [
        'He said the last word was "done."',
        "She replied that it truly was over”",
        "A question can also end a good line?",
        "An exclamation ends this line properly too!",
    ]
    sf = _write_docs(tmp_path, ["\n".join(pages)])
    pdf = q_c4_line_filter(spark, sf).toPandas()
    assert pdf["n_kept"].iloc[0] == 4 and pdf["kept"].iloc[0]
    _parity(spark, sf)


def test_transform_is_map_only(spark):
    # the only exchange is the presentation orderBy (range partitioning);
    # the cleaning itself never shuffles — the 100 TB claim in the module doc
    plan = q_c4_line_filter(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan
    # tolerated exchanges: read_spread's small-file round-robin fan-out
    # (a no-op at scale — see sources/read.py) and the presentation sort
    assert plan.count("Exchange") <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
