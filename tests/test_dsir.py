"""DSIR importance-resampling weights (sampling.q_dsir_weights).

Pins: hash-exact DuckDB parity (the operator is unregistered — the driver
registry sits at its 50-row cap — so this test IS its oracle gate), the
semantic contract (target-vocabulary docs weigh above off-target docs,
regardless of their own lang label), empty-doc inclusion, and the plan
shape (bounded ratio table broadcast, corpus side never broadcast).
"""

import os

import duckdb
import pandas as pd
import pytest

from tablestructurerec_spark.operators.sampling import _DSIR_SQL, q_dsir_weights

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata absent"
)
def test_duckdb_parity(spark):
    sdf = q_dsir_weights(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    odf = con.execute(_DSIR_SQL).df()
    assert len(sdf) == len(odf)
    for col in sdf.columns:
        assert sdf[col].tolist() == odf[col].tolist(), col


def test_target_vocab_scores_above_off_target(spark, tmp_path):
    # target slice (lang=en) speaks "alpha beta gamma"; the raw corpus also
    # contains a "zeta eta theta" dialect.  Two UNLABELED (lang=xx) probes:
    # one in target vocabulary, one off-target — DSIR must rank the
    # target-vocabulary probe strictly higher and mark only it keep_target.
    rows = []
    for i in range(20):
        rows.append((i, "alpha beta gamma alpha beta", "en", "s", 0))
    for i in range(20, 40):
        rows.append((i, "zeta eta theta zeta eta", "fr", "s", 0))
    rows.append((100, "alpha beta gamma alpha beta", "xx", "s", 0))
    rows.append((101, "zeta eta theta zeta eta", "xx", "s", 0))
    # same unigram vocab as target but scrambled word ORDER: its novel
    # bigrams hash to low-evidence buckets, so smoothing pulls it between
    # the two pure probes — ranking must still hold
    rows.append((102, "alpha beta gamma beta alpha gamma", "xx", "s", 0))
    out = (
        q_dsir_weights(spark, _write_docs(tmp_path, rows))
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[100, "logw"] > out.loc[102, "logw"] > out.loc[101, "logw"]
    assert bool(out.loc[100, "keep_target"])
    assert not bool(out.loc[101, "keep_target"])


def test_empty_doc_included_with_zero_weight(spark, tmp_path):
    rows = [
        (0, "alpha beta gamma", "en", "s", 0),
        (1, "", "fr", "s", 0),
        (2, "...", "fr", "s", 0),  # no alnum tokens either
    ]
    out = (
        q_dsir_weights(spark, _write_docs(tmp_path, rows))
        .toPandas()
        .set_index("doc_id")
    )
    assert len(out) == 3
    for d in (1, 2):
        assert int(out.loc[d, "n_feats"]) == 0
        assert float(out.loc[d, "logw"]) == 0.0
        assert not bool(out.loc[d, "keep_target"])


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata absent"
)
def test_ratio_table_is_the_broadcast_side(spark):
    plan = (
        q_dsir_weights(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    # the per-doc scoring join must broadcast the bounded bucket-ratio side;
    # nothing corpus-sized (text / feature rows) may sit under a broadcast
    # exchange on the scoring path.  The final include-empty-docs join over
    # (doc_id) keys is AQE's to decide.
    import re

    for m in re.finditer(r"BroadcastExchange[^\n]*", plan):
        assert "text" not in m.group(0), m.group(0)
