"""Vocabulary-factored BPE counting (bpe_factored) — the load-bearing pin
is exact equality with the direct per-document encoder on shared columns
(the factoring theorem: merges never cross the space separator, so token
count decomposes over word types).  Plus DuckDB value parity, zero-word
edge, and a plan check that the merge chain runs on the distinct-word
frame, not the document scan.
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from tablestructurerec_spark.operators.bpe import q_token_count_bpe
from tablestructurerec_spark.operators.bpe_factored import (
    _TOKEN_COUNT_BPE_FACTORED_SQL,
    q_token_count_bpe_factored,
)

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")
SHARED = ["doc_id", "n_words", "n_bpe_tokens", "bpe_per_word"]


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata absent"
)
def test_equals_direct_encoder(spark):
    direct = q_token_count_bpe(spark, SF_DIR).select(SHARED).toPandas()
    factored = q_token_count_bpe_factored(spark, SF_DIR).toPandas()
    assert list(factored.columns) == SHARED
    for col in SHARED:
        assert direct[col].tolist() == factored[col].tolist(), col


def test_equals_direct_on_planted(spark, tmp_path):
    import pandas as pd

    texts = [
        "the thin thing is in the then",  # heavy type reuse
        "UPPER lower 1900 2000 --- punct!!",  # normalization + digits
        "",  # zero words
        "   \n\t  ",  # whitespace only
        "tokenization of the tokenization of the tokenization",
    ]
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).to_parquet(
        str(tmp_path / "documents.parquet")
    )
    direct = q_token_count_bpe(spark, str(tmp_path)).select(SHARED).toPandas()
    factored = q_token_count_bpe_factored(spark, str(tmp_path)).toPandas()
    for col in SHARED:
        assert direct[col].tolist() == factored[col].tolist(), col
    assert factored["n_words"][2] == 0 and factored["bpe_per_word"][2] == 0.0


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata absent"
)
def test_duckdb_parity(spark):
    sdf = q_token_count_bpe_factored(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    odf = con.execute(_TOKEN_COUNT_BPE_FACTORED_SQL).df()
    assert len(sdf) == len(odf)
    for col in sdf.columns:
        assert sdf[col].tolist() == odf[col].tolist(), col


def test_encode_chain_runs_after_distinct(spark, tmp_path):
    # the \x02/\x03 marker regexps must appear BELOW (after) the vocab
    # aggregate in the optimized plan — i.e. the chain consumes `word`,
    # never the raw `text` column
    import pandas as pd

    pd.DataFrame({"doc_id": [0], "text": ["the thing"]}).to_parquet(
        str(tmp_path / "documents.parquet")
    )
    df = q_token_count_bpe_factored(spark, str(tmp_path))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "\x02" in line or "\\x02" in line:
            assert "text" not in line, line
