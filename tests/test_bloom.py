"""Bloom-filter dedup prefilter (operators/bloom.py).

Pins: value-exact DuckDB parity (the operator is unregistered — the driver
registry sits at its 50-row cap — so this test IS its oracle gate), the
zero-false-negative composition contract against the REAL
``q_dedup_incremental`` output, the pruning yield at production-ish
params, and saturation behavior at a deliberately undersized filter
(false positives appear, false negatives still cannot).
"""

import os

import duckdb
import pytest

from tablestructurerec_spark.operators.bloom import (
    _BLOOM_SQL,
    bloom_sql,
    q_dedup_bloom_prefilter,
)

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata absent"
)


def _parity(spark, sf_dir, m_bits=None, k=None):
    kwargs = {}
    if m_bits is not None:
        kwargs = {"m_bits": m_bits, "k": k}
        sql = bloom_sql(m_bits, k)
    else:
        sql = _BLOOM_SQL
    sdf = q_dedup_bloom_prefilter(spark, sf_dir, **kwargs).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    odf = con.execute(sql).df()
    assert len(sdf) == len(odf)
    assert list(sdf.columns) == list(odf.columns)
    for col in sdf.columns:
        assert sdf[col].tolist() == odf[col].tolist(), col
    return sdf


def test_duckdb_parity_and_no_false_negatives(spark):
    sdf = _parity(spark, SF_DIR)
    # a Bloom filter can never miss: ground-truth matches are all candidates
    assert (~sdf["has_match"] | sdf["candidate"]).all()
    # and the prune is real: a majority of the novel batch skips the join
    assert (~sdf["candidate"]).sum() > len(sdf) / 2


def test_candidates_cover_incremental_output(spark):
    # composition contract: the docs q_dedup_incremental reports must all
    # survive the prefilter — pruning is sound, not just statistically ok
    from tablestructurerec_spark.operators.dedup import q_dedup_incremental

    pre = q_dedup_bloom_prefilter(spark, SF_DIR).toPandas()
    inc = q_dedup_incremental(spark, SF_DIR).toPandas()
    candidates = set(pre.loc[pre["candidate"], "doc_id"])
    assert set(inc["new_doc"]) <= candidates
    # has_match IS the incremental ground truth
    assert set(pre.loc[pre["has_match"], "doc_id"]) == set(inc["new_doc"])


def test_undersized_filter_saturates_but_never_misses(spark):
    # 64 bits for ~200 index keys: the filter saturates, false positives
    # flood in — but has_match → candidate must still hold exactly
    sdf = _parity(spark, SF_DIR, m_bits=64, k=2)
    assert (~sdf["has_match"] | sdf["candidate"]).all()
    fp = (sdf["candidate"] & ~sdf["has_match"]).sum()
    assert fp > 0  # the knob genuinely trades precision, not correctness


def test_filter_is_relational_and_join_is_equi(spark):
    df = q_dedup_bloom_prefilter(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # membership is a plain equi-join on block — no nested-loop, no
    # driver-side bitmap collect
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
