"""Stateless streaming quality scorer (streaming/quality_stream.py).

Pins: the streamed scores are IDENTICAL to the batch distilled scorer
(same integer log-ratio sums), the streaming query runs with zero stateful
operators, and the collected model round-trips densified (all buckets
present, so no token can fall through the map lookup).
"""

import os

import pytest

from tablestructurerec_spark.operators.distill import (
    _NB_BUCKETS,
    nb_model,
    q_quality_distill,
)
from tablestructurerec_spark.streaming.quality_stream import stream_quality_assign

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata absent"
)


def test_model_is_densified(spark):
    ratio, prior = nb_model(spark, SF_DIR)
    assert len(ratio) == _NB_BUCKETS
    assert isinstance(prior, int)


def test_stream_scores_equal_batch(spark, tmp_path):
    ratio, prior = nb_model(spark, SF_DIR)
    batch = q_quality_distill(spark, SF_DIR).toPandas()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src_dir = str(tmp_path / "docs_stream_src")
    docs.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(docs.schema).parquet(src_dir)
    q = (
        stream_quality_assign(stream, ratio, prior)
        .writeStream.format("memory")
        .queryName("stream_quality")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from stream_quality")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = batch.sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    for col in want.columns:
        assert got[col].tolist() == want[col].tolist(), col


def test_scorer_works_on_batch_frames_too(spark):
    ratio, prior = nb_model(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = stream_quality_assign(docs, ratio, prior).orderBy("doc_id").toPandas()
    want = q_quality_distill(spark, SF_DIR).toPandas()
    for col in want.columns:
        assert got[col].tolist() == want[col].tolist(), col
