"""Streaming audit twins (streaming/audit_stream.py) — each face must equal
its batch operator byte-for-byte through a real readStream → writeStream
run (availableNow trigger, memory sink), reusing the batch expressions so
the assertion is meaningful end-to-end, not a tautology on shared frames.
"""

import os

import pytest

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata absent"
)


def _stream_from(spark, tmp_path, table):
    df = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
    src = str(tmp_path / f"{table}_stream_src")
    df.write.mode("overwrite").parquet(src)
    return spark.readStream.schema(df.schema).parquet(src)


def _run(stream_out, name, mode):
    q = (
        stream_out.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_encoding_damage_equals_batch(spark, tmp_path):
    from tablestructurerec_spark.operators.mojibake import q_encoding_damage
    from tablestructurerec_spark.streaming.audit_stream import (
        stream_encoding_damage,
    )

    _run(
        stream_encoding_damage(_stream_from(spark, tmp_path, "documents")),
        "s_mojibake",
        "append",
    )
    got = (
        spark.sql("select * from s_mojibake")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = q_encoding_damage(spark, SF_DIR).toPandas().reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    for col in want.columns:
        assert got[col].tolist() == want[col].tolist(), col


def test_stream_health_report_equals_batch(spark, tmp_path):
    from tablestructurerec_spark.operators.health import q_source_health
    from tablestructurerec_spark.streaming.audit_stream import (
        stream_health_report,
    )

    _run(
        stream_health_report(_stream_from(spark, tmp_path, "documents")),
        "s_health",
        "complete",
    )
    got = (
        spark.sql("select * from s_health")
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    want = q_source_health(spark, SF_DIR).toPandas().reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    for col in want.columns:
        assert got[col].tolist() == want[col].tolist(), col


def test_stream_ingest_counts_feed_batch_drift(spark, tmp_path):
    from tablestructurerec_spark.operators.drift import (
        drift_from_counts,
        q_distribution_drift,
    )
    from tablestructurerec_spark.streaming.audit_stream import (
        stream_ingest_counts,
    )

    _run(
        stream_ingest_counts(
            _stream_from(spark, tmp_path, "events"), "event_type"
        ),
        "s_counts",
        "complete",
    )
    # the per-trigger driver step: pair days over the TINY streamed counts
    counts = spark.sql("select * from s_counts")
    got = (
        drift_from_counts(spark, counts)
        .toPandas()
        .sort_values("day_from")
        .reset_index(drop=True)
    )
    want = (
        q_distribution_drift(spark, SF_DIR).toPandas().reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    for col in want.columns:
        assert got[col].tolist() == want[col].tolist(), col
