"""Polymorphic transcript source: format round-trips + schema contract."""

import pytest

from tablestructurerec_spark.plans.extract import extract_tables
from tablestructurerec_spark.sources.synthetic import synth_transcripts
from tablestructurerec_spark.sources.transcripts import (
    normalize_transcripts,
    read_transcripts,
)

CANON = "conv_id,turn_idx,role,text,tool,ts"


def test_normalize_orders_casts_and_fills(spark):
    df = spark.createDataFrame(
        [(1, "7", "hello <b>x</b>", "extra")],
        "turn_idx string, conv_id string, text string, junk string",
    )
    out = normalize_transcripts(df)
    assert ",".join(out.columns) == CANON
    row = out.collect()[0]
    assert row.conv_id == "7" and row.turn_idx == 1 and row.tool is None
    assert dict(out.dtypes)["turn_idx"] == "int"
    assert dict(out.dtypes)["ts"] == "timestamp"


def test_normalize_rejects_missing_required(spark):
    df = spark.createDataFrame([("c",)], "conv_id string")
    with pytest.raises(ValueError, match="turn_idx"):
        normalize_transcripts(df)


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_read_transcripts_format_roundtrip(spark, tmp_path, fmt):
    src = synth_transcripts(spark, n_convs=4, mean_turns=3, seed=5)
    path = str(tmp_path / fmt)
    writer = src.coalesce(1).write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true").option("quoteAll", "true")
    getattr(writer, "format")(fmt).save(path)

    back = read_transcripts(spark, path, fmt=fmt)
    assert ",".join(back.columns) == CANON
    # the extraction pipeline runs unchanged on every format and finds the
    # same tables (csv/json stringly-typed columns are coerced back)
    want = extract_tables(src).count()
    assert extract_tables(back).count() == want


def test_read_transcripts_catalog_table(spark):
    """fmt='table'/'iceberg' reads a catalog table by name through
    spark.read.table — the Iceberg path once a catalog is configured;
    here exercised against the session catalog."""
    src = synth_transcripts(spark, n_convs=3, mean_turns=3, seed=11)
    src.createOrReplaceTempView("transcripts_v")
    back = read_transcripts(spark, "transcripts_v", fmt="table")
    assert ",".join(back.columns) == CANON
    assert back.count() == src.count()
    assert extract_tables(back).count() == extract_tables(src).count()
