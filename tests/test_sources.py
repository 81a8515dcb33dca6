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


def test_csv_reordered_and_superset_columns_bind_by_name(spark, tmp_path):
    """CSV columns must bind by HEADER NAME: with an explicit schema Spark
    binds positionally and silently misassigns reordered/superset files."""
    p = str(tmp_path / "re.csv")
    import os

    os.makedirs(p)
    with open(f"{p}/part.csv", "w") as f:
        f.write("turn_idx,extra,conv_id,text\n")
        f.write('1,zzz,convA,"hello <table><tr><td>x</td></tr></table>"\n')
        f.write("2,yyy,convA,plain turn\n")
    back = read_transcripts(spark, p, fmt="csv")
    rows = {r.turn_idx: r for r in back.collect()}
    assert rows[1].conv_id == "convA" and "hello" in rows[1].text
    assert rows[2].text == "plain turn"
    assert "extra" not in back.columns


def test_malformed_values_become_nulls_not_job_failures(spark, tmp_path):
    """ANSI mode is on by default in Spark 4: plain cast would abort the
    job on one bad value; the contract is nulls."""
    p = str(tmp_path / "bad.csv")
    import os

    os.makedirs(p)
    with open(f"{p}/part.csv", "w") as f:
        f.write("conv_id,turn_idx,text,ts\n")
        f.write("c,notanint,x,alsonotatimestamp\n")
        f.write("c,2,y,2025-01-01 00:00:00\n")
    back = read_transcripts(spark, p, fmt="csv").collect()
    by_text = {r.text: r for r in back}
    assert by_text["x"].turn_idx is None and by_text["x"].ts is None
    assert by_text["y"].turn_idx == 2


def test_json_wrong_shape_rejected(spark, tmp_path):
    """A JSON input carrying NONE of the required transcript keys must fail
    loudly — the imposed permissive schema would otherwise null every
    column silently."""
    import json, os

    p = str(tmp_path / "wrong")
    os.makedirs(p)
    with open(f"{p}/part.jsonl", "w") as f:
        for i in range(3):
            f.write(json.dumps({"foo": i, "bar": "x"}) + "\n")
    with pytest.raises(ValueError, match="none of the required keys"):
        read_transcripts(spark, p, fmt="json")


def test_json_sparse_keys_accepted(spark, tmp_path):
    """JSON writers drop null fields by default (Spark's ignoreNullFields),
    so a valid corpus whose first lines omit `text` entirely must still
    load — only a zero-required-keys sample is a shape error."""
    import json, os

    p = str(tmp_path / "sparse")
    os.makedirs(p)
    with open(f"{p}/part.jsonl", "w") as f:
        for i in range(60):  # more than the validation sample
            f.write(json.dumps({"conv_id": "c", "turn_idx": i}) + "\n")
        f.write(json.dumps({"conv_id": "c", "turn_idx": 60, "text": "hi"}) + "\n")
    back = read_transcripts(spark, p, fmt="json")
    assert back.count() == 61
    assert back.where("text is not null").count() == 1


def test_json_multiline_option_case_insensitive(spark, tmp_path):
    """Spark reader options are case-insensitive; `multiline='true'`
    (lowercase l) must skip the line-based key validation just like
    `multiLine` — a pretty-printed array file has no per-line objects."""
    import os

    p = str(tmp_path / "multi")
    os.makedirs(p)
    with open(f"{p}/part.json", "w") as f:
        f.write('[\n  {"conv_id": "c",\n   "turn_idx": 1,\n   "text": "hello"}\n]\n')
    back = read_transcripts(spark, p, fmt="json", multiline="true")
    rows = back.collect()
    assert len(rows) == 1 and rows[0].text == "hello"


def test_json_validation_respects_path_glob(spark, tmp_path):
    """The key-presence sample must select files the way the real read does:
    a non-JSON sidecar excluded by pathGlobFilter cannot poison the
    sample."""
    import json, os

    p = str(tmp_path / "globbed")
    os.makedirs(p)
    with open(f"{p}/README.txt", "w") as f:
        f.write("this is not json\n" * 80)
    with open(f"{p}/data.jsonl", "w") as f:
        f.write(json.dumps({"conv_id": "c", "turn_idx": 1, "text": "hi"}) + "\n")
    back = read_transcripts(spark, p, fmt="json", pathGlobFilter="*.jsonl")
    assert back.count() == 1
