"""Key-skew audit (skewaudit.q_skew_audit) — DuckDB value parity on the
events table, python ground truth on the Zipf-skewed synthetic transcripts
(the flagship input whose conv_id salting the audit justifies), and the
uniform no-skew regime.
"""

import os
from collections import Counter

import duckdb

from tablestructurerec_spark.operators.skewaudit import (
    TARGET_ROWS_PER_TASK,
    q_skew_audit,
    skew_audit,
    skew_audit_sql,
)

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_duckdb_parity_events(spark):
    got = [
        tuple(r)
        for r in q_skew_audit(spark, SF_DIR).toPandas().itertuples(index=False)
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    want = [tuple(r) for r in con.execute(skew_audit_sql()).fetchall()]
    assert got == want
    assert len(got) == 1


def test_zipf_transcripts_ground_truth(spark):
    # The synthesizer makes conversation sizes Zipfian on purpose; the audit
    # over conv_id must reproduce a python count over the same rows exactly.
    from tablestructurerec_spark.sources.synthetic import synth_transcripts

    df = synth_transcripts(spark, 120, seed=42)
    rows = df.select("conv_id").collect()
    truth = Counter(r["conv_id"] for r in rows)
    counts = sorted(truth.values())
    n_keys = len(counts)
    audit = skew_audit(spark, df, "conv_id").collect()[0]
    assert audit["n_rows"] == sum(counts)
    assert audit["n_keys"] == n_keys
    assert audit["max_key_rows"] == counts[-1]
    assert audit["p50_key_rows"] == counts[max(1, (n_keys + 1) // 2) - 1]
    assert audit["p99_key_rows"] == counts[max(1, (99 * n_keys + 99) // 100) - 1]
    assert audit["top1_share_ppm"] == counts[-1] * 1_000_000 // sum(counts)
    # Zipf tail: the largest conversation dominates its median peer.
    assert audit["max_key_rows"] >= 5 * audit["p50_key_rows"]


def test_uniform_no_skew(spark, tmp_path):
    import pandas as pd

    pd.DataFrame(
        [
            {"event_id": i, "user_id": i % 10, "event_type": "x"}
            for i in range(1000)
        ]
    ).to_parquet(str(tmp_path / "events.parquet"))
    df = spark.read.parquet(str(tmp_path / "events.parquet"))
    audit = skew_audit(spark, df, "user_id").collect()[0]
    assert audit["p50_key_rows"] == audit["p99_key_rows"] == 100
    assert audit["salt_factor"] == 1
    assert audit["top1_share_ppm"] == 100_000


def test_salt_factor_scales_with_hot_key(spark, tmp_path):
    import pandas as pd

    rows = [{"event_id": i, "user_id": 7} for i in range(250)]
    rows += [{"event_id": 1000 + i, "user_id": i} for i in range(50)]
    pd.DataFrame(rows).to_parquet(str(tmp_path / "events.parquet"))
    df = spark.read.parquet(str(tmp_path / "events.parquet"))
    audit = skew_audit(spark, df, "user_id").collect()[0]
    assert audit["max_key_rows"] == 251  # user 7 also appears in the tail
    assert audit["salt_factor"] == max(
        1, (251 + TARGET_ROWS_PER_TASK - 1) // TARGET_ROWS_PER_TASK
    )


def test_empty_input_returns_empty_frame(spark):
    # ADVICE r3: sum(c) over an empty counts table is NULL; the audit must
    # return a defined empty result, not a TypeError out of int(None).
    empty = spark.createDataFrame([], "user_id BIGINT, x STRING")
    out = skew_audit(spark, empty, "user_id")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "key_col", "n_rows", "n_keys", "max_key_rows", "p50_key_rows",
        "p99_key_rows", "top1_share_ppm", "salt_factor",
    ]
