"""Cross-source dup matrix (provenance.q_dup_source_matrix) — planted
cross-source near-dup recovery, consistency with the minhash pair list, and
DuckDB value parity (registry at the driver's 50-row cap).
"""

import os
import random

import duckdb

from tablestructurerec_spark.operators.provenance import (
    dup_source_matrix_sql,
    q_dup_source_matrix,
)

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")


def _write(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(rows).to_parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_planted_cross_source_dups(spark, tmp_path):
    rng = random.Random(37)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    # mirrored content between src_m1 and src_m2; independent docs elsewhere
    for i in range(6):
        body = " ".join(vocab[rng.randrange(30)] for _ in range(80))
        rows.append({"doc_id": 2 * i, "text": body, "source": "src_m1"})
        rows.append({"doc_id": 2 * i + 1, "text": body + " tail", "source": "src_m2"})
    for i in range(20):
        rows.append(
            {
                "doc_id": 100 + i,
                "text": " ".join(vocab[rng.randrange(30)] for _ in range(80)),
                "source": "src_solo",
            }
        )
    d = _write(tmp_path, rows)
    got = {(r["src_a"], r["src_b"]): r["n_pairs"]
           for r in q_dup_source_matrix(spark, d).collect()}
    assert got.get(("src_m1", "src_m2"), 0) >= 5  # the mirror dominates
    # consistency: matrix total == minhash candidate-pair count
    from tablestructurerec_spark.operators.dedup import q_dedup_minhash_lsh

    assert sum(got.values()) == q_dedup_minhash_lsh(spark, d).count()


def test_duckdb_parity_sf(spark):
    got = [
        tuple(r)
        for r in q_dup_source_matrix(spark, SF_DIR)
        .toPandas()
        .itertuples(index=False)
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(dup_source_matrix_sql()).fetchall()]
    assert got == want
