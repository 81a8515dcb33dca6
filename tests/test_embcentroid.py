"""Label-centroid cosine (embcentroid.q_label_centroid_sim) — numpy ground
truth within quantization, identical-population vs orthogonal-population
fixtures, negative-value division semantics, and DuckDB value parity
(registry at the driver's 50-row cap).
"""

import os
import random

import duckdb
import numpy as np

from tablestructurerec_spark.operators.embcentroid import (
    centroid_sql,
    label_centroid_sim,
    q_label_centroid_sim,
)

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")


def _write(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(rows).to_parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def _rows(vecs_by_label):
    rows, vid = [], 0
    for label, vecs in vecs_by_label.items():
        for v in vecs:
            rows.append(
                {"vec_id": vid, "embedding": np.asarray(v, dtype=np.float32),
                 "label": label}
            )
            vid += 1
    return rows


def test_same_vs_orthogonal_populations(spark, tmp_path):
    rng = random.Random(3)
    base_a = [1.0, 0.0, 0.5, 0.0]
    base_b = [0.0, 1.0, 0.0, 0.5]
    mk = lambda base: [x + rng.uniform(-0.01, 0.01) for x in base]
    d = _write(
        tmp_path,
        _rows({0: [mk(base_a) for _ in range(40)],
               1: [mk(base_a) for _ in range(40)],   # same population as 0
               2: [mk(base_b) for _ in range(40)]}),  # orthogonal-ish
    )
    got = {(r["label_a"], r["label_b"]): r["cos"]
           for r in q_label_centroid_sim(spark, d).collect()}
    assert got[(0, 1)] > 0.999
    assert abs(got[(0, 2)]) < 0.05 and abs(got[(1, 2)]) < 0.05


def test_numpy_ground_truth_with_negatives(spark, tmp_path):
    rng = random.Random(9)
    vecs = {
        l: [[rng.uniform(-2, 2) for _ in range(16)] for _ in range(30)]
        for l in (0, 1, 2)
    }
    d = _write(tmp_path, _rows(vecs))
    got = {(r["label_a"], r["label_b"]): r["cos"]
           for r in q_label_centroid_sim(spark, d).collect()}
    for a in (0, 1):
        for b in range(a + 1, 3):
            ca = np.mean(np.asarray(vecs[a], dtype=np.float32), axis=0)
            cb = np.mean(np.asarray(vecs[b], dtype=np.float32), axis=0)
            want = float(ca @ cb / (np.linalg.norm(ca) * np.linalg.norm(cb)))
            # 1e-6 quantization of values + integer-average truncation
            assert abs(got[(a, b)] - want) < 1e-3, (a, b, got[(a, b)], want)


def test_overflow_envelope_enforced(spark, tmp_path):
    import pytest

    # |v| ~ 4000 at D=512 blows the BIGINT envelope for sum(c*c): must be a
    # loud error, not a silently wrapped cosine (review finding).
    d = _write(
        tmp_path,
        _rows({0: [[4000.0] * 512] * 3, 1: [[-4000.0] * 512] * 3}),
    )
    with pytest.raises(ValueError, match="envelope"):
        q_label_centroid_sim(spark, d).collect()


def test_ragged_dims_rejected(spark, tmp_path):
    import pytest

    rows = _rows({0: [[1.0, 0.5, 0.2, 0.1]] * 3})
    rows += [
        {"vec_id": 100 + i,
         "embedding": np.asarray([1.0, 0.5], dtype=np.float32),
         "label": 1}
        for i in range(3)
    ]
    d = _write(tmp_path, rows)
    with pytest.raises(ValueError, match="dimensionality"):
        q_label_centroid_sim(spark, d).collect()


def test_intra_label_ragged_rejected(spark, tmp_path):
    import pytest

    # ADVICE r3: every label reaches the same MAX dim (4), but label 1 mixes
    # 2-dim and 4-dim vectors — per-dim support then varies inside the label
    # and the old cross-label-only guard passed it silently.
    rows = _rows({0: [[1.0, 0.5, 0.2, 0.1]] * 3})
    rows += [
        {"vec_id": 100, "embedding": np.asarray([1.0, 0.5], dtype=np.float32),
         "label": 1},
        {"vec_id": 101,
         "embedding": np.asarray([1.0, 0.5, 0.2, 0.1], dtype=np.float32),
         "label": 1},
    ]
    d = _write(tmp_path, rows)
    with pytest.raises(ValueError, match="differing dimensionality"):
        q_label_centroid_sim(spark, d).collect()


def test_default_face_releases_cache(spark, tmp_path):
    # ADVICE r3: the persisted centroid frame used to stay live for the
    # session on the success path.
    rng = random.Random(7)
    vecs = {l: [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(10)]
            for l in range(2)}
    d = _write(tmp_path, _rows(vecs))
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getRDDStorageInfo()
    assert q_label_centroid_sim(spark, d).count() == 1
    assert len(jsc.getRDDStorageInfo()) == len(before)


def test_duckdb_parity_random(spark, tmp_path):
    rng = random.Random(15)
    vecs = {
        l: [[rng.uniform(-1.5, 1.5) for _ in range(12)] for _ in range(25)]
        for l in range(4)
    }
    d = _write(tmp_path, _rows(vecs))
    got = [
        tuple(r)
        for r in q_label_centroid_sim(spark, d).toPandas().itertuples(index=False)
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'")
    want = [tuple(r) for r in con.execute(centroid_sql()).fetchall()]
    assert got == want
    assert len(got) == 6


def test_duckdb_parity_sf(spark):
    got = [
        tuple(r)
        for r in q_label_centroid_sim(spark, SF_DIR)
        .toPandas()
        .itertuples(index=False)
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    want = [tuple(r) for r in con.execute(centroid_sql()).fetchall()]
    assert got == want
    assert len(got) > 0
