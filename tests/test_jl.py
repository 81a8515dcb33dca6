"""JL random projection (operators/jl.py) — hand-computed projection truth,
map-only plan pin, JL distance-preservation property on the real corpus,
and DuckDB value parity for both faces (registry at the driver's 50-row
cap).
"""

import math
import os

import duckdb
import numpy as np

from tablestructurerec_spark.operators.jl import (
    D_IN,
    D_OUT,
    N_QUERIES,
    TOP_K,
    jl_project,
    jl_project_sql,
    jl_recall_sql,
    q_jl_project,
    q_jl_recall,
    sign_matrix,
)

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_sign_matrix_deterministic_and_balanced():
    m = sign_matrix()
    assert m == sign_matrix()  # pure function of the index pair
    assert len(m) == D_OUT and all(len(r) == D_IN for r in m)
    flat = [s for row in m for s in row]
    assert set(flat) == {-1, 1}
    # md5 bytes are balanced enough that neither sign dominates 2:1
    assert 0.33 < flat.count(1) / len(flat) < 0.67


def test_projection_truth_tiny(spark):
    emb = spark.createDataFrame(
        [(0, [0.5] * D_IN), (1, [-1.0] * D_IN)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    got = {r["vec_id"]: r["proj"] for r in jl_project(emb).collect()}
    m = np.array(sign_matrix())
    # constant vectors: proj_j = scaled_value * sum(signs_j)
    row_sums = m.sum(axis=1)
    assert got[0] == [int(500_000 * s) for s in row_sums]
    assert got[1] == [int(-1_000_000 * s) for s in row_sums]


def test_projection_is_map_only(spark):
    from tablestructurerec_spark.sources.read import read_table

    out = jl_project(read_table(spark, SF_DIR, "embeddings"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    runtime = plan.split("== Initial Plan ==")[0]
    # zero hash exchanges: the only exchange is the presentation sort's
    # range partitioning (dropped on the production face)
    assert "Exchange hashpartitioning" not in runtime


def test_jl_preserves_distances_on_corpus(spark):
    """The JL property itself, measured: pairwise squared distances in the
    projected space, rescaled by D_IN/D_OUT, stay within a constant
    distortion band of the original distances for real corpus vectors."""
    from tablestructurerec_spark.sources.read import read_table

    emb = read_table(spark, SF_DIR, "embeddings").limit(60).toPandas()
    x = np.array([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    xi = np.floor(x * 1_000_000 + 0.5)
    m = np.array(sign_matrix(), dtype=np.float64)
    p = xi @ m.T
    ratios = []
    for i in range(0, 50, 5):
        for j in range(i + 1, 50, 7):
            do = float(((xi[i] - xi[j]) ** 2).sum())
            dp = float(((p[i] - p[j]) ** 2).sum()) / (D_IN / 1.0)
            # E[dp] = do * D_OUT under the +-1 JL ensemble (row norm = D_IN)
            ratios.append(dp / (do * D_OUT / D_IN))
    med = sorted(ratios)[len(ratios) // 2]
    assert 0.5 < med < 2.0, med
    assert all(0.1 < r < 10.0 for r in ratios), (min(ratios), max(ratios))


def _oracle(sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    return [tuple(r) for r in con.execute(sql).fetchall()]


def test_duckdb_parity_project(spark):
    got = [
        (r["vec_id"], tuple(r["proj"]))
        for r in q_jl_project(spark, SF_DIR).collect()
    ]
    want = [(v, tuple(p)) for v, p in _oracle(jl_project_sql())]
    assert got == want
    assert len(got) > 0 and len(got[0][1]) == D_OUT


def test_duckdb_parity_recall(spark):
    got = [
        tuple(r)
        for r in q_jl_recall(spark, SF_DIR).toPandas().itertuples(index=False)
    ]
    want = _oracle(jl_recall_sql())
    assert got == want
    assert len(got) == N_QUERIES
    # the test corpus is ISOTROPIC (top-10 same-label purity is chance
    # level), so the diagnostic must honestly report low-but-nonzero
    # recall here; the structure-preservation guarantee is pinned on the
    # planted-cluster fixture below
    mean_recall = sum(r[1] for r in got) / (len(got) * TOP_K)
    assert 0.0 <= mean_recall < 0.6, mean_recall


def test_recall_is_perfect_on_planted_clusters(spark):
    """When neighbourhood structure actually exists (tight, well-separated
    clusters), the 64->16 projection preserves top-k exactly — the JL
    guarantee the measurement face exists to certify."""
    from tablestructurerec_spark.operators.jl import jl_recall

    rng = np.random.RandomState(7)
    centers = rng.choice([-1.0, 1.0], size=(12, D_IN)) * 0.5
    rows = []
    vid = 0
    for c in range(12):
        for m in range(11):  # TOP_K + query itself
            v = centers[c] + rng.normal(0, 0.01, D_IN)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    got = jl_recall(emb).collect()
    assert len(got) == N_QUERIES
    # queries 0..7 live in cluster 0; their true top-10 is the rest of the
    # cluster, which survives the projection untouched
    assert all(r["n_hits"] == TOP_K for r in got), [
        (r["qid"], r["n_hits"]) for r in got
    ]
