"""Bigram PMI collocation mining (pmi.q_pmi_bigrams) — planted-collocation
recovery, python ground truth for the integer lift, single-corpus-scan
persistence shape, and DuckDB value parity of the standalone SQL (registry
at the driver's 50-row cap).
"""

import os
import random
from collections import Counter

import duckdb

from tablestructurerec_spark.operators.pmi import (
    LIFT_SCALE,
    MIN_COUNT,
    pmi_bigrams,
    pmi_sql,
    q_pmi_bigrams,
)

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")


def _write(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(rows).to_parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _py_lift(texts):
    """Ground-truth integer lift, same two-step truncation."""
    bg, left, right = Counter(), Counter(), Counter()
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
    n = sum(bg.values())
    for (a, b), c in bg.items():
        left[a] += c
        right[b] += c
    out = {}
    for (a, b), c in bg.items():
        if c >= MIN_COUNT:
            out[(a, b)] = ((c * LIFT_SCALE) // left[a]) * n // right[b]
    return out


def test_planted_collocation_ranks_first(spark, tmp_path):
    # "kuala lumpur" always co-occurs; filler words pair randomly — the
    # planted collocation must rank at the top with the exact lift value.
    rng = random.Random(13)
    filler = [f"w{i}" for i in range(30)]
    texts = []
    for _ in range(80):
        words = [filler[rng.randrange(30)] for _ in range(60)]
        pos = rng.randrange(0, 58)
        words[pos:pos + 2] = ["kuala", "lumpur"]
        texts.append(" ".join(words))
    rows = [{"doc_id": i, "text": t, "source": "s"} for i, t in enumerate(texts)]
    d = _write(tmp_path, rows)
    got = q_pmi_bigrams(spark, d).collect()
    assert (got[0]["w1"], got[0]["w2"]) == ("kuala", "lumpur")
    truth = _py_lift(texts)
    assert got[0]["lift_scaled"] == truth[("kuala", "lumpur")]
    # every surfaced row matches the python ground truth exactly
    for r in got:
        assert r["lift_scaled"] == truth[(r["w1"], r["w2"])], (r["w1"], r["w2"])


def test_single_corpus_scan(spark, tmp_path):
    # The bigram aggregate is persisted: the corpus-side scan must appear
    # exactly once in the executed plan (InMemoryTableScan feeds the rest).
    rows = [
        {"doc_id": i, "text": "alpha beta gamma delta " * 10, "source": "s"}
        for i in range(20)
    ]
    d = _write(tmp_path, rows)
    docs = spark.read.parquet(d + "/documents.parquet")
    jsc = spark.sparkContext._jsc.sc()
    before = len(jsc.getRDDStorageInfo())
    # materialize=False: the lazy plan-inspection face returns the plan AND
    # the persisted bigram handle (ADVICE r4: the caller owns the cache's
    # lifetime, so it must receive the means to release it)
    out, bg = pmi_bigrams(docs, materialize=False)
    try:
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 1
        # Everything above the cached bigram relation (the runtime path: the
        # marginal windows + ranking) must read the cache, never parquet; the
        # 'Scan parquet' strings below the marker are just the cached build
        # plan's printout.
        runtime = plan.split("InMemoryRelation")[0]
        assert "Scan parquet" not in runtime
    finally:
        bg.unpersist(blocking=True)
    # the returned handle releases the cache without clearCache()
    assert len(jsc.getRDDStorageInfo()) == before


def test_default_face_releases_cache(spark, tmp_path):
    # ADVICE r3: the persisted bigram table used to stay live for the
    # session on the success path.  The default face must leave no cached
    # relation behind.
    rows = [
        {"doc_id": i, "text": "alpha beta gamma delta " * 10, "source": "s"}
        for i in range(10)
    ]
    d = _write(tmp_path, rows)
    docs = spark.read.parquet(d + "/documents.parquet")
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getRDDStorageInfo()
    out = pmi_bigrams(docs)
    assert out.count() > 0
    assert len(jsc.getRDDStorageInfo()) == len(before)


def test_duckdb_parity(spark):
    got = [
        tuple(r)
        for r in q_pmi_bigrams(spark, SF_DIR).toPandas().itertuples(index=False)
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(pmi_sql()).fetchall()]
    assert got == want
    assert 0 < len(got) <= 50


def test_duckdb_parity_random(spark, tmp_path):
    rng = random.Random(29)
    vocab = [f"tok{i}" for i in range(40)]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(vocab[rng.randrange(40)] for _ in range(120)),
            "source": "s",
        }
        for i in range(60)
    ]
    d = _write(tmp_path, rows)
    got = [
        tuple(r)
        for r in q_pmi_bigrams(spark, d).toPandas().itertuples(index=False)
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    want = [tuple(r) for r in con.execute(pmi_sql()).fetchall()]
    assert got == want
