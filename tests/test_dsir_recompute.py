"""From-scratch recompute checks, independent of BOTH engines.

The DuckDB parity tests prove Spark and DuckDB agree; these prove they
agree on the RIGHT numbers: a ~30-line pure-python reimplementation of the
DSIR weight math (and the ngram langid scores) from the published
definitions, run against the Spark output on seeded random corpora.
Pattern follows the event-funnel per-user recompute test from round 2.
"""

import hashlib
import math
import random
import re

import pandas as pd
import pytest

from tablestructurerec_spark.operators.sampling import (
    _DSIR_ALPHA,
    _DSIR_BUCKETS,
    _SCALE_DSIR,
    q_dsir_weights,
)
from tablestructurerec_spark.operators.textstats import (
    _NGRAM_LANGS,
    _NGRAM_PROFILES,
    _ngram_weights,
)

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "the", "de", "und"]


def _toks(text):
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ") if t]


def _feats(text):
    t = _toks(text)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _bucket(f):
    return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % _DSIR_BUCKETS


def _py_round(x):
    # round-half-away-from-zero, matching Spark/DuckDB ROUND (python's
    # built-in round is banker's)
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _dsir_reference(rows):
    """rows: list of (doc_id, text, lang). Returns {doc_id: (n_feats, logw)}."""
    raw, tgt = {}, {}
    for _, text, lang in rows:
        for f in _feats(text):
            b = _bucket(f)
            raw[b] = raw.get(b, 0) + 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
    r_total, t_total = sum(raw.values()), sum(tgt.values())
    a, ab = _DSIR_ALPHA, _DSIR_ALPHA * _DSIR_BUCKETS
    lr = {
        b: _py_round(
            (
                math.log10((tgt.get(b, 0) + a) / (t_total + ab))
                - math.log10((raw[b] + a) / (r_total + ab))
            )
            * _SCALE_DSIR
        )
        for b in raw
    }
    out = {}
    for doc_id, text, _ in rows:
        fs = _feats(text)
        s = sum(lr[_bucket(f)] for f in fs)
        out[doc_id] = (len(fs), round(s / _SCALE_DSIR, 6))
    return out


def test_dsir_matches_pure_python_reference(spark, tmp_path):
    rng = random.Random(42)
    rows = []
    for i in range(60):
        n = rng.randint(0, 12)
        text = " ".join(rng.choice(_WORDS) for _ in range(n))
        lang = rng.choice(["en", "en", "fr", "zh"])
        rows.append((i, text, lang))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["source"] = "s"
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    pdf.to_parquet(tmp_path / "documents.parquet")

    got = q_dsir_weights(spark, str(tmp_path)).toPandas().set_index("doc_id")
    want = _dsir_reference(rows)
    for doc_id, (n_feats, logw) in want.items():
        assert int(got.loc[doc_id, "n_feats"]) == n_feats, doc_id
        assert float(got.loc[doc_id, "logw"]) == pytest.approx(logw, abs=2e-6), doc_id


def test_ngram_scores_match_pure_python_reference(spark):
    from pyspark.sql import functions as F

    from tablestructurerec_spark.operators.textstats import (
        lang_ngram_score_cols,
        padded_col,
    )

    rng = random.Random(7)
    alphabet = "abcdefgh ent de th "  # biased toward profile trigrams
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    got = (
        df.select("id", *lang_ngram_score_cols(padded_col(F.col("text"))))
        .orderBy("id")
        .toPandas()
    )
    for i, text in enumerate(texts):
        p = " " + re.sub(r"[^a-z0-9]+", " ", text.lower()) + " "
        for lang in _NGRAM_LANGS:
            # str.count is non-overlapping, same as the replace-length count
            want = sum(w * p.count(tg) for tg, w in _ngram_weights(lang))
            assert int(got[f"ng_{lang}"][i]) == want, (i, lang, text)


def test_profiles_are_well_formed():
    for lang, prof in _NGRAM_PROFILES.items():
        assert len(prof) == len(set(prof)), f"duplicate trigram in {lang}"
        assert all(len(tg) == 3 for tg in prof), lang
        assert all(set(tg) <= set("abcdefghijklmnopqrstuvwxyz0123456789 ") for tg in prof), lang
