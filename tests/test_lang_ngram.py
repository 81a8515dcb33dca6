"""Char-ngram language ID (textstats.q_lang_id_ngram) — the Cavnar–Trenkle
profile scorer that upgrades the marker-word heuristic.

Pins: exact hand-computed scores on a known string, correct classification
of real-language sentences (the operator must be a real langid model, not
just oracle-consistent), tie/empty edge cases, and DuckDB parity of the
standalone SQL (the registered coverage rides the consolidated
``t_text_profile`` oracle, which inherits ``_LANG_NGRAM_SQL`` byte-for-byte).
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from tablestructurerec_spark.operators.textstats import (
    _LANG_NGRAM_SQL,
    _NGRAM_LANGS,
    lang_ngram_pred_col,
    lang_ngram_score_cols,
    padded_col,
    q_lang_id_ngram,
)

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")


def _score(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    return (
        df.select("id", *lang_ngram_score_cols(padded_col(F.col("text"))))
        .select("*", lang_ngram_pred_col())
        .orderBy("id")
        .toPandas()
    )


def test_hand_computed_score(spark):
    # " the " → trigrams [" th", "the", "he "] → en weights 20+19+18
    out = _score(spark, ["the"])
    assert int(out["ng_en"][0]) == 57
    assert out["pred_lang_ngram"][0] == "en"


def test_real_sentences_classify(spark):
    sentences = {
        "en": "the quick brown fox is jumping over the lazy dog and running to the end of the garden",
        "es": "el perro de la casa es que los gatos en el jardin tienen que comer antes de la noche",
        "de": "der hund und die katze sind schnell und die kirche ist ein schönes gebäude in der stadt",
        "fr": "le chien et le chat de la maison que les enfants de notre jour et le retour de la mer",
        "zh": "zhe shi yi ge hen da de difang ma wo bu zhidao ta shi shei de pengyou ma ni shuo shi bu shi",
    }
    out = _score(spark, list(sentences.values()))
    got = list(out["pred_lang_ngram"])
    assert got == list(sentences), got


def test_empty_and_tie_break(spark):
    out = _score(spark, ["", "xxx", "qq"])
    # all-zero scores tie → first language in the fixed priority order
    assert all(out["pred_lang_ngram"] == _NGRAM_LANGS[0])
    for l in _NGRAM_LANGS:
        assert (out[f"ng_{l}"] == 0).all(), l


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata absent"
)
def test_duckdb_parity(spark):
    sdf = q_lang_id_ngram(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    odf = con.execute(_LANG_NGRAM_SQL).df()
    assert len(sdf) == len(odf)
    for col in sdf.columns:
        assert sdf[col].tolist() == odf[col].tolist(), col
