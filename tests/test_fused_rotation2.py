"""Round-5 rotation-#2 fused rows vs their standalone components.

Each fused row's contract is that consolidation loses nothing: every column
(selection / char-integrity, per-doc joins) or every (metric, key, value)
row (ops audit, tall reshape) equals what the standalone operator it
absorbed produces.  The fused functions call the components' own query
functions, so these tests guard against future refactoring drift in the
renames, join keys, and the explode-unpivot (SCALING.md §4f), not against
re-implementation.
"""

import os

import pandas as pd
import pytest

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata absent"
)


def _pdf(q, spark, sort="doc_id"):
    df = q(spark, SF_DIR).toPandas()
    return df.sort_values(sort).reset_index(drop=True)


def test_selection_pipeline_matches_components(spark):
    from tablestructurerec_spark.operators.ccnet import q_ccnet_buckets
    from tablestructurerec_spark.operators.curriculum import q_curriculum_order
    from tablestructurerec_spark.operators.distill import q_quality_distill
    from tablestructurerec_spark.operators.sampling import q_dsir_weights
    from tablestructurerec_spark.operators.selection import q_selection_pipeline

    fused = _pdf(q_selection_pipeline, spark)
    cc = _pdf(q_ccnet_buckets, spark)
    nb = _pdf(q_quality_distill, spark)
    ds = _pdf(q_dsir_weights, spark)
    cu = _pdf(q_curriculum_order, spark)
    assert len(fused) == len(cc) == len(nb) == len(ds) == len(cu)
    pd.testing.assert_series_equal(fused["ppl"], cc["ppl"], check_names=False)
    pd.testing.assert_series_equal(
        fused["ppl_bucket"], cc["bucket"], check_names=False
    )
    pd.testing.assert_series_equal(
        fused["nb_score"], nb["nb_score"], check_names=False
    )
    pd.testing.assert_series_equal(
        fused["nb_feats"], nb["n_feats"], check_names=False
    )
    pd.testing.assert_series_equal(
        fused["dsir_logw"], ds["logw"], check_names=False
    )
    pd.testing.assert_series_equal(
        fused["keep_target"], ds["keep_target"], check_names=False
    )
    pd.testing.assert_series_equal(
        fused["order_idx"], cu["order_idx"], check_names=False
    )
    pd.testing.assert_series_equal(fused["shard"], cu["shard"], check_names=False)


def test_char_integrity_matches_components(spark):
    from tablestructurerec_spark.operators.charprofile import q_char_profile
    from tablestructurerec_spark.operators.integrity import q_char_integrity
    from tablestructurerec_spark.operators.langscript import (
        q_lang_script_consistency,
    )
    from tablestructurerec_spark.operators.normalize import q_normalize_text

    fused = _pdf(q_char_integrity, spark)
    cp = _pdf(q_char_profile, spark)
    nz = _pdf(q_normalize_text, spark)
    assert len(fused) == len(cp) == len(nz)
    for col in cp.columns:
        if col == "doc_id":
            continue
        pd.testing.assert_series_equal(fused[col], cp[col], check_names=False)
    pd.testing.assert_series_equal(fused["norm_md5"], nz["norm_md5"], check_names=False)
    pd.testing.assert_series_equal(
        fused["nfc_changed"], nz["nfc_changed"], check_names=False
    )
    # the per-doc verdict columns must agree with the aggregate frame row
    # for that doc's (lang, dominant_script) group
    ls = q_lang_script_consistency(spark, SF_DIR).toPandas()
    merged = fused.merge(
        ls,
        how="left",
        left_on=["lang", "dominant_script"],
        right_on=["lang", "dominant_script"],
        suffixes=("", "_ls"),
    )
    assert (merged["script_group_docs"] == merged["n_docs"]).all()
    assert (merged["expected_script"] == merged["expected_script_ls"]).all()
    assert (merged["is_consistent"] == merged["is_consistent_ls"]).all()


def test_ops_audit_matches_components(spark):
    from tablestructurerec_spark.operators.drift import q_distribution_drift
    from tablestructurerec_spark.operators.filestats import q_file_balance
    from tablestructurerec_spark.operators.kanon import q_k_anonymity
    from tablestructurerec_spark.operators.opsaudit import q_ops_audit
    from tablestructurerec_spark.operators.skewaudit import q_skew_audit
    from tablestructurerec_spark.operators.snapshot import q_snapshot_diff

    fused = q_ops_audit(spark, SF_DIR).toPandas()
    rows = []
    dr = q_distribution_drift(spark, SF_DIR).toPandas()
    for r in dr.itertuples(index=False):
        key = f"{r.day_from}>{r.day_to}"
        rows += [
            ("drift_ppm", key, r.drift_ppm),
            ("drift_n_types", key, r.n_types),
            ("drift_n_from", key, r.n_from),
            ("drift_n_to", key, r.n_to),
        ]
    for r in q_snapshot_diff(spark, SF_DIR).toPandas().itertuples(index=False):
        rows.append(("snapshot_docs", r.status, r.n_docs))
    for r in q_skew_audit(spark, SF_DIR).toPandas().itertuples(index=False):
        rows += [
            ("skew_n_rows", r.key_col, r.n_rows),
            ("skew_n_keys", r.key_col, r.n_keys),
            ("skew_max_key_rows", r.key_col, r.max_key_rows),
            ("skew_p50_key_rows", r.key_col, r.p50_key_rows),
            ("skew_p99_key_rows", r.key_col, r.p99_key_rows),
            ("skew_top1_share_ppm", r.key_col, r.top1_share_ppm),
            ("skew_salt_factor", r.key_col, r.salt_factor),
        ]
    for r in q_file_balance(spark, SF_DIR).toPandas().itertuples(index=False):
        rows += [
            ("file_n_rows", r.file, r.n_rows),
            ("file_share_ppm", r.file, r.share_ppm),
            ("file_split_factor", r.file, r.split_factor),
        ]
    for r in q_k_anonymity(spark, SF_DIR).toPandas().itertuples(index=False):
        key = f"{r.c_nationkey}|{r.c_mktsegment}|{r.bal_bucket}"
        rows += [
            ("kanon_class_size", key, r.class_size),
            ("kanon_at_risk", key, int(r.at_risk)),
        ]
    expected = sorted((m, k, int(v)) for m, k, v in rows)
    got = sorted(
        (r.metric, r.key, int(r.value)) for r in fused.itertuples(index=False)
    )
    assert got == expected
