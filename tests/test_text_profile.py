"""Consolidated per-doc profile (operators/profile.py) vs the six originals.

q_text_profile exists to fit the driver's 50-correctness-row window; its
contract is that consolidation loses nothing: every column equals the same
column from the standalone operator it absorbed, and the combined plan reads
the documents table exactly once with no shuffle before the presentation
sort.
"""

import os

import pytest

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata absent"
)


@pytest.fixture(scope="module")
def profile_pdf(spark):
    from tablestructurerec_spark.operators.profile import q_text_profile

    return q_text_profile(spark, SF_DIR).toPandas()


def _pdf(q, spark):
    return q(spark, SF_DIR).toPandas().sort_values("doc_id").reset_index(drop=True)


def test_profile_matches_join_of_originals(spark, profile_pdf):
    from tablestructurerec_spark.operators import hygiene, textstats

    combined = profile_pdf.sort_values("doc_id").reset_index(drop=True)
    originals = [
        textstats.q_token_count,
        textstats.q_lang_id,
        textstats.q_lang_id_ngram,
        textstats.q_quality_score,
        textstats.q_fingerprint,
        hygiene.q_pii_scrub,
        hygiene.q_repetition,
    ]
    seen_cols = {"doc_id"}
    for q in originals:
        part = _pdf(q, spark)
        for col in part.columns:
            if col == "doc_id":
                continue
            assert col in combined.columns, f"{col} missing from profile"
            assert combined[col].tolist() == part[col].tolist(), col
            seen_cols.add(col)
    # and nothing else: the profile is exactly the union of the six
    assert seen_cols == set(combined.columns)


def test_profile_single_scan_no_shuffle(spark):
    from tablestructurerec_spark.operators.profile import q_text_profile

    # drop the presentation orderBy: the operator itself must be scan+project
    df = q_text_profile(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    # allowed exchanges: the global sort's range partitioning and
    # read_table's small-file round-robin spread; no hash shuffle (the
    # operator must stay aggregation/join-free)
    body = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert body and all(
        "rangepartitioning" in ln.lower() or "roundrobin" in ln.lower()
        for ln in body
    ), plan


def test_presentation_order_survives_early_sort(spark):
    # Round-5 perf fix (VERDICT r4 #6): the presentation sort moved BELOW
    # the 28-expression projection (orderBy's range sampling re-executed
    # the whole pipeline: 22.1 s -> 8.4 s at sf1).  The driver's value hash
    # is order-sensitive, so the delivered row order must still be strictly
    # doc_id-ascending through the narrow projection above the Sort.
    from tablestructurerec_spark.operators.profile import q_text_profile

    ids = [r["doc_id"] for r in q_text_profile(spark, SF_DIR).select("doc_id").collect()]
    assert ids == sorted(ids) and len(ids) > 0


def test_driver_registration_is_capped_and_flagships_first():
    import __spark_entry__ as e

    qs = list(e.queries())
    assert len(qs) <= 50, "driver surfaces at most 50 correctness rows"
    assert qs[:5] == [
        "flagship_extract",
        "s1_clean_turns",
        "flagship_cells",
        "teds_eval",
        "reocr_merge",
    ]
    # absorbed queries must not be double-registered
    for dropped in (
        "t_token_count",
        "t_lang_id",
        "t_quality_score",
        "t_fingerprint",
        "t_pii_scrub",
        "t_repetition",
        "a1_sessionize",
        "a10_salted_agg",
    ):
        assert dropped not in qs
