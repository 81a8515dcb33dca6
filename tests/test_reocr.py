"""Re-OCR hook plan: selection predicate, crop geometry, schema."""

import numpy as np

from tablestructurerec_spark.core.morphology import perspective_crop
from tablestructurerec_spark.inference.runner import pack_class_mask, unpack_class_mask
from tablestructurerec_spark.plans.reocr import REOCR_SCHEMA, low_confidence_cells


def _img():
    # deterministic gradient so crop content is checkable
    y, x = np.mgrid[0:120, 0:200]
    return ((x + y) % 256).astype(np.uint8)


def _cells(spark):
    rows = [
        # axis-aligned quad [tl,tr,br,bl]; empty text -> qualifies
        ("c", 1, 0, 0, [10.0, 10.0, 90.0, 10.0, 90.0, 50.0, 10.0, 50.0], 0.9, ""),
        # confident + has text -> excluded
        ("c", 1, 0, 1, [100.0, 10.0, 180.0, 10.0, 180.0, 50.0, 100.0, 50.0], 0.95, "ok"),
        # low score -> qualifies
        ("c", 1, 0, 2, [10.0, 60.0, 90.0, 60.0, 90.0, 100.0, 10.0, 100.0], 0.4, "x"),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, table_idx int, cell_id int, "
        "quad array<double>, score double, text string",
    )


def test_low_confidence_cells_selection_and_crop(spark):
    img = _img()
    images = spark.createDataFrame(
        [("c", 1, bytearray(pack_class_mask(img)))],
        "conv_id string, turn_idx int, payload binary",
    )
    out = low_confidence_cells(_cells(spark), images).collect()
    assert sorted(r.cell_id for r in out) == [0, 2]
    by_id = {r.cell_id: r for r in out}
    # crop dims: quad 80x40 -> perspective_crop 80x40 -> +2*10 pad
    r0 = by_id[0]
    assert (r0.crop_h, r0.crop_w) == (60, 100)
    got = unpack_class_mask(r0.crop)
    want = np.pad(
        perspective_crop(img, np.array([[10, 10], [90, 10], [90, 50], [10, 50]], float)),
        [(10, 10), (10, 10)],
        constant_values=255,
    )
    assert np.array_equal(got, want)
    # white border present
    assert got[0, :].min() == 255 and got[:, 0].min() == 255
    # schema contract for the downstream OCR stage
    df = low_confidence_cells(_cells(spark), images)
    assert df.schema.simpleString() == (
        "struct<" + REOCR_SCHEMA.replace(", ", ",").replace(" arr", ":arr")
        .replace("conv_id string", "conv_id:string")
        .replace("turn_idx int", "turn_idx:int")
        .replace("table_idx int", "table_idx:int")
        .replace("cell_id int", "cell_id:int")
        .replace("crop binary", "crop:binary")
        .replace("crop_h int", "crop_h:int")
        .replace("crop_w int", "crop_w:int") + ">"
    )


def test_tall_cell_rot90_rule(spark):
    """h/w >= 1.5 crops rotate 90 degrees (ref get_rotate_crop_image tail)."""
    img = _img()
    images = spark.createDataFrame(
        [("c", 1, bytearray(pack_class_mask(img)))],
        "conv_id string, turn_idx int, payload binary",
    )
    cells = spark.createDataFrame(
        [("c", 1, 0, 0, [10.0, 10.0, 40.0, 10.0, 40.0, 100.0, 10.0, 100.0], 0.1, "")],
        "conv_id string, turn_idx int, table_idx int, cell_id int, "
        "quad array<double>, score double, text string",
    )
    r = low_confidence_cells(cells, images).collect()[0]
    # 30x90 quad -> rot90 -> 90x30 -> padded 50x110
    assert (r.crop_h, r.crop_w) == (50, 110)


def test_re_rec_default_mode_merges_and_passes_through(spark):
    """Blank/low-score cells get rec lines; confident cells untouched;
    all-white crops fall back to (quad-box, "", 1.0) — reference
    wired_table_rec/main.py:212-215."""
    from tablestructurerec_spark.plans.reocr import re_rec

    img = _img()
    # paint cell 2's region solid white so the fake engine returns no rec
    img[60:100, 10:90] = 255
    images = spark.createDataFrame(
        [("c", 1, bytearray(pack_class_mask(img)))],
        "conv_id string, turn_idx int, payload binary",
    )
    out = {r.cell_id: r for r in re_rec(_cells(spark), images, engine="fake").collect()}
    assert len(out) == 3
    # cell 1: confident -> untouched, not rerecognized
    assert out[1].text == "ok" and out[1].score == 0.95 and not out[1].rerecognized
    # cell 0: blank, crop has content -> fake rec text, deterministic
    assert out[0].rerecognized and out[0].text.startswith("rec:60x100:")
    assert 0.0 < out[0].score <= 1.0
    # cell 2: selected but white crop -> fill-blank fallback
    assert out[2].rerecognized and out[2].text == "" and out[2].score == 1.0
    assert out[2].ocr_box == [10.0, 60.0, 90.0, 100.0]  # quad -> axis box


def test_re_rec_high_precise_redoes_every_cell(spark):
    """re_rec_high_precise resets the map and re-runs ALL cells
    (reference main.py:203-207)."""
    from tablestructurerec_spark.plans.reocr import re_rec

    images = spark.createDataFrame(
        [("c", 1, bytearray(pack_class_mask(_img())))],
        "conv_id string, turn_idx int, payload binary",
    )
    out = {r.cell_id: r for r in
           re_rec(_cells(spark), images, high_precise=True).collect()}
    assert all(out[i].rerecognized for i in (0, 1, 2))
    # even the previously-confident cell 1 got a fresh rec line
    assert out[1].text.startswith("rec:")


def test_recognize_crops_unknown_engine_raises(spark):
    from tablestructurerec_spark.plans.reocr import recognize_crops
    import pytest

    images = spark.createDataFrame(
        [("c", 1, bytearray(pack_class_mask(_img())))],
        "conv_id string, turn_idx int, payload binary",
    )
    df = recognize_crops(low_confidence_cells(_cells(spark), images), engine="nope")
    with pytest.raises(Exception, match="unknown OCR engine"):
        df.collect()


def test_apply_reocr_multiline_cell_yields_multiple_rows(spark):
    """One crop can produce several det lines (main.py:216-218) -> several
    output rows for that cell, each carrying its own box/text/score."""
    from tablestructurerec_spark.plans.reocr import apply_reocr

    cells = _cells(spark)
    recs = spark.createDataFrame(
        [
            ("c", 1, 0, 0, [0.0, 0.0, 50.0, 20.0], "line1", 0.9),
            ("c", 1, 0, 0, [0.0, 20.0, 50.0, 40.0], "line2", 0.8),
        ],
        "conv_id string, turn_idx int, table_idx int, cell_id int, "
        "ocr_box array<double>, rec_text string, rec_score double",
    )
    rows = apply_reocr(cells, recs).collect()
    cell0 = sorted((r.text for r in rows if r.cell_id == 0))
    assert cell0 == ["line1", "line2"]
    assert len(rows) == 4  # 2 lines for cell 0 + passthrough 1 + fallback 2


def test_rapidocr_engine_registered_and_lazy():
    """The rapidocr adapter is registered unconditionally but imports
    lazily — absent wheel -> clean ImportError at construction, never at
    module import."""
    from tablestructurerec_spark.plans import reocr

    assert "rapidocr" in reocr.OCR_ENGINES
    try:
        import rapidocr  # noqa: F401
    except ImportError:
        import pytest

        with pytest.raises(ImportError):
            reocr.OCR_ENGINES["rapidocr"]()


def test_re_rec_missing_image_falls_back(spark):
    """A selected cell whose turn has no image payload can't be cropped
    (inner join drops it from the OCR stage) but still gets the fill-blank
    row in the merged output — the loop degrades gracefully instead of
    erroring like the reference's in-process crop would."""
    from tablestructurerec_spark.plans.reocr import re_rec

    images = spark.createDataFrame(
        [], "conv_id string, turn_idx int, payload binary"
    )
    out = {r.cell_id: r for r in re_rec(_cells(spark), images).collect()}
    assert len(out) == 3
    assert out[1].text == "ok" and not out[1].rerecognized  # untouched
    for cid in (0, 2):  # selected, no crop possible -> fill-blank
        assert out[cid].rerecognized
        assert out[cid].text == "" and out[cid].score == 1.0


def test_null_score_selects_consistently(spark):
    """NULL score = unknown confidence -> selected for re-OCR in BOTH the
    crop stage and the merge-back (a mismatch would silently clobber the
    cell's text with the fill-blank row without ever cropping it)."""
    from tablestructurerec_spark.plans.reocr import re_rec

    img = _img()
    images = spark.createDataFrame(
        [("c", 1, bytearray(pack_class_mask(img)))],
        "conv_id string, turn_idx int, payload binary",
    )
    cells = spark.createDataFrame(
        [("c", 1, 0, 0, [10.0, 10.0, 90.0, 10.0, 90.0, 50.0, 10.0, 50.0], None, "txt")],
        "conv_id string, turn_idx int, table_idx int, cell_id int, "
        "quad array<double>, score double, text string",
    )
    (r,) = re_rec(cells, images).collect()
    assert r.rerecognized and r.text.startswith("rec:")  # cropped AND rec'd


def test_custom_engine_factory_via_closure(spark):
    """A factory CALLABLE travels in the task closure — the supported way
    to use a custom engine without import-time registration on workers."""
    from tablestructurerec_spark.plans.reocr import re_rec

    def factory():
        def run(img):
            return [((0.0, 0.0, 1.0, 1.0), "custom", 0.5)]

        return run

    images = spark.createDataFrame(
        [("c", 1, bytearray(pack_class_mask(_img())))],
        "conv_id string, turn_idx int, payload binary",
    )
    out = {r.cell_id: r for r in re_rec(_cells(spark), images, engine=factory).collect()}
    assert out[0].text == "custom" and out[0].rerecognized


def test_factory_cache_distinguishes_configurations(spark):
    """Two differently-configured factories from the same code path must
    not share a cached engine (closure-bytes keying, not __qualname__)."""
    from tablestructurerec_spark.plans.reocr import re_rec

    def make_engine(tag):
        def factory():
            def run(img):
                return [((0.0, 0.0, 1.0, 1.0), f"tag:{tag}", 0.5)]

            return run

        return factory

    images = spark.createDataFrame(
        [("c", 1, bytearray(pack_class_mask(_img())))],
        "conv_id string, turn_idx int, payload binary",
    )
    cells = _cells(spark)
    a = {r.cell_id: r.text for r in re_rec(cells, images, engine=make_engine("en")).collect()}
    b = {r.cell_id: r.text for r in re_rec(cells, images, engine=make_engine("ch")).collect()}
    assert a[0] == "tag:en" and b[0] == "tag:ch"


def test_registered_factory_construction_error_surfaces():
    """A KeyError inside the factory body must surface as itself, not be
    mislabeled 'unknown OCR engine'."""
    import pytest

    from tablestructurerec_spark.plans.reocr import (
        _OCR_CACHE,
        _get_ocr,
        register_ocr_engine,
    )

    def bad_factory():
        return {}["model_path"]  # KeyError from construction

    register_ocr_engine("bad_for_test", bad_factory)
    try:
        with pytest.raises(KeyError, match="model_path"):
            _get_ocr("bad_for_test")
    finally:
        from tablestructurerec_spark.plans import reocr

        reocr.OCR_ENGINES.pop("bad_for_test", None)
        _OCR_CACHE.pop("bad_for_test", None)
