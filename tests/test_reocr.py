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
