"""Decode math + batched inference stage tests.

The decode functions were cross-validated offline against the reference's
ctdet_4ps_decode (utils_table_lore_rec.py:96-157) on random heads — bit-level
allclose; these committed tests pin behavior on constructed heads with known
answers and drive the full Spark stage through the stub backend.
"""

import json

import numpy as np
import pytest

from tablestructurerec_spark.inference.decode import (
    decode_quads,
    peak_nms,
    select_detections,
    sigmoid,
    topk,
    two_stage_topk,
    unwarp_coords,
)
from tablestructurerec_spark.inference.runner import StubBackend
from tablestructurerec_spark.core.lore_post import snap_and_round_logic


def test_topk_sorted_desc():
    vals, idx = topk(np.array([[3.0, 9.0, 1.0, 7.0, 5.0]]), 3)
    assert vals.tolist() == [[9.0, 7.0, 5.0]]
    assert idx.tolist() == [[1, 3, 4]]


def test_peak_nms_suppresses_non_maxima():
    h = np.zeros((1, 1, 5, 5))
    h[0, 0, 2, 2] = 1.0
    h[0, 0, 2, 3] = 0.6  # adjacent, smaller → suppressed
    h[0, 0, 0, 0] = 0.4  # isolated corner → kept
    out = peak_nms(h)
    assert out[0, 0, 2, 2] == 1.0 and out[0, 0, 2, 3] == 0.0 and out[0, 0, 0, 0] == 0.4


def test_two_stage_topk_coords():
    h = np.zeros((1, 1, 8, 8))
    h[0, 0, 3, 5] = 0.9
    h[0, 0, 6, 1] = 0.8
    scores, inds, clses, ys, xs = two_stage_topk(h, 2)
    assert xs[0].tolist() == [5.0, 1.0]
    assert [int(y) for y in ys[0]] == [3, 6]


def test_stub_roundtrip_through_real_decode():
    logic = [[0, 0, 0, 0], [0, 0, 1, 2], [1, 1, 0, 1], [1, 1, 2, 2]]
    heads = StubBackend()(json.dumps({"logic_points": logic}).encode())
    dets, feat = decode_quads(heads, k=3000)
    quads, logic_feat, scores = select_detections(dets, feat)
    assert len(quads) == len(logic)
    assert snap_and_round_logic(logic_feat).tolist() == logic
    assert np.all(scores >= 0.85)
    # quads are the stub's feature-space cells; unwarp scales by 768/192 = 4
    img_quads = unwarp_coords(quads, 768.0, 192, 192)
    assert img_quads[0][0].tolist() == [0.0, 0.0]
    assert img_quads[0][2].tolist() == [30.0 * 4, 10.0 * 4]


@pytest.mark.usefixtures("spark")
def test_structure_infer_stage(spark):
    from tablestructurerec_spark.inference.runner import structure_infer

    rows = []
    specs = {}
    for i, logic in enumerate(
        [[[0, 0, 0, 0]], [[0, 0, 0, 1], [1, 1, 0, 0], [1, 1, 1, 1]]]
    ):
        payload = json.dumps({"logic_points": logic}).encode()
        rows.append((f"c{i}", i, 0, bytearray(payload)))
        specs[(f"c{i}", i)] = logic
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, table_idx int, payload binary"
    )
    out = {(r.conv_id, r.turn_idx): r for r in structure_infer(df).collect()}
    for key, logic in specs.items():
        assert out[key].logic_points == logic
        assert out[key].n_cells == len(logic)
        assert out[key].mean_score > 0.85


def test_wired_structure_infer_stage(spark):
    """Class-mask payloads → wired_structure_infer (mapInPandas over the full
    M6 postprocess) recovers the drawn grid's logic points, upright and
    skewed."""
    import numpy as np

    from tablestructurerec_spark.core.cells_from_lines import raster_segments
    from tablestructurerec_spark.core.morphology import rotate_mask
    from tablestructurerec_spark.inference.runner import (
        pack_class_mask,
        wired_structure_infer,
    )

    def grid_mask(angle):
        shape = (300, 360)
        rows = [(40, 40 + r * 40, 40 + 4 * 60, 40 + r * 40) for r in range(4)]
        cols = [(40 + c * 60, 40, 40 + c * 60, 40 + 3 * 40) for c in range(5)]
        hm = raster_segments(shape, rows, 2)
        vm = raster_segments(shape, cols, 2)
        if angle:
            hm = rotate_mask(hm, -angle)
            vm = rotate_mask(vm, -angle)
        pred = np.zeros(shape, dtype=np.uint8)
        pred[hm] = 1
        pred[vm] = 2
        return pred

    rows = [
        ("c0", 0, 0, pack_class_mask(grid_mask(0.0))),
        ("c0", 1, 0, pack_class_mask(grid_mask(5.0))),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, table_idx int, payload binary"
    )
    out = {r.turn_idx: r for r in wired_structure_infer(df).collect()}
    assert set(out) == {0, 1}
    for ti in (0, 1):
        r = out[ti]
        assert r.n_cells == 12, (ti, r.n_cells)
        logic = np.asarray(r.logic_points)
        assert logic[:, 1].max() == 2 and logic[:, 3].max() == 3
        assert len(r.cell_quads) == 12 and len(r.cell_quads[0]) == 8


def test_lore_preprocess_matches_reference_arithmetic():
    """M1 (ref table_structure_lore.py:35-55): upper-left warp with scale
    768/max(h,w), zero border, /255 then LORE mean/std, NCHW."""
    import numpy as np

    from tablestructurerec_spark.inference.runner import (
        LORE_MEAN,
        LORE_STD,
        lore_preprocess,
    )

    img = np.full((400, 200, 3), 128, dtype=np.uint8)
    info = lore_preprocess(img)
    x, meta = info["img"], info["meta"]
    assert x.shape == (1, 3, 768, 768) and x.dtype == np.float32
    assert meta["s"] == 400.0 and meta["out_width"] == 192 and meta["out_height"] == 192
    want_in = (128 / 255.0 - LORE_MEAN.ravel()) / LORE_STD.ravel()
    want_border = (0.0 - LORE_MEAN.ravel()) / LORE_STD.ravel()
    # inside the mapped region (x < 200 * 768/400 = 384)
    assert np.allclose(x[0, :, 100, 100], want_in, atol=1e-6)
    # zero-border region normalizes too (warp happens before normalize)
    assert np.allclose(x[0, :, 100, 500], want_border, atol=1e-6)
    # warpAffine mapping has no half-pixel shift: dst(0,0) == src(0,0)
    img2 = np.zeros((100, 100, 3), dtype=np.uint8)
    img2[0, 0] = 255
    x2 = lore_preprocess(img2)["img"]
    assert np.allclose(
        x2[0, :, 0, 0], (1.0 - LORE_MEAN.ravel()) / LORE_STD.ravel(), atol=1e-6
    )


def test_decode_heads_honors_backend_meta_span():
    """A backend that returns warp meta (the onnx contract) must unwarp with
    the per-image span instead of the fixed stub feature space."""
    import json

    import numpy as np

    from tablestructurerec_spark.inference.runner import StubBackend, decode_heads

    payload = json.dumps({"logic_points": [[0, 0, 0, 0]]}).encode()
    stub = StubBackend()
    q_base, l_base, _ = decode_heads(stub(payload))
    heads = stub(payload)
    heads["meta"] = {"s": 1536.0, "out_width": 192, "out_height": 192}
    q_meta, l_meta, _ = decode_heads(heads)
    # span 1536 vs the stub's 768 -> coordinates exactly 2x, logic unchanged
    assert np.allclose(np.asarray(q_meta), np.asarray(q_base) * 2.0)
    assert np.array_equal(l_meta, l_base)
