"""Distributional cross-execution against the reference's own line utilities.

The golden tests pin literal cases; this extracts the cv2-free functions
from /root/reference/wired_table_rec/utils/utils_table_line_rec.py by AST
(the module itself imports cv2/skimage at top level, absent here) and
checks exact agreement on hundreds of random inputs.  Skipped when the
reference snapshot is not mounted.
"""

import ast
import copy
import math
import os
import random

import numpy as np
import pytest

REF = "/root/reference/wired_table_rec/utils/utils_table_line_rec.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")

_WANTED = {
    "adjust_lines",
    "final_adjust_lines",
    "line_to_line",
    "fit_line",
    "point_line_cor",
    "sqrt",
}


@pytest.fixture(scope="module")
def ref_ns():
    tree = ast.parse(open(REF).read())
    ns = {"math": math, "np": np, "copy": copy}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in _WANTED:
            exec(compile(ast.Module([node], []), "<ref>", "exec"), ns)
    assert _WANTED <= set(ns)
    return ns


def _rand_lines(rng, n, horizontal):
    out = []
    for _ in range(n):
        x = rng.uniform(0, 400)
        y = rng.uniform(0, 300)
        length = rng.uniform(30, 150)
        if horizontal:
            out.append((x, y, x + length, y + rng.uniform(-4, 4)))
        else:
            out.append((x, y, x + rng.uniform(-4, 4), y + length))
    return out


def test_adjust_lines_matches_reference(ref_ns):
    from tablestructurerec_spark.core.lines import adjust_lines

    rng = random.Random(0)
    for _ in range(300):
        lines = _rand_lines(rng, rng.randint(2, 8), rng.random() < 0.5)
        alph = rng.choice([15, 50, 100])
        ref_out = ref_ns["adjust_lines"]([tuple(l) for l in lines], alph=alph, angle=50)
        my_out = adjust_lines(lines, alph=alph, angle=50)
        assert [tuple(map(float, t)) for t in ref_out] == [
            tuple(map(float, t)) for t in my_out
        ]


def test_line_to_line_matches_reference(ref_ns):
    from tablestructurerec_spark.core.lines import line_to_line

    rng = random.Random(1)
    for _ in range(300):
        r = _rand_lines(rng, 1, True)[0]
        c = _rand_lines(rng, 1, False)[0]
        ref_out = ref_ns["line_to_line"](list(r), list(c), alpha=20, angle=30)
        my_out = line_to_line(list(r), list(c), alpha=20, angle=30)
        assert np.allclose(np.asarray(ref_out, float), np.asarray(my_out, float), atol=1e-9)


def test_final_adjust_lines_matches_reference(ref_ns):
    from tablestructurerec_spark.core.lines import final_adjust_lines

    rng = random.Random(2)
    for _ in range(100):
        rows = [list(l) for l in _rand_lines(rng, rng.randint(1, 5), True)]
        cols = [list(l) for l in _rand_lines(rng, rng.randint(1, 5), False)]
        ref_r, ref_c = ref_ns["final_adjust_lines"](copy.deepcopy(rows), copy.deepcopy(cols))
        my_r, my_c = final_adjust_lines(copy.deepcopy(rows), copy.deepcopy(cols))
        assert np.allclose(np.asarray(ref_r, float), np.asarray(my_r, float), atol=1e-9)
        assert np.allclose(np.asarray(ref_c, float), np.asarray(my_c, float), atol=1e-9)


def test_fit_line_and_side_match_reference(ref_ns):
    from tablestructurerec_spark.core.lines import fit_line, point_line_side

    rng = random.Random(3)
    for _ in range(300):
        p1 = (rng.uniform(0, 100), rng.uniform(0, 100))
        p2 = (rng.uniform(0, 100), rng.uniform(0, 100))
        assert np.allclose(ref_ns["fit_line"]([p1, p2]), fit_line([p1, p2]), atol=1e-12)
        a, b, c = fit_line([p1, p2])
        p = (rng.uniform(0, 100), rng.uniform(0, 100))
        assert np.isclose(
            ref_ns["point_line_cor"](np.array(p), a, b, c),
            point_line_side(p, a, b, c),
            atol=1e-9,
        )


def test_table_recover_matches_reference_on_synth_grids():
    """recover_logic_points vs the reference TableRecover (numpy-only module)
    on every multi-column table the synthetic grammar emits + jittered
    variants."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_tr", "/root/reference/wired_table_rec/table_recover.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from tablestructurerec_spark.core.html_parse import (
        extract_turn,
        quads_from_logic_points,
    )
    from tablestructurerec_spark.core.recover import recover_logic_points
    from tablestructurerec_spark.sources.synthetic import _rows_for_conv

    rng = np.random.default_rng(4)
    n = div = 0
    for conv in range(120):
        for text in _rows_for_conv(42, conv, 6)["text"]:
            for lp, _texts in extract_turn(text)[1]:
                lp = np.asarray(lp)
                if not lp.size or lp[:, 3].max() == 0:
                    continue
                quads = np.asarray(quads_from_logic_points(lp), dtype=float)
                quads = quads + rng.uniform(-2.0, 2.0, size=quads.shape)
                mine = np.asarray(recover_logic_points(quads))
                _, reflp = ref.TableRecover()(quads.reshape(-1, 4, 2))
                n += 1
                if not np.array_equal(reflp, mine):
                    div += 1
    assert n > 200 and div == 0, (n, div)


# ---------------------------------------------------------------------------
# lineless utils (text-equality-critical: W1 sort, A5 gather, D1 dedup,
# J1 match, F2 render, P1-P4 predicates)
# ---------------------------------------------------------------------------
REF_LL = "/root/reference/lineless_table_rec/utils/utils_table_recover.py"

_LL_WANTED = {
    "sorted_boxes",
    "filter_duplicated_box",
    "calculate_iou",
    "caculate_single_axis_iou",
    "is_box_contained",
    "is_single_axis_contained",
    "sorted_ocr_boxes",
    "gather_ocr_list_by_row",
    "match_ocr_cell",
    "plot_html_table",
    "box_4_1_poly_to_box_4_2",
    "box_4_2_poly_to_box_4_1",
}


@pytest.fixture(scope="module")
def ll_ns():
    tree = ast.parse(open(REF_LL).read())
    from typing import Any, Dict, List, Optional, Set, Tuple, Union

    ns = {
        "math": math, "np": np, "copy": copy, "random": random,
        "Any": Any, "Dict": Dict, "List": List, "Optional": Optional,
        "Set": Set, "Tuple": Tuple, "Union": Union,
    }
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in _LL_WANTED:
            exec(compile(ast.Module([node], []), "<ref_ll>", "exec"), ns)
    assert _LL_WANTED <= set(ns)
    return ns


def _rand_boxes(rng, n):
    out = []
    for _ in range(n):
        x0 = rng.uniform(0, 300)
        y0 = rng.uniform(0, 200)
        out.append([x0, y0, x0 + rng.uniform(5, 80), y0 + rng.uniform(4, 30)])
    return out


def test_geometry_predicates_match_reference(ll_ns):
    from tablestructurerec_spark.core.geometry import (
        axis_contained_side,
        axis_iou,
        box_iou,
        contained_side,
    )

    rng = random.Random(5)
    for _ in range(500):
        a = _rand_boxes(rng, 1)[0]
        b = _rand_boxes(rng, 1)[0]
        assert np.isclose(ll_ns["calculate_iou"](a, b), box_iou(a, b), atol=1e-12)
        for axis in ("x", "y"):
            assert np.isclose(
                ll_ns["caculate_single_axis_iou"](a, b, axis), axis_iou(a, b, axis), atol=1e-12
            )
            assert ll_ns["is_single_axis_contained"](a, b, axis) == axis_contained_side(a, b, axis)
        assert ll_ns["is_box_contained"](a, b) == contained_side(a, b)


def test_sorted_ocr_boxes_matches_reference(ll_ns):
    from tablestructurerec_spark.core.geometry import reading_order

    rng = random.Random(6)
    for _ in range(300):
        boxes = _rand_boxes(rng, rng.randint(1, 12))
        ref_boxes, ref_idx = ll_ns["sorted_ocr_boxes"](boxes)
        _my_boxes, my_idx = reading_order(np.asarray(boxes))
        assert list(ref_idx) == list(my_idx)


def test_filter_duplicated_box_matches_reference(ll_ns):
    from tablestructurerec_spark.core.geometry import duplicate_box_indices

    rng = random.Random(7)
    for _ in range(300):
        boxes = _rand_boxes(rng, rng.randint(2, 10))
        # salt in real overlaps so the dedup predicates actually fire
        if rng.random() < 0.7:
            src = rng.randrange(len(boxes))
            dup = list(boxes[src])
            for k in range(4):
                dup[k] += rng.uniform(-2, 2)
            boxes.append(dup)
        assert ll_ns["filter_duplicated_box"]([list(b) for b in boxes]) == set(
            duplicate_box_indices(np.asarray(boxes, dtype=float))
        )


def test_gather_ocr_list_by_row_matches_reference(ll_ns):
    from tablestructurerec_spark.core.geometry import gather_ocr_rows

    rng = random.Random(8)
    for _ in range(300):
        items = []
        y = 10.0
        for _r in range(rng.randint(1, 4)):
            x = 5.0
            for _f in range(rng.randint(1, 4)):
                w = rng.uniform(10, 60)
                items.append([[x, y, x + w, y + rng.uniform(6, 12)], f"t{rng.randint(0,99)}"])
                x += w + rng.uniform(0, 40)
            y += rng.uniform(14, 40)
        ref_out = ll_ns["gather_ocr_list_by_row"](copy.deepcopy(items))
        my_out = gather_ocr_rows(copy.deepcopy(items))
        assert [(list(map(float, b)), t) for b, t in ref_out] == [
            (list(map(float, b)), t) for b, t in my_out
        ]


def test_match_ocr_cell_matches_reference(ll_ns):
    from tablestructurerec_spark.core.geometry import match_ocr_to_cells

    rng = random.Random(9)
    for _ in range(200):
        cells = []
        for r in range(rng.randint(1, 3)):
            for c in range(rng.randint(1, 4)):
                x0, y0 = c * 80.0, r * 40.0
                cells.append([[x0, y0], [x0 + 78, y0], [x0 + 78, y0 + 38], [x0, y0 + 38]])
        ocr = []
        for _f in range(rng.randint(1, 6)):
            cx = rng.uniform(0, 300)
            cy = rng.uniform(0, 110)
            w, h = rng.uniform(8, 60), rng.uniform(5, 20)
            box = [[cx, cy], [cx + w, cy], [cx + w, cy + h], [cx, cy + h]]
            ocr.append([box, f"w{rng.randint(0,9)}", 0.9])
        ref_match, _ = ll_ns["match_ocr_cell"](copy.deepcopy(ocr), np.asarray(cells))
        my_match, _my_unmatched = match_ocr_to_cells(copy.deepcopy(ocr), np.asarray(cells))
        assert {k: [r[1] for r in v] for k, v in ref_match.items()} == {
            k: [r[1] for r in v] for k, v in my_match.items()
        }


def test_plot_html_table_matches_reference(ll_ns):
    from tablestructurerec_spark.core.html_render import render_table_html
    from tablestructurerec_spark.core.html_parse import parse_table_html  # noqa: F401

    rng = random.Random(10)
    for _ in range(200):
        nrows, ncols = rng.randint(1, 5), rng.randint(1, 5)
        taken = [[False] * ncols for _ in range(nrows)]
        logic = []
        for r in range(nrows):
            c = 0
            while c < ncols:
                if taken[r][c]:
                    c += 1
                    continue
                span_c = rng.randint(1, min(2, ncols - c))
                span_r = rng.randint(1, min(2, nrows - r))
                ok = all(
                    not taken[rr][cc]
                    for rr in range(r, r + span_r)
                    for cc in range(c, c + span_c)
                )
                if not ok:
                    span_c = span_r = 1
                for rr in range(r, r + span_r):
                    for cc in range(c, c + span_c):
                        taken[rr][cc] = True
                logic.append([r, r + span_r - 1, c, c + span_c - 1])
                c += span_c
        # randomly drop some cells to exercise the empty-slot path
        keep = [i for i in range(len(logic)) if rng.random() > 0.15] or [0]
        logic_kept = [logic[i] for i in keep]
        contents = {}
        for i in range(len(logic_kept)):
            roll = rng.random()
            if roll < 0.15:
                continue  # no entry at all -> the render-nothing quirk
            if roll < 0.3:
                contents[i] = [""]  # empty text -> excluded from valid window
            else:
                contents[i] = [f"cell{i}l{j}" for j in range(rng.randint(1, 3))]
        ref_html = ll_ns["plot_html_table"](
            np.asarray(logic_kept, dtype=np.int32), copy.deepcopy(contents)
        )
        my_html = render_table_html(
            np.asarray(logic_kept, dtype=np.int32), copy.deepcopy(contents)
        )
        assert ref_html == my_html


# ---------------------------------------------------------------------------
# CycleCenterNet path: quad NMS + grid-vertex snapping (cv2-free in ref)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ccnet_ns():
    class _Dist:  # scipy.spatial.distance shim (absent here): exact cdist math
        @staticmethod
        def cdist(a, b, metric="euclidean"):
            a = np.asarray(a, float)
            b = np.asarray(b, float)
            return np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(-1))

    tree = ast.parse(open(REF).read())
    ns = {"math": math, "np": np, "copy": copy, "dist": _Dist}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in {"nms", "group_bbox_by_gbox"}:
            exec(compile(ast.Module([node], []), "<ref_ccnet>", "exec"), ns)
    assert {"nms", "group_bbox_by_gbox"} <= set(ns)
    return ns


def _rand_quad_dets(rng, n):
    rows = []
    for _ in range(n):
        x0 = rng.uniform(0, 200)
        y0 = rng.uniform(0, 150)
        w = rng.uniform(15, 60)
        h = rng.uniform(10, 40)
        rows.append([x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h, rng.uniform(0, 1)])
    rows.sort(key=lambda r: -r[-1])
    return np.asarray(rows, dtype=float)


def test_quad_nms_matches_reference(ccnet_ns):
    from tablestructurerec_spark.core.wired_lines import quad_nms

    rng = random.Random(11)
    for _ in range(300):
        dets = _rand_quad_dets(rng, rng.randint(2, 12))
        ref_out = np.asarray(ccnet_ns["nms"](dets.copy(), 0.3))
        my_out = np.asarray(quad_nms(dets.copy(), 0.3))
        assert ref_out.shape == my_out.shape and np.allclose(
            ref_out.reshape(-1), my_out.reshape(-1), atol=1e-12
        )


def test_snap_cells_to_grid_matches_reference(ccnet_ns):
    from tablestructurerec_spark.core.wired_lines import snap_cells_to_grid

    rng = random.Random(12)
    for _ in range(200):
        cells = _rand_quad_dets(rng, rng.randint(1, 6))
        grows = []
        for _g in range(rng.randint(1, 5)):
            vx, vy = rng.uniform(0, 220), rng.uniform(0, 170)
            centers = [
                (vx + rng.uniform(-25, 25), vy + rng.uniform(-20, 20)) for _ in range(4)
            ]
            grows.append([vx, vy, *sum(([cx, cy] for cx, cy in centers), []), rng.uniform(0, 1)])
        grows.sort(key=lambda r: -r[-1])
        gboxes = np.asarray(grows, dtype=float)
        ref_out = np.asarray(ccnet_ns["group_bbox_by_gbox"](cells.copy(), gboxes.copy()))
        my_out = np.asarray(snap_cells_to_grid(cells.copy(), gboxes.copy()))
        assert np.allclose(ref_out.reshape(-1), my_out.reshape(-1), atol=1e-12)


# ---------------------------------------------------------------------------
# M4 — LORE CenterNet 4-point decode on random heads
# ---------------------------------------------------------------------------
REF_LORE = "/root/reference/lineless_table_rec/utils/utils_table_lore_rec.py"

_LORE_WANTED = {
    "ctdet_4ps_decode",
    "_nms",
    "max_pool",
    "_topk",
    "find_topk",
    "_gather_feat",
    "_gather",
    "_tranpose_and_gather_feat",
    "_get_4ps_feat",
}


@pytest.fixture(scope="module")
def lore_ns():
    from typing import Dict, List, Tuple, Union

    tree = ast.parse(open(REF_LORE).read())
    ns = {
        "math": math, "np": np, "copy": copy,
        "Dict": Dict, "List": List, "Tuple": Tuple, "Union": Union,
    }
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in _LORE_WANTED:
            exec(compile(ast.Module([node], []), "<ref_lore>", "exec"), ns)
    assert _LORE_WANTED <= set(ns)
    return ns


@pytest.mark.parametrize("seed", range(5))
def test_decode_quads_matches_reference_on_random_heads(lore_ns, seed):
    from tablestructurerec_spark.inference.decode import decode_quads, sigmoid

    rng = np.random.default_rng(seed)
    b, h, w, d, k = 1, 24, 32, 4, 20
    heads = {
        "hm": rng.normal(size=(b, 2, h, w)) * 3,
        "wh": rng.normal(size=(b, 8, h, w)) * 4,
        "ax": rng.normal(size=(b, d, h, w)),
        "cr": rng.normal(size=(b, d, h, w)),
        "reg": rng.normal(size=(b, 2, h, w)) * 0.3,
    }
    # ref returns (detections, keep, ax, cr_feat); the caller then does
    # logi = ax + cr_feat (DetProcess.__call__, utils_table_lore_rec.py:22-55)
    ref_dets, _keep, ref_ax, ref_cr = lore_ns["ctdet_4ps_decode"](
        sigmoid(heads["hm"])[:, 0:1, :, :].copy(),
        heads["wh"].copy(),
        heads["ax"].copy(),
        heads["cr"].copy(),
        reg=heads["reg"].copy(),
        K=k,
    )
    ref_logic = np.asarray(ref_ax, float) + np.asarray(ref_cr, float)
    my_dets, my_logic = decode_quads({k2: v.copy() for k2, v in heads.items()}, k=k)
    assert np.allclose(np.asarray(ref_dets, float), my_dets, atol=1e-9), seed
    assert np.allclose(np.asarray(ref_logic, float), my_logic, atol=1e-9), seed


# ---------------------------------------------------------------------------
# M5 preprocess — rescale_size arithmetic (exact) vs reference + goldens
# ---------------------------------------------------------------------------
REF_UTILS = "/root/reference/wired_table_rec/utils/utils.py"


@pytest.fixture(scope="module")
def resize_ns():
    tree = ast.parse(open(REF_UTILS).read())
    ns = {"math": math, "np": np}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in {"rescale_size", "_scale_size"}:
            exec(compile(ast.Module([node], []), "<ref_resize>", "exec"), ns)
    assert {"rescale_size", "_scale_size"} <= set(ns)
    return ns


@pytest.mark.parametrize(
    "old_size, scale, expected",
    [
        # the reference's own golden cases (tests/test_wired_table_rec.py:228-244)
        ((100, 50), (300, 100), ((200, 100), 2.0)),
        ((50, 100), (100, 300), ((100, 200), 2.0)),
        ((100, 50), (200, 150), ((200, 100), 2.0)),
        ((50, 100), (150, 200), ((100, 200), 2.0)),
    ],
)
def test_rescale_size_reference_goldens(old_size, scale, expected):
    from tablestructurerec_spark.inference.resize import rescale_size

    new_size, factor = rescale_size(old_size, scale, return_scale=True)
    assert new_size == expected[0]
    assert np.isclose(factor, expected[1], atol=1e-5)


def test_rescale_size_matches_reference_random(resize_ns):
    from tablestructurerec_spark.inference.resize import rescale_size

    rng = random.Random(13)
    for _ in range(500):
        old = (rng.randint(1, 4000), rng.randint(1, 4000))
        if rng.random() < 0.5:
            scale = (rng.randint(1, 2000), rng.randint(1, 2000))
        else:
            scale = rng.uniform(0.05, 4.0)
        assert resize_ns["rescale_size"](old, scale, True) == rescale_size(old, scale, True)


def test_order_points_and_center_angle_match_reference(ccnet_ns):
    """_order_points (cdist-shimmed) and calculate_center_rotate_angle vs
    our order_quad_points / center_rotate_angle on random quads."""
    tree = ast.parse(open(REF).read())
    ns = dict(ccnet_ns)
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in {
            "_order_points",
            "calculate_center_rotate_angle",
        }:
            exec(compile(ast.Module([node], []), "<ref_op>", "exec"), ns)

    from tablestructurerec_spark.core.lines import center_rotate_angle, order_quad_points

    rng = np.random.default_rng(14)
    for _ in range(300):
        cx, cy = rng.uniform(50, 200, 2)
        w, h = rng.uniform(20, 80), rng.uniform(15, 50)
        th = rng.uniform(-0.4, 0.4)
        c, s = math.cos(th), math.sin(th)
        rect = np.array(
            [[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]]
        ) @ np.array([[c, -s], [s, c]]).T + [cx, cy]
        shuffled = rect[rng.permutation(4)]
        ref_ordered = np.asarray(ns["_order_points"](shuffled.copy()), float)
        my_ordered = np.asarray(order_quad_points(shuffled.copy()), float)
        assert np.allclose(ref_ordered, my_ordered, atol=1e-4)
        box8 = ref_ordered.reshape(8)
        ref_vals = ns["calculate_center_rotate_angle"](box8.tolist())
        my_vals = center_rotate_angle(box8.tolist())
        assert np.allclose(np.asarray(ref_vals, float), np.asarray(my_vals, float), atol=1e-9)


# ---------------------------------------------------------------------------
# A6 handle_overlap_row_col (lineless_table_rec/main.py:199-238) — extract
# the method by AST (main.py imports onnxruntime-backed modules at top
# level) and compare the grid walk on random record lists.
# ---------------------------------------------------------------------------
_A6_REF = "/root/reference/lineless_table_rec/main.py"


@pytest.fixture(scope="module")
def ref_a6():
    tree = ast.parse(open(_A6_REF).read())
    ns = {}
    for node in tree.body:
        if isinstance(node, ast.ClassDef):
            for sub in node.body:
                if isinstance(sub, ast.FunctionDef) and sub.name == "handle_overlap_row_col":
                    exec(compile(ast.Module([sub], []), "<ref-a6>", "exec"), ns)
    assert "handle_overlap_row_col" in ns
    return ns["handle_overlap_row_col"]


def _rand_records(rng, n):
    recs = []
    for i in range(n):
        r0 = rng.randrange(0, 4)
        c0 = rng.randrange(0, 4)
        r1 = r0 + rng.randrange(0, 2)
        c1 = c0 + rng.randrange(0, 2)
        x0, y0 = rng.randrange(0, 50), rng.randrange(0, 50)
        recs.append(
            {
                "t_logic_box": [r0, r1, c0, c1],
                "t_box": [x0, y0, x0 + rng.randrange(10, 60), y0 + rng.randrange(10, 60)],
                "t_ocr_res": [[[x0, y0, x0 + 5, y0 + 5], f"t{i}"]],
            }
        )
    return recs


@pytest.mark.skipif(not os.path.exists(_A6_REF), reason="reference not mounted")
def test_merge_grid_duplicates_matches_reference(ref_a6):
    from tablestructurerec_spark.core.html_render import merge_grid_duplicates

    rng = random.Random(1234)
    diverged = 0
    for _ in range(300):
        recs = _rand_records(rng, rng.randrange(1, 12))
        want, _grid = ref_a6(None, copy.deepcopy(recs))
        got = merge_grid_duplicates(copy.deepcopy(recs))
        if want != got:
            diverged += 1
    assert diverged == 0
