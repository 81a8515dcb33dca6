"""Tests for quad NMS, grid-vertex snapping, and mask→segment extraction.

Cross-validated offline against the reference implementations
(utils_table_line_rec.py:295-418); committed cases are constructed with
known answers.
"""

import numpy as np

from tablestructurerec_spark.core.wired_lines import (
    label_components,
    mask_to_line_segments,
    quad_nms,
    snap_cells_to_grid,
)


def _quad_row(x0, y0, w, h, score):
    return [x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h, score]


def test_quad_nms_suppresses_contained_center():
    big = _quad_row(0, 0, 10, 10, 0.9)
    inside = _quad_row(3, 3, 2, 2, 0.5)  # center (4,4) inside big → dropped
    far = _quad_row(50, 50, 4, 4, 0.8)
    dets = np.array([big, far, inside])  # score-descending
    kept = quad_nms(dets, 0.3)
    assert [r[8] for r in kept] == [0.9, 0.8]


def test_quad_nms_keeps_all_when_disjoint():
    dets = np.array([_quad_row(0, 0, 4, 4, 0.9), _quad_row(10, 0, 4, 4, 0.8)])
    assert len(quad_nms(dets, 0.3)) == 2


def test_quad_nms_thresh_cut():
    dets = np.array([_quad_row(0, 0, 4, 4, 0.9), _quad_row(10, 0, 4, 4, 0.1)])
    kept = quad_nms(dets, 0.3)
    assert [r[8] for r in kept] == [0.9]


def _ccw_quad_row(x0, y0, w, h, score):
    # CCNet quad order [tl, bl, br, tr] — the order the reference's w/h
    # edge formulas (ref :378-379) assume
    return [x0, y0, x0, y0 + h, x0 + w, y0 + h, x0 + w, y0, score]


def test_snap_cells_to_grid_moves_nearest_corner():
    # cell quad with top-left near (0.4, 0.4); grid vertex at (0,0) with a
    # center inside the cell → corner snaps to the vertex
    cell = np.array([_ccw_quad_row(0.4, 0.4, 10, 10, 0.9)])
    gbox = np.array([[0.0, 0.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 0.9]])
    out = snap_cells_to_grid(cell, gbox)
    assert out[0][0] == 0.0 and out[0][1] == 0.0
    assert out[0][2] == 0.4 and out[0][3] == 10.4  # other corners untouched


def test_snap_skips_degenerate_vertex_center():
    cell = np.array([_quad_row(0.4, 0.4, 10, 10, 0.9)])
    # all centers within v2c_dist_thred of the vertex → nothing snaps
    gbox = np.array([[0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.9]])
    out = snap_cells_to_grid(cell.copy(), gbox)
    assert out[0][0] == 0.4


def test_label_components_8conn():
    mask = np.array(
        [
            [1, 0, 0, 0],
            [0, 1, 0, 0],  # diagonal touches → same component (8-conn)
            [0, 0, 0, 1],
            [0, 0, 0, 1],
        ]
    )
    labels = label_components(mask > 0)
    assert labels[0, 0] == labels[1, 1] != 0
    assert labels[2, 3] == labels[3, 3] != labels[0, 0]
    assert labels.max() == 2


def test_mask_to_line_segments_horizontal():
    mask = np.zeros((20, 60), dtype=int)
    mask[5, 10:50] = 1        # long horizontal line
    mask[12:14, 30:35] = 1    # short blob, width 5 < 10 → filtered
    segs = mask_to_line_segments(mask, axis=0, line_w=10)
    assert len(segs) == 1
    x0, y0, x1, y1 = segs[0]
    assert abs(y0 - 5) <= 1 and abs(y1 - 5) <= 1
    assert abs(x0 - 10) <= 2 and abs(x1 - 49) <= 2


def test_mask_to_line_segments_vertical():
    mask = np.zeros((40, 20), dtype=int)
    mask[5:35, 7] = 1
    segs = mask_to_line_segments(mask, axis=1, line_w=10)
    assert len(segs) == 1
    x0, y0, x1, y1 = segs[0]
    assert abs(x0 - 7) <= 1 and abs(x1 - 7) <= 1 and (y1 - y0) > 25
