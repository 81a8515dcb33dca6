"""Tests for polygon kernels (poly IoU, quad sort, adjacent merge).

Cases constructed with hand-computable hull areas (the reference pins these
ops only via its CycleCenterNet path; semantics per
utils_table_recover.py:14-36, :39-67, :322-375).
"""

import numpy as np
import pytest

from tablestructurerec_spark.core.polys import merge_adjacent_quads, poly_iou, sort_quads


def _sq(x0, y0, s=2.0):
    return [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]]


@pytest.mark.parametrize(
    "a, b, expected",
    [
        (_sq(0, 0), _sq(0, 0), 1.0),          # identical
        (_sq(0, 0), _sq(10, 10), 0.0),        # disjoint
        (_sq(0, 0), _sq(2, 0), 0.0),          # touching edge → zero inter area
        # half-overlap: inter = 2x2 ∩ shifted = 1x2 = 2; hull(all pts) = 3x2 = 6
        (_sq(0, 0), _sq(1, 0), 2.0 / 6.0),
    ],
)
def test_poly_iou(a, b, expected):
    assert poly_iou(a, b) == pytest.approx(expected, abs=1e-9)


def test_poly_iou_rotated():
    # 45°-rotated square inscribed in a 2x2 square: inter = rotated square
    # area 2; union hull = the outer square area 4 → 0.5
    outer = _sq(0, 0)
    diamond = [[1, 0], [2, 1], [1, 2], [0, 1]]
    assert poly_iou(outer, diamond) == pytest.approx(0.5, abs=1e-9)


def test_sort_quads_reading_order():
    q = lambda x, y: [[x, y], [x + 10, y], [x + 10, y + 8], [x, y + 8]]
    quads = np.array([q(50, 3), q(0, 0), q(0, 20)], dtype=float)
    got = sort_quads(quads)
    # same y-band (|3-0| < 10) → x decides; the y=20 row comes last
    assert got[:, 0, 0].tolist() == [0, 50, 0]
    assert got[:, 0, 1].tolist() == [0, 3, 20]


def test_merge_adjacent_quads():
    a = np.array(_sq(0, 0, 4.0))
    b = np.array(_sq(1, 1, 4.0))  # heavy overlap with a
    c = np.array(_sq(100, 100, 4.0))
    merged = merge_adjacent_quads(np.array([a, b, c]))
    assert len(merged) == 2
    env = merged[0]
    # corner rules: 0=min, 2=max (ref combine_two_poly :339-367)
    assert env[0].tolist() == [0, 0] and env[2].tolist() == [5, 5]
    assert merged[1][0].tolist() == [100, 100]


def test_merge_no_overlap_is_identity():
    quads = np.array([_sq(0, 0), _sq(10, 0), _sq(0, 10)], dtype=float)
    out = merge_adjacent_quads(sort_quads(quads))
    assert len(out) == 3
