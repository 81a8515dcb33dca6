"""Golden parity tests for the wired line utilities.

Case literals copied from the reference's
tests/test_wired_table_line_util.py:13-218 (values only).
"""

import numpy as np
import pytest

from tablestructurerec_spark.core.lines import (
    adjust_lines,
    center_rotate_angle,
    fit_line,
    line_to_line,
    min_area_rect,
    order_quad_points,
)


@pytest.mark.parametrize(
    "pts, expected",
    [
        (
            np.array([[10, 10], [20, 10], [20, 20], [10, 20]]),
            np.array([[10, 10], [20, 10], [20, 20], [10, 20]], dtype="float32"),
        ),
        (
            np.array([[20, 10], [20, 20], [10, 20], [10, 10]]),
            np.array([[10, 10], [20, 10], [20, 20], [10, 20]], dtype="float32"),
        ),
        (
            np.array([[10, 20], [20, 20], [20, 10], [10, 10]]),
            np.array([[10, 10], [20, 10], [20, 20], [10, 20]], dtype="float32"),
        ),
    ],
)
def test_order_quad_points(pts, expected):
    assert np.allclose(order_quad_points(pts), expected)


@pytest.mark.parametrize(
    "box, ea, ew, eh, ecx, ecy",
    [
        ([10, 10, 20, 10, 20, 20, 10, 20], 0.0, 10.0, 10.0, 15.0, 15.0),
        (
            [
                13.16987,
                8.1698,
                21.830,
                13.16987,
                16.830127018922195,
                21.83012701892219,
                8.169872981077807,
                16.830127018922195,
            ],
            np.pi / 6,
            10.0,
            10.0,
            15.0,
            15.0,
        ),
    ],
)
def test_center_rotate_angle(box, ea, ew, eh, ecx, ecy):
    angle, w, h, cx, cy = center_rotate_angle(box)
    for got, want in ((angle, ea), (w, ew), (h, eh), (cx, ecx), (cy, ecy)):
        assert np.isclose(got, want, atol=1e-4)


def test_fit_line():
    assert fit_line([(0, 0), (1, 1)]) == (1, -1, 0)


@pytest.mark.parametrize(
    "points1, points2, expected",
    [
        ([0, 0, 0.9, 0], [1, 0, 1, 1], np.array([0, 0, 1, 0], dtype="float32")),
        ([4, 3, 0, 0], [8, 0, 8, 8], np.array([8, 6, 0, 0], dtype="float32")),
        ([0, 0, 2, 1], [1, 0, 1, 1], np.array([0, 0, 2, 1], dtype="float32")),
        ([0, 0, 0.9, 0.9], [1, 0, 1, 4], np.array([0, 0, 0.9, 0.9], dtype="float32")),
        ([4, 3, 0, 0], [50, 0, 50, 50], np.array([4, 3, 0, 0], dtype="float32")),
    ],
)
def test_line_to_line(points1, points2, expected):
    assert np.allclose(np.asarray(line_to_line(points1, points2, angle=38)), expected, atol=1e-5)


@pytest.mark.parametrize(
    "coords, expected",
    [
        (np.array([[0, 1000], [10, 1000], [10, 1002], [20, 1002]]), [1000, 0, 1002, 20]),
        (np.array([[1000, 0], [1000, 10], [1002, 15], [1001, 30]]), [0, 1000, 30, 1000]),
    ],
)
def test_min_area_rect(coords, expected):
    assert np.allclose(min_area_rect(coords), expected, atol=2)


@pytest.mark.parametrize(
    "lines, alph, angle, expected",
    [
        (
            [(0, 0, 1, 0), (1, 0, 2, 0)],
            50,
            50,
            [
                (0, 0, 1, 0),
                (0, 0, 2, 0),
                (1, 0, 1, 0),
                (1, 0, 2, 0),
                (1, 0, 0, 0),
                (1, 0, 1, 0),
                (2, 0, 0, 0),
                (2, 0, 1, 0),
            ],
        ),
        ([(0, 0.5, 0, 1.8), (0, 1, 0, 2)], 50, 50, []),
        ([(1, 0, 2, 0), (0, 0, 1.8, 0)], 50, 50, []),
        ([(0, 0, 1, 0), (11, 0, 13, 0)], 10, 50, []),
        (
            [(0, 0, 1, 1), (1, 1, 2, 2), (2, 2, 3, 3)],
            100,
            35,
            [(1, 1, 1, 1), (1, 1, 1, 1), (2, 2, 2, 2), (2, 2, 2, 2)],
        ),
        (
            [(0, 0, 1, 1), (1, 1, 2, 2), (2, 2, 100, 100)],
            50,
            30,
            [(1, 1, 1, 1), (1, 1, 1, 1), (2, 2, 2, 2), (2, 2, 2, 2)],
        ),
        ([(0, 0, 1, 0)], 50, 50, []),
    ],
)
def test_adjust_lines(lines, alph, angle, expected):
    assert adjust_lines(lines, alph, angle) == expected
