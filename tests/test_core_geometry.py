"""Golden parity tests for the geometry kernels.

Every case below is a literal copied from the reference's own parametrized
unit tests (values only — the implementations under test are ours):
/root/reference/tests/test_lineless_table_rec.py:48-194.
"""

import numpy as np
import pytest

from tablestructurerec_spark.core.geometry import (
    axis_contained_side,
    contained_side,
    duplicate_box_indices,
    gather_ocr_rows,
    reading_order,
)


@pytest.mark.parametrize(
    "box1, box2, threshold, expected",
    [
        ([10, 20, 30, 40], [5, 15, 45, 55], 0.2, 1),
        ([5, 15, 45, 55], [10, 20, 30, 40], 0.2, 2),
        ([10, 20, 30, 40], [25, 35, 45, 55], 0.2, None),
        ([10, 20, 30, 40], [50, 60, 70, 80], 0.2, None),
        ([10, 20, 30, 40], [15, 25, 35, 45], 0.2, None),
        ([10, 20, 30, 40], [15, 25, 35, 45], 0.5, 1),
        ([15, 25, 35, 45], [14, 24, 16, 44], 0.6, 2),
        ([10, 20, 30, 40], [10, 20, 30, 40], 0.2, 1),
        (np.array([10, 20, 30, 40]), np.array([5, 15, 45, 55]), 0.2, 1),
    ],
)
def test_contained_side(box1, box2, threshold, expected):
    assert contained_side(box1, box2, threshold) == expected


@pytest.mark.parametrize(
    "box1, box2, axis, threshold, expected",
    [
        ([10, 10, 20, 20], [12, 12, 18, 18], "x", 0.2, 2),
        ([12, 12, 18, 18], [10, 10, 20, 20], "x", 0.2, 1),
        ([10, 10, 20, 20], [12, 12, 18, 18], "y", 0.2, 2),
        ([12, 12, 18, 18], [10, 10, 20, 20], "y", 0.2, 1),
        ([10, 10, 20, 20], [25, 25, 30, 30], "x", 0.2, None),
        ([10, 10, 20, 20], [25, 25, 30, 30], "y", 0.2, None),
        ([10, 10, 20, 20], [15, 15, 25, 25], "x", 0.2, None),
        ([10, 10, 20, 20], [15, 15, 25, 25], "y", 0.2, None),
        ([10, 10, 20, 20], [13, 15, 21, 25], "x", 0.2, 2),
        ([10, 14, 20, 20], [15, 15, 25, 50], "y", 0.2, 1),
        ([10, 10, 20, 20], [10, 10, 20, 20], "x", 0.2, 1),
        ([10, 10, 20, 20], [10, 10, 20, 20], "y", 0.2, 1),
    ],
)
def test_axis_contained_side(box1, box2, axis, threshold, expected):
    assert axis_contained_side(box1, box2, axis, threshold) == expected


@pytest.mark.parametrize(
    "input_ocr_list, expected_output",
    [
        (
            [[[10, 20, 30, 40], "text1"], [[15, 23, 35, 43], "text2"]],
            [[[10, 20, 35, 43], "text1text2"]],
        ),
        (
            [
                [[10, 24, 30, 30], "text1"],
                [[15, 25, 35, 45], "text2"],
                [[5, 30, 15, 50], "text3"],
            ],
            [[[10, 24, 35, 45], "text1text2"], [[5, 30, 15, 50], "text3"]],
        ),
        ([], []),
        (
            [[[10, 20, 30, 40], "text1"], [], [[15, 25, 35, 45], "text2"]],
            [[[10, 20, 30, 40], "text1"], [[15, 25, 35, 45], "text2"]],
        ),
    ],
)
def test_gather_ocr_rows(input_ocr_list, expected_output):
    assert gather_ocr_rows(input_ocr_list) == expected_output


@pytest.mark.parametrize(
    "dt_boxes, expected_boxes, expected_indices",
    [
        (
            np.array([[2, 3, 4, 5], [3, 4, 5, 6], [1, 2, 2, 3]]),
            np.array([[1, 2, 2, 3], [2, 3, 4, 5], [3, 4, 5, 6]]),
            [2, 0, 1],
        ),
        (
            np.array([[59, 0, 148, 52], [134, 0, 254, 53], [12, 13, 30, 40]]),
            np.array([[12, 13, 30, 40], [59, 0, 148, 52], [134, 0, 254, 53]]),
            [2, 0, 1],
        ),
        (np.array([[2, 3, 4, 5]]), np.array([[2, 3, 4, 5]]), [0]),
        (np.array([]), np.array([]), []),
    ],
)
def test_reading_order(dt_boxes, expected_boxes, expected_indices):
    boxes, indices = reading_order(dt_boxes)
    assert np.asarray(boxes).tolist() == expected_boxes.tolist()
    assert indices == expected_indices


@pytest.mark.parametrize(
    "table_boxes, expected_delete_idx",
    [
        (
            np.array(
                [
                    [10, 20, 30, 40],
                    [10, 20, 30, 40],
                    [10, 30, 30, 40],
                    [9, 35, 25, 50],
                    [10, 19, 29, 41],
                ]
            ),
            {1, 2, 4},
        ),
        (np.array([[1, 2, 3, 4]]), set()),
        (np.array([]), set()),
    ],
)
def test_duplicate_box_indices(table_boxes, expected_delete_idx):
    assert duplicate_box_indices(table_boxes.tolist()) == expected_delete_idx
