"""End-to-end wired path from ruling lines: raster → interiors → cells →
logical spans, reproducing a known grid."""

import numpy as np
import pytest

from tablestructurerec_spark.core.cells_from_lines import cells_from_segments, raster_segments
from tablestructurerec_spark.core.html_parse import quads_from_logic_points
from tablestructurerec_spark.core.recover import recover_logic_points


def _border_segments(logic, col_w=120, row_h=40):
    """The visible ruling of a grid: each cell's 4 border segments."""
    segs = []
    for r0, r1, c0, c1 in logic:
        x0, x1 = c0 * col_w, (c1 + 1) * col_w
        y0, y1 = r0 * row_h, (r1 + 1) * row_h
        segs.append(("row", (x0, y0, x1, y0)))
        segs.append(("row", (x0, y1, x1, y1)))
        segs.append(("col", (x0, y0, x0, y1)))
        segs.append(("col", (x1, y0, x1, y1)))
    rows = [s for k, s in segs if k == "row"]
    cols = [s for k, s in segs if k == "col"]
    return rows, cols


GRIDS = [
    [[0, 0, 0, 0], [0, 0, 1, 1], [1, 1, 0, 0], [1, 1, 1, 1]],          # plain 2x2
    [[0, 0, 0, 1], [1, 1, 0, 0], [1, 1, 1, 1]],                        # colspan header
    [[0, 1, 0, 0], [0, 0, 1, 1], [1, 1, 1, 1]],                        # rowspan left
    # mixed spans, every column boundary anchored by some cell start
    [[0, 0, 0, 0], [0, 0, 1, 1], [0, 0, 2, 2], [1, 1, 0, 1], [1, 1, 2, 2]],
]


@pytest.mark.parametrize("logic", GRIDS)
def test_lines_to_cells_to_logic_round_trip(logic):
    from tablestructurerec_spark.core.pipeline import classify_table_kind

    # grids here are within the geometry-recoverable domain by construction
    assert classify_table_kind(logic) == "wired"
    rows, cols = _border_segments(logic)
    n_rows = max(lp[1] for lp in logic) + 1
    n_cols = max(lp[3] for lp in logic) + 1
    shape = (n_rows * 40 + 8, n_cols * 120 + 8)
    quads = cells_from_segments(shape, rows, cols)
    assert len(quads) == len(logic)
    got = recover_logic_points(np.array(quads))
    assert sorted(got.tolist()) == sorted(logic)


def test_raster_segments_marks_lines():
    m = raster_segments((20, 50), [(5, 10, 45, 10)], thickness=3)
    assert m[10, 25] and m[9, 25] and m[11, 25]
    assert not m[15, 25]


def test_interior_count_matches_cells():
    logic = [[0, 0, 0, 0], [0, 0, 1, 1]]
    rows, cols = _border_segments(logic)
    quads = cells_from_segments((48, 248), rows, cols)
    assert len(quads) == 2
    # cells come out in reading order with ccw corners
    assert quads[0][0][0] < quads[1][0][0]
    tl, bl, br, tr = quads[0]
    assert tl[1] < bl[1] and tl[0] < br[0]


def test_filter_matches_reference_min_area_rect_semantics():
    """Region filtering follows min_area_rect_box (ref utils_table_line_rec
    .py:627,647-651): thin DIAGONAL regions are dropped on min-area-RECT
    sides (<15), even when their axis-aligned bbox looks large; upright
    cells of rect side >= 15 are kept."""
    import numpy as np

    from tablestructurerec_spark.core.cells_from_lines import cells_from_line_mask

    lines = np.ones((200, 200), dtype=bool)
    # a 30x30 upright open cell -> kept
    lines[10:40, 10:40] = False
    # a ~4px-wide diagonal strip spanning a 100x100 bbox -> rect ~4x140,
    # filtered by the rect-side rule (the old bbox-side test kept it)
    for i in range(100):
        lines[60 + i, 60 + i : 64 + i] = False
    quads = cells_from_line_mask(lines)
    assert len(quads) == 1
    q = np.asarray(quads[0])
    assert q[:, 0].max() <= 45 and q[:, 1].max() <= 45  # the upright cell
