"""applyInPandas per-table operator tests (groupBy-shaped kernels)."""

import numpy as np

from tablestructurerec_spark.core.html_parse import quads_from_logic_points
from tablestructurerec_spark.operators.table_ops import (
    assign_logic_points,
    assign_reading_order,
    render_tables,
)

LOGIC_A = [[0, 0, 0, 1], [1, 1, 0, 0], [1, 1, 1, 1]]
LOGIC_B = [[0, 1, 0, 0], [0, 0, 1, 1], [1, 1, 1, 1]]


def test_assign_logic_points_two_tables(spark):
    rows = []
    for tid, logic in ((0, LOGIC_A), (1, LOGIC_B)):
        for cid, quad in enumerate(quads_from_logic_points(logic)):
            rows.append(("c0", 1, tid, cid, quad))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, table_idx int, cell_id int, quad array<array<double>>",
    )
    out = assign_logic_points(df).collect()
    got = {}
    for r in out:
        got.setdefault(r.table_idx, {})[r.cell_id] = [
            r.row_start, r.row_end, r.col_start, r.col_end
        ]
    assert [got[0][i] for i in range(3)] == LOGIC_A
    assert [got[1][i] for i in range(3)] == LOGIC_B


def test_assign_reading_order_exact_golden(spark):
    # golden permutation from the reference's sorted_ocr_boxes tests
    # (tests/test_lineless_table_rec.py:137-165): [2, 0, 1]
    boxes = [[59, 0, 148, 52], [134, 0, 254, 53], [12, 13, 30, 40]]
    rows = [("c0", 0, 0, i, *map(float, b)) for i, b in enumerate(boxes)]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, table_idx int, box_id int, "
        "xmin double, ymin double, xmax double, ymax double",
    )
    ranks = {r.box_id: r.read_rank for r in assign_reading_order(df).collect()}
    assert [ranks[i] for i in range(3)] == [1, 2, 0]


def test_render_tables_matches_golden(spark):
    logic = [[0, 0, 0, 0], [0, 1, 1, 2]]
    texts = [["Cell 1"], ["Row 2", "Col 2"]]
    rows = [
        ("c0", 0, 0, i, *lp, texts[i]) for i, lp in enumerate(logic)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, table_idx int, cell_id int, "
        "row_start int, row_end int, col_start int, col_end int, texts array<string>",
    )
    out = render_tables(df).collect()
    assert out[0].pred_html == (
        "<html><body><table><tr><td rowspan=1 colspan=1>Cell 1</td>"
        "<td rowspan=2 colspan=2>Row 2<br>Col 2</td></tr><tr><td></td></tr>"
        "</table></body></html>"
    )
