"""SVG box-overlay sink (plans/overlay.py) — golden geometry + plan shape.

Golden mirrors the reference's drawing rules (1px red rect; ``row:``/
``col:`` labels at +3/+8 and +3/+18; 100px right margin —
lineless_table_rec/utils/utils.py:405-452).
"""


def _cells_df(spark):
    rows = [
        # conv, turn, table, cell_id, xmin, ymin, xmax, ymax, r0, r1, c0, c1
        ("c-0", 1, 0, 1, 122.0, 2.0, 238.0, 38.0, 0, 0, 1, 1),
        ("c-0", 1, 0, 0, 2.0, 2.0, 118.0, 38.0, 0, 0, 0, 0),
        ("c-0", 1, 0, 2, 2.0, 42.0, 238.0, 78.0, 1, 1, 0, 1),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, table_idx int, cell_id int, "
        "xmin double, ymin double, xmax double, ymax double, "
        "row_start int, row_end int, col_start int, col_end int",
    )


GOLD = (
    '<svg xmlns="http://www.w3.org/2000/svg" width="338" height="78">'
    '<rect x="2" y="2" width="116" height="36" fill="none" stroke="red" stroke-width="1"/>'
    '<text x="5" y="10" font-size="9" fill="red">row: 0-0</text>'
    '<text x="5" y="20" font-size="9" fill="red">col: 0-0</text>'
    '<rect x="122" y="2" width="116" height="36" fill="none" stroke="red" stroke-width="1"/>'
    '<text x="125" y="10" font-size="9" fill="red">row: 0-0</text>'
    '<text x="125" y="20" font-size="9" fill="red">col: 1-1</text>'
    '<rect x="2" y="42" width="236" height="36" fill="none" stroke="red" stroke-width="1"/>'
    '<text x="5" y="50" font-size="9" fill="red">row: 1-1</text>'
    '<text x="5" y="60" font-size="9" fill="red">col: 0-1</text>'
    "</svg>"
)


def test_golden_svg(spark):
    from tablestructurerec_spark.plans.overlay import svg_overlay

    out = svg_overlay(_cells_df(spark)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.conv_id, r.turn_idx, r.table_idx, r.n_cells) == ("c-0", 1, 0, 3)
    # fragments in cell_id order even though the input rows arrive shuffled
    assert r.svg == GOLD


def test_assembly_is_hash_aggregate_not_window(spark):
    from tablestructurerec_spark.plans.overlay import svg_overlay

    plan = svg_overlay(_cells_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    # ordered concat rides the aggregate (array_sort over collect_list)
    assert "collect_list" in plan or "HashAggregate" in plan or "ObjectHashAggregate" in plan
