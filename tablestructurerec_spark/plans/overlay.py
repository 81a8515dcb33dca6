"""S4 completion — box-overlay visual sink, the ``VisTable`` analogue.

The reference's debug sink draws, per cell, a 1px red rectangle plus two
labels ``row: r0-r1`` at (x0+3, y0+8) and ``col: c0-c1`` at (x0+3, y0+18)
on the image widened by a 100px white right margin
(``plot_rec_box_with_logic_info``, ref
lineless_table_rec/utils/utils.py:405-452).  A raster sink needs cv2; the
Spark-native analogue renders the SAME geometry as an SVG string column —
deterministic text, so it is golden-testable, value-hash oracle-able, and
writable through any string sink (the HTML sink path already exists).

Shape at 100 TB: one projection builds per-cell fragments, one groupBy
(conv_id, turn_idx, table_idx) assembles documents — a single shuffle of
small fragment strings keyed by table (high cardinality, no skew pivot);
the ordered concat is ``array_sort(collect_list(struct))`` so assembly
stays a plain hash aggregate, not a window sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cell_fragment_col", "svg_overlay"]

MARGIN = 100  # the reference's copyMakeBorder right margin


def _i(c: Column) -> Column:
    """Integer-pixel string, mirroring the reference's round() before cv2."""
    return F.round(c).cast("int").cast("string")


def cell_fragment_col() -> Column:
    """SVG fragment for one cell row (xmin/ymin/xmax/ymax + spans)."""
    x0, y0 = F.col("xmin"), F.col("ymin")
    return F.concat(
        F.lit('<rect x="'), _i(x0),
        F.lit('" y="'), _i(y0),
        F.lit('" width="'), _i(F.col("xmax") - x0),
        F.lit('" height="'), _i(F.col("ymax") - y0),
        F.lit('" fill="none" stroke="red" stroke-width="1"/>'),
        F.lit('<text x="'), _i(x0 + 3),
        F.lit('" y="'), _i(y0 + 8),
        F.lit('" font-size="9" fill="red">row: '),
        F.col("row_start").cast("string"), F.lit("-"),
        F.col("row_end").cast("string"),
        F.lit("</text>"),
        F.lit('<text x="'), _i(x0 + 3),
        F.lit('" y="'), _i(y0 + 18),
        F.lit('" font-size="9" fill="red">col: '),
        F.col("col_start").cast("string"), F.lit("-"),
        F.col("col_end").cast("string"),
        F.lit("</text>"),
    )


def svg_overlay(cells: DataFrame) -> DataFrame:
    """cells(conv_id, turn_idx, table_idx, cell_id, xmin..ymax, spans) →
    one SVG document string per table."""
    frag = cells.select(
        "conv_id",
        "turn_idx",
        "table_idx",
        "cell_id",
        "xmax",
        "ymax",
        cell_fragment_col().alias("frag"),
    )
    agg = frag.groupBy("conv_id", "turn_idx", "table_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("cell_id", "frag"))),
                lambda s: s["frag"],
            ),
            "",
        ).alias("body"),
        F.max("xmax").alias("w"),
        F.max("ymax").alias("h"),
        F.count(F.lit(1)).cast("int").alias("n_cells"),
    )
    svg = F.concat(
        F.lit('<svg xmlns="http://www.w3.org/2000/svg" width="'),
        _i(F.col("w") + MARGIN),
        F.lit('" height="'),
        _i(F.col("h")),
        F.lit('">'),
        F.col("body"),
        F.lit("</svg>"),
    )
    return agg.select("conv_id", "turn_idx", "table_idx", "n_cells", svg.alias("svg"))
