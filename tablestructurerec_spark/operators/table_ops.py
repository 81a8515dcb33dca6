"""groupBy-shaped per-table operators over an exploded cells DataFrame.

The flagship plan runs whole tables inside one ``mapInPandas`` pass (a turn
is self-contained).  These operators expose the same kernels in the OTHER
Spark shape — ``groupBy(conv_id, turn_idx, table_idx).applyInPandas`` over a
flat ``cells`` table (FIXTURES.md §2) — for pipelines whose cell rows arrive
already exploded (e.g. from the batched inference stage).  One shuffle on the
table key; per-group data is tiny (≤10³ cells), so skew is bounded by design.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..core.geometry import reading_order
from ..core.html_render import render_table_html
from ..core.recover import recover_logic_points

__all__ = ["assign_logic_points", "assign_reading_order", "render_tables"]

_KEY = ["conv_id", "turn_idx", "table_idx"]


def assign_logic_points(cells: DataFrame) -> DataFrame:
    """cells(conv_id, turn_idx, table_idx, cell_id, quad: array<array<double>>)
    → + [row_start, row_end, col_start, col_end] via the TableRecover
    heuristics (A1–A4) per table group."""
    schema = (
        "conv_id string, turn_idx int, table_idx int, cell_id int, "
        "quad array<array<double>>, row_start int, row_end int, "
        "col_start int, col_end int"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("cell_id").reset_index(drop=True)
        # Arrow hands nested arrays as object ndarrays; stack corner-wise
        quads = np.stack(
            [np.stack([np.asarray(p, dtype=float) for p in q]) for q in pdf["quad"]]
        )
        logic = recover_logic_points(quads)
        pdf["row_start"], pdf["row_end"] = logic[:, 0], logic[:, 1]
        pdf["col_start"], pdf["col_end"] = logic[:, 2], logic[:, 3]
        return pdf

    return cells.groupBy(*_KEY).applyInPandas(run, schema=schema)


def assign_reading_order(boxes: DataFrame) -> DataFrame:
    """boxes(key…, box_id, xmin, ymin, xmax, ymax) → + read_rank using the
    EXACT reading-order semantics (stable sort + y-band bubble pass,
    ref utils_table_recover.py:232-268) — the conformance path; the native
    window approximation is queries()['w1_reading_order']."""
    schema = (
        "conv_id string, turn_idx int, table_idx int, box_id int, "
        "xmin double, ymin double, xmax double, ymax double, read_rank int"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("box_id").reset_index(drop=True)
        items = pdf[["xmin", "ymin", "xmax", "ymax"]].to_numpy().tolist()
        _, perm = reading_order(items)
        rank = np.empty(len(perm), dtype=int)
        for r, original_idx in enumerate(perm):
            rank[original_idx] = r
        pdf["read_rank"] = rank
        return pdf

    return boxes.groupBy(*_KEY).applyInPandas(run, schema=schema)


def render_tables(cells: DataFrame) -> DataFrame:
    """cells(key…, cell_id, row_start..col_end, texts: array<string>) →
    one row per table with the rendered HTML (F2, ref :409-475)."""
    schema = "conv_id string, turn_idx int, table_idx int, pred_html string"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("cell_id")
        logic = pdf[["row_start", "row_end", "col_start", "col_end"]].to_numpy().tolist()
        texts = {i: list(t) for i, t in enumerate(pdf["texts"])}
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "turn_idx": [pdf["turn_idx"].iloc[0]],
                "table_idx": [pdf["table_idx"].iloc[0]],
                "pred_html": [render_table_html(logic, texts)],
            }
        )

    return cells.groupBy(*_KEY).applyInPandas(run, schema=schema)
