"""The flagship plan: transcripts → per-turn main content + reconstructed tables.

Shape of the plan (designed for 10^12 turns):

* ``clean_turns`` — 100% native Column expressions (whole-stage codegen, no
  Python): boilerplate strip + table count per turn.  A 2-column projection
  reaches the parquet scan; no shuffle at all.
* ``extract_tables`` — a cheap codegen'd ``contains('<table')`` pre-filter,
  then ONE Arrow-batched ``mapInPandas`` stage running the per-table
  reconstruction kernel (:func:`core.pipeline.process_table_html`).  The
  stage is narrow — per-turn work, no shuffle, no groupBy — so conversation
  skew cannot concentrate load: partitioning follows input splits, not
  conv_id.  Only an explicit final ``orderBy`` (optional, for stable output)
  shuffles, and AQE handles its skew.

Column pruning is done MANUALLY before the UDF (select exactly
conv_id/turn_idx/text) because Catalyst cannot prune through an opaque
``mapInPandas`` (SURVEY.md §4).
"""

from __future__ import annotations

import zlib
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.html_parse import find_table_fragments
from ..core.pipeline import process_table_html
from ..functions.text import (
    has_table_col,
    n_tables_col,
    strip_boilerplate_col,
    strip_tables_col,
)

__all__ = [
    "clean_turns",
    "extract_tables",
    "extract_cells",
    "extract_transcripts",
    "TABLES_SCHEMA",
]

TABLES_SCHEMA = (
    "conv_id string, turn_idx int, table_idx int, table_kind string, "
    "pred_html string, cell_bboxes array<array<double>>, "
    "logic_points array<array<int>>, n_cells int, error string"
)


def clean_turns(df: DataFrame) -> DataFrame:
    """Per-turn main content, fully JVM-side (no Python in this plan)."""
    return df.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "ts",
        strip_boilerplate_col(strip_tables_col(F.col("text"))).alias("main_text"),
        n_tables_col(F.col("text")).alias("n_tables"),
    )


def _table_seed(conv_id: str, turn_idx: int, table_idx: int) -> int:
    return zlib.crc32(f"{conv_id}|{turn_idx}|{table_idx}".encode())


_EMPTY_HTML = "<html><body><table></table></body></html>"


def _extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = {
        "conv_id": [], "turn_idx": [], "table_idx": [], "table_kind": [],
        "pred_html": [], "cell_bboxes": [], "logic_points": [], "n_cells": [],
        "error": [],
    }

    def flush():
        out = pd.DataFrame(cols)
        for k in cols:
            cols[k] = []
        return out

    for pdf in batches:
        for conv_id, turn_idx, text in zip(
            pdf["conv_id"], pdf["turn_idx"], pdf["text"]
        ):
            for ti, (_, _, html) in enumerate(find_table_fragments(text)):
                # per-table degradation, as the reference degrades per image
                # (ref lineless_table_rec/main.py:132-134) — one poisoned
                # fragment must not fail a 10^12-turn job; the error column
                # feeds the lineage/metrics tables
                try:
                    res = process_table_html(html, _table_seed(conv_id, turn_idx, ti))
                    err = None
                except Exception as exc:  # noqa: BLE001 - deliberate catch-all
                    res = {
                        "table_kind": "error",
                        "pred_html": _EMPTY_HTML,
                        "cell_bboxes": [],
                        "logic_points": [],
                        "n_cells": 0,
                    }
                    err = f"{type(exc).__name__}: {exc}"[:500]
                cols["conv_id"].append(conv_id)
                cols["turn_idx"].append(turn_idx)
                cols["table_idx"].append(ti)
                cols["table_kind"].append(res["table_kind"])
                cols["pred_html"].append(res["pred_html"])
                cols["cell_bboxes"].append(res["cell_bboxes"])
                cols["logic_points"].append(res["logic_points"])
                cols["n_cells"].append(res["n_cells"])
                cols["error"].append(err)
        if cols["conv_id"]:
            yield flush()


def extract_tables(df: DataFrame) -> DataFrame:
    """One row per reconstructed table, keyed (conv_id, turn_idx, table_idx)."""
    src = df.where(has_table_col(F.col("text"))).select("conv_id", "turn_idx", "text")
    return src.mapInPandas(_extract_batch, schema=TABLES_SCHEMA)


def extract_cells(df: DataFrame) -> DataFrame:
    """Per-cell structured spans: one row per (turn, table, cell).

    A NATIVE posexplode over the arrays ``extract_tables`` already produced —
    no extra Python stage; Catalyst keeps it in the same job.
    """
    tables = extract_tables(df)
    z = F.posexplode(F.arrays_zip("cell_bboxes", "logic_points"))
    return tables.select(
        "conv_id", "turn_idx", "table_idx", "table_kind", z.alias("cell_id", "c")
    ).select(
        "conv_id",
        "turn_idx",
        "table_idx",
        "table_kind",
        F.col("cell_id").cast("int").alias("cell_id"),
        F.col("c.cell_bboxes")[0].alias("xmin"),
        F.col("c.cell_bboxes")[1].alias("ymin"),
        F.col("c.cell_bboxes")[4].alias("xmax"),
        F.col("c.cell_bboxes")[5].alias("ymax"),
        F.col("c.logic_points")[0].alias("row_start"),
        F.col("c.logic_points")[1].alias("row_end"),
        F.col("c.logic_points")[2].alias("col_start"),
        F.col("c.logic_points")[3].alias("col_end"),
    )


def extract_transcripts(df: DataFrame) -> Tuple[DataFrame, DataFrame]:
    """(clean turns, reconstructed tables) for a transcripts DataFrame."""
    return clean_turns(df), extract_tables(df)
