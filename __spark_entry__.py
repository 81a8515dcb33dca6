"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction plan; ``queries``/``oracle_sql`` expose
the operator suite from SURVEY.md §2 (and the training-data operators) with
DuckDB-checkable ANSI-SQL oracles.
"""

from __future__ import annotations

import os
import sys
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def _ship_package(spark: SparkSession) -> None:
    """Make the package importable on executor python workers.

    Equivalent of ``spark-submit --py-files``: zip the package and addPyFile.
    Idempotent per session.
    """
    if getattr(spark, "_tsr_shipped", False):
        return
    pkg_dir = os.path.join(REPO_ROOT, "tablestructurerec_spark")
    zip_path = os.path.join("/tmp", "tablestructurerec_spark_pkg.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO_ROOT))
    spark.sparkContext.addPyFile(zip_path)
    spark._tsr_shipped = True


def _transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcripts over the driver testdata: each document
    becomes one turn whose text embeds a 2x2 metadata table in the engine's
    HTML grammar (plus boilerplate) — so extraction output is decidable."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    table_html = F.concat(
        F.lit("<html><body><table><tr><td rowspan=1 colspan=1>doc "),
        F.col("doc_id").cast("string"),
        F.lit("</td><td rowspan=1 colspan=1>"),
        F.col("lang"),
        F.lit("</td></tr><tr><td rowspan=1 colspan=1>"),
        F.col("source"),
        F.lit("</td><td rowspan=1 colspan=1>"),
        F.col("n_chars").cast("string"),
        F.lit("</td></tr></table></body></html>"),
    )
    return docs.select(
        F.col("source").alias("conv_id"),
        F.row_number()
        .over(Window.partitionBy("source").orderBy("doc_id"))
        .cast("int")
        .alias("turn_idx"),
        F.lit("assistant").alias("role"),
        F.concat(
            F.col("text"),
            F.lit(" <nav>home | docs</nav> "),
            table_html,
            F.lit(" <footer>fin</footer>"),
        ).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts → boilerplate strip + embedded-table
    reconstruction; returns one row per (turn, table) with the normalized
    HTML, cell boxes and logical spans."""
    _ship_package(spark)
    from tablestructurerec_spark.plans.extract import extract_tables

    df = _transcripts_from_documents(spark, "/root/testdata/sf0.001")
    return extract_tables(df).orderBy("conv_id", "turn_idx", "table_idx")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ training-data
    operators).  Every callable takes (spark, sf_dir) → DataFrame with
    columns aliased identically to the oracle SQL."""
    from tablestructurerec_spark.operators import dedup, relational, similarity, textstats

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    out.update(textstats.QUERIES)
    out.update(dedup.QUERIES)
    out.update(similarity.QUERIES)

    def flagship_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        from tablestructurerec_spark.plans.extract import extract_tables

        df = _transcripts_from_documents(spark, sf_dir)
        return extract_tables(df).select(
            "conv_id", "turn_idx", "table_idx", "table_kind", "pred_html", "n_cells"
        ).orderBy("conv_id", "turn_idx")

    out["flagship_extract"] = flagship_extract

    def clean_turns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from tablestructurerec_spark.plans.extract import clean_turns

        df = _transcripts_from_documents(spark, sf_dir)
        return clean_turns(df).select(
            "conv_id", "turn_idx", "main_text", "n_tables"
        ).orderBy("conv_id", "turn_idx")

    out["s1_clean_turns"] = clean_turns_q

    def flagship_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        from tablestructurerec_spark.plans.extract import extract_cells

        df = _transcripts_from_documents(spark, sf_dir)
        return extract_cells(df).orderBy("conv_id", "turn_idx", "cell_id")

    out["flagship_cells"] = flagship_cells
    return out


def oracle_sql() -> dict[str, str]:
    from tablestructurerec_spark.operators import dedup, relational, similarity, textstats

    out = dict(relational.ORACLE_SQL)
    out.update(textstats.ORACLE_SQL)
    out.update(dedup.ORACLE_SQL)
    out.update(similarity.ORACLE_SQL)
    # flagship_extract: the embedded 2x2 metadata table is reconstructed
    # byte-exactly, so the oracle can re-derive pred_html from documents.
    out["flagship_extract"] = """
SELECT source AS conv_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS INT) AS turn_idx,
       0 AS table_idx,
       'wired' AS table_kind,
       '<html><body><table><tr><td rowspan=1 colspan=1>doc ' || doc_id
       || '</td><td rowspan=1 colspan=1>' || lang
       || '</td></tr><tr><td rowspan=1 colspan=1>' || source
       || '</td><td rowspan=1 colspan=1>' || n_chars
       || '</td></tr></table></body></html>' AS pred_html,
       4 AS n_cells
FROM documents
ORDER BY conv_id, turn_idx
"""
    # flagship_cells: the per-cell spans of that 2x2 metadata table are fully
    # determined by the engine's deterministic grid geometry (col 120 x row
    # 40, 2px ocr-fragment insets) — ref-equivalent envelope semantics
    # (transform_res, lineless_table_rec/main.py:137-164)
    out["flagship_cells"] = """
WITH turns AS (
  SELECT source AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS INT) AS turn_idx
  FROM documents
), grid(cell_id, r, c) AS (
  VALUES (0, 0, 0), (1, 0, 1), (2, 1, 0), (3, 1, 1)
)
SELECT conv_id, turn_idx,
       0 AS table_idx, 'wired' AS table_kind, cell_id,
       CAST(c * 120 + 2 AS DOUBLE) AS xmin,
       CAST(r * 40 + 2 AS DOUBLE) AS ymin,
       CAST((c + 1) * 120 - 2 AS DOUBLE) AS xmax,
       CAST((r + 1) * 40 - 2 AS DOUBLE) AS ymax,
       r AS row_start, r AS row_end, c AS col_start, c AS col_end
FROM turns CROSS JOIN grid
ORDER BY conv_id, turn_idx, cell_id
"""
    return out
