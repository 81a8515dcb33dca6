"""Bucketed-table layout for shuffle-free (co-located) joins.

At 100 TB the expensive joins are the ones whose BOTH sides are large —
e.g. the extraction output's turns↔cells join that every downstream
consumer (re-OCR, TEDS eval, span analytics) repeats.  Writing both tables
bucketed by the same key with the same bucket count makes every such join
co-located: Spark's bucketing metadata proves the partitioning matches, so
the SortMergeJoin runs with ZERO Exchange — the shuffle is paid once at
write time, then amortized over every subsequent join.

``write_bucketed`` is the layout writer (hash-bucketed, per-bucket sorted —
the parquet analogue of an Iceberg bucket-partitioned table);
``bucketed_extraction_tables`` materializes the flagship extraction output
in that layout.  ``tests/test_bucketing.py`` pins the no-Exchange plan and
value-equality against the plain join.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_extraction_tables"]


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: "str | list[str]",
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Save ``df`` as a session-catalog table hash-bucketed by ``keys``.

    Joins between tables written with the SAME (keys, n_buckets) are
    co-located: no Exchange on either side.  Bucket by the FULL join key
    list — the v1 bucketed-scan planner only matches the join's required
    hash partitioning exactly.  ``sort=True`` additionally sorts within
    buckets so the SortMergeJoin can skip its Sort too.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a location orphaned by a previous session (table gone from this
    # session's metastore, directory still on disk) fails saveAsTable with
    # LOCATION_ALREADY_EXISTS — clear it.  Only the simple local-warehouse
    # case is handled (unqualified name, file: or schemeless warehouse);
    # qualified names / remote warehouses resolve their location in the
    # catalog, not here.
    name = table.strip().lower()
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    parsed = urlparse(warehouse)
    if name and "." not in name and parsed.scheme in ("", "file"):
        wh_path = unquote(parsed.path) if parsed.scheme == "file" else warehouse
        loc = os.path.join(wh_path, name)
        if os.path.isdir(loc):
            shutil.rmtree(loc)
    keys = [keys] if isinstance(keys, str) else list(keys)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, keys[0], *keys[1:]
    )
    if sort:
        writer = writer.sortBy(keys[0], *keys[1:])
    writer.saveAsTable(table)


def bucketed_extraction_tables(
    spark: SparkSession,
    transcripts: DataFrame,
    prefix: str = "tsr",
    n_buckets: int = 16,
) -> tuple[str, str]:
    """Materialize the extraction output as co-located bucketed tables.

    ``{prefix}_turns``  (conv_id, turn_idx, main_text)
    ``{prefix}_tables`` (conv_id, turn_idx, table_idx, table_kind,
                         pred_html, n_cells)
    both bucketed by (conv_id, turn_idx) — the key every downstream join
    uses.  Returns the two table names.
    """
    from .extract import extract_transcripts

    turns, tables = extract_transcripts(transcripts)
    t_turns, t_tables = f"{prefix}_turns", f"{prefix}_tables"
    write_bucketed(
        turns.select("conv_id", "turn_idx", "main_text"),
        t_turns,
        ["conv_id", "turn_idx"],
        n_buckets,
    )
    write_bucketed(
        tables.select(
            "conv_id", "turn_idx", "table_idx", "table_kind", "pred_html", "n_cells"
        ),
        t_tables,
        ["conv_id", "turn_idx"],
        n_buckets,
    )
    return t_turns, t_tables
