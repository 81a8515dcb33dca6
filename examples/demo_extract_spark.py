#!/usr/bin/env python
"""End-to-end Spark demo: synthetic transcripts → extraction plan → per-turn
tables + per-cell spans, the distributed analogue of looping the reference
engine over images.  Run:  PYTHONPATH=. python examples/demo_extract_spark.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from tablestructurerec_spark.plans.extract import extract_cells, extract_tables
from tablestructurerec_spark.session import get_spark
from tablestructurerec_spark.sources.synthetic import synth_transcripts

if __name__ == "__main__":
    spark = get_spark(app="demo-extract", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    tr = synth_transcripts(spark, n_convs=20, seed=42)
    tables = extract_tables(tr)
    tables.select("conv_id", "turn_idx", "table_idx", "table_kind", "n_cells").show(8)
    extract_cells(tr).show(8)
    spark.stop()
