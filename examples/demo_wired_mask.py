#!/usr/bin/env python
"""Wired model-mask demo — the analogue of the reference's demo_wired.py:
a UNet-style class mask (0 bg / 1 h-line / 2 v-line) goes through the full
cv2-free postprocess (morphological close → line segments → skew fix →
cells) and TableRecover, batched in a Spark mapInPandas stage.
Run:  PYTHONPATH=. python examples/demo_wired_mask.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

import numpy as np

from tablestructurerec_spark.core.cells_from_lines import raster_segments
from tablestructurerec_spark.core.morphology import rotate_mask
from tablestructurerec_spark.inference.runner import pack_class_mask, wired_structure_infer
from tablestructurerec_spark.session import get_spark

def grid_mask(angle):
    shape = (300, 360)
    rows = [(40, 40 + r * 40, 280, 40 + r * 40) for r in range(4)]
    cols = [(40 + c * 60, 40, 40 + c * 60, 160) for c in range(5)]
    hm, vm = raster_segments(shape, rows, 2), raster_segments(shape, cols, 2)
    if angle:
        hm, vm = rotate_mask(hm, -angle), rotate_mask(vm, -angle)
    pred = np.zeros(shape, dtype=np.uint8)
    pred[hm] = 1
    pred[vm] = 2
    return pred

if __name__ == "__main__":
    spark = get_spark(app="demo-wired", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    rows = [("demo", i, 0, pack_class_mask(grid_mask(a))) for i, a in enumerate([0.0, 5.0, -7.0])]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, table_idx int, payload binary")
    wired_structure_infer(df).select("turn_idx", "n_cells", "logic_points").show(truncate=80)
    spark.stop()
