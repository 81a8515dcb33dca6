#!/usr/bin/env python
"""Re-OCR loop demo — the engine analogue of the reference's manual
``re_rec`` path (/root/reference/wired_table_rec/main.py:119,195-223):
blank / low-confidence cells are perspective-cropped out of their turn's
image, OCR'd (deterministic fake engine here; register a RapidOCR adapter
with ``register_ocr_engine`` on a real cluster), and merged back into the
cell map with the reference's fill-blank fallback.

Run:  PYTHONPATH=. python examples/demo_reocr.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tablestructurerec_spark.inference.runner import pack_class_mask
from tablestructurerec_spark.plans.reocr import re_rec
from tablestructurerec_spark.session import get_spark

if __name__ == "__main__":
    spark = get_spark(app="demo-reocr", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")

    # one synthetic page: gradient content, cell grid of 2x2
    y, x = np.mgrid[0:200, 0:300]
    img = ((x + y) % 256).astype(np.uint8)
    img[100:200, 150:300] = 255  # bottom-right cell blank -> fill-blank path
    images = spark.createDataFrame(
        [("conv0", 1, bytearray(pack_class_mask(img)))],
        "conv_id string, turn_idx int, payload binary",
    )
    cells = spark.createDataFrame(
        [
            ("conv0", 1, 0, 0, [0.0, 0.0, 150.0, 0.0, 150.0, 100.0, 0.0, 100.0], 0.95, "ok"),
            ("conv0", 1, 0, 1, [150.0, 0.0, 300.0, 0.0, 300.0, 100.0, 150.0, 100.0], 0.4, "low"),
            ("conv0", 1, 0, 2, [0.0, 100.0, 150.0, 100.0, 150.0, 200.0, 0.0, 200.0], 0.9, ""),
            ("conv0", 1, 0, 3, [150.0, 100.0, 300.0, 100.0, 300.0, 200.0, 150.0, 200.0], 0.9, ""),
        ],
        "conv_id string, turn_idx int, table_idx int, cell_id int, "
        "quad array<double>, score double, text string",
    )
    for r in re_rec(cells, images, engine="fake").orderBy("cell_id").collect():
        print(
            f"cell {r.cell_id}: rerec={r.rerecognized} text={r.text!r} "
            f"score={r.score} box={[round(v) for v in r.ocr_box]}"
        )
