"""Re-OCR hook (M10 consumer): crop payloads for an external OCR stage.

The reference's ``re_rec_high_precise`` (wired_table_rec/main.py:195-223)
perspective-crops each unrecognized cell quad out of the image, pads a
10px white border, and feeds the patch to RapidOCR.  The OCR engine itself
is external (in the reference too — the loop is manual-only); the graft's
job is the distributed plumbing up to the OCR call:

* select the cells worth re-recognizing — empty text (the reference's
  trigger) or low structure confidence;
* join them to their turn's image payload (plain equi-join on the turn
  key; both sides are large, so no broadcast hint — AQE decides);
* one Arrow-batched ``mapInPandas`` doing the M10 perspective crop
  (:func:`core.morphology.perspective_crop`, exact homography + the
  h/w >= 1.5 rot90 rule) plus the 10px white pad, emitting npy-packed
  patches keyed (conv_id, turn_idx, table_idx, cell_id).

An OCR stage consumes the output table and left-joins results back on the
cell key — the distributed analogue of the reference's in-place
``cell_box_map`` update.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.morphology import perspective_crop
from ..inference.runner import pack_class_mask, unpack_class_mask

__all__ = ["low_confidence_cells", "REOCR_SCHEMA"]

REOCR_SCHEMA = (
    "conv_id string, turn_idx int, table_idx int, cell_id int, "
    "crop binary, crop_h int, crop_w int"
)


def low_confidence_cells(
    cells: DataFrame,
    images: DataFrame,
    score_thresh: float = 0.75,
    pad: int = 10,
) -> DataFrame:
    """cells(conv_id, turn_idx, table_idx, cell_id, quad array<double>[8],
    score double, text string) x images(conv_id, turn_idx, payload binary
    npy image) → one crop row per cell needing re-OCR.

    A cell qualifies when its text is missing/empty (the reference's
    trigger for ``re_rec``) or its score is below ``score_thresh``.
    """
    low = cells.where(
        F.col("text").isNull()
        | (F.col("text") == "")
        | (F.col("score") < score_thresh)
    ).select("conv_id", "turn_idx", "table_idx", "cell_id", "quad")
    src = low.join(
        images.select("conv_id", "turn_idx", "payload"), ["conv_id", "turn_idx"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "conv_id", "turn_idx", "table_idx", "cell_id",
                "crop", "crop_h", "crop_w",
            )}
            for conv_id, turn_idx, table_idx, cell_id, quad, payload in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["table_idx"],
                pdf["cell_id"], pdf["quad"], pdf["payload"],
            ):
                img = unpack_class_mask(payload)
                q = np.asarray(quad, dtype=float).reshape(4, 2)
                crop = perspective_crop(img, q)
                spatial = [(pad, pad), (pad, pad)] + [(0, 0)] * (crop.ndim - 2)
                padded = np.pad(crop, spatial, constant_values=255)
                out["conv_id"].append(conv_id)
                out["turn_idx"].append(int(turn_idx))
                out["table_idx"].append(int(table_idx))
                out["cell_id"].append(int(cell_id))
                out["crop"].append(pack_class_mask(padded))
                out["crop_h"].append(padded.shape[0])
                out["crop_w"].append(padded.shape[1])
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=REOCR_SCHEMA)
