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

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.morphology import perspective_crop
from ..inference.runner import pack_class_mask, unpack_class_mask

__all__ = [
    "low_confidence_cells",
    "REOCR_SCHEMA",
    "REC_SCHEMA",
    "register_ocr_engine",
    "recognize_crops",
    "apply_reocr",
    "re_rec",
]

REOCR_SCHEMA = (
    "conv_id string, turn_idx int, table_idx int, cell_id int, "
    "crop binary, crop_h int, crop_w int"
)


def _needs_rec(score_thresh: float):
    """Shared selection predicate: blank text OR low/UNKNOWN confidence.
    A NULL score must select (coalesce to true) — and the predicate must be
    the SAME expression in the crop stage and the merge-back, or a
    null-score cell would be dropped by one and fill-blanked by the other.
    """
    return (
        F.col("text").isNull()
        | (F.col("text") == "")
        | F.coalesce(F.col("score") < F.lit(score_thresh), F.lit(True))
    )


def low_confidence_cells(
    cells: DataFrame,
    images: DataFrame,
    score_thresh: float = 0.75,
    pad: int = 10,
    select_all: bool = False,
) -> DataFrame:
    """cells(conv_id, turn_idx, table_idx, cell_id, quad array<double>[8],
    score double, text string) x images(conv_id, turn_idx, payload binary
    npy image) → one crop row per cell needing re-OCR.

    A cell qualifies when its text is missing/empty (the reference's
    trigger for ``re_rec``) or its score is below ``score_thresh``.
    Pass ``select_all=True`` for the ``re_rec_high_precise`` mode
    (wired_table_rec/main.py:203: the map is reset and EVERY polygon is
    re-cropped and re-recognized, not just the blank ones).
    """
    low = cells if select_all else cells.where(_needs_rec(score_thresh))
    low = low.select("conv_id", "turn_idx", "table_idx", "cell_id", "quad")
    # group the selected quads per turn BEFORE joining the image: the
    # payload (MBs) crosses the exchange once per TURN and is decoded once,
    # instead of being replicated and re-decoded once per cell (a turn can
    # have dozens of blank cells; the quads are a few hundred bytes)
    grouped = low.groupBy("conv_id", "turn_idx").agg(
        F.collect_list(F.struct("table_idx", "cell_id", "quad")).alias("cells")
    )
    src = grouped.join(
        images.select("conv_id", "turn_idx", "payload"), ["conv_id", "turn_idx"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "conv_id", "turn_idx", "table_idx", "cell_id",
                "crop", "crop_h", "crop_w",
            )}
            for conv_id, turn_idx, cell_rows, payload in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["cells"], pdf["payload"]
            ):
                img = unpack_class_mask(payload)  # once per turn
                for cell in cell_rows:  # struct -> dict under Arrow
                    table_idx, cell_id, quad = (
                        cell["table_idx"], cell["cell_id"], cell["quad"]
                    )
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


# ---------------------------------------------------------------------------
# The OCR stage itself + merge-back (the full re_rec loop, distributed)
# ---------------------------------------------------------------------------
#
# The reference's loop (wired_table_rec/main.py:195-223) is: crop+pad each
# polygon, call self.ocr(pad_img), and write the rec lines back into
# cell_box_map — with the fill-blank fallback `[poly, "", 1.0]` when OCR
# returns nothing (main.py:212-215; fill_blank_rec main.py:180-193 is the
# same fallback applied without re-running OCR).  Distributed shape:
#
#   crops = low_confidence_cells(cells, images, select_all=high_precise)
#   recs  = recognize_crops(crops, engine="...")     # mapInPandas, per-worker engine
#   out   = apply_reocr(cells, recs, high_precise=…) # left join + fallback
#
# One output row per rec line (a cell can yield several) — the downstream
# A5 gather operator consumes exactly that shape, mirroring the reference's
# sort_and_gather_ocr_res over the per-cell lists (main.py:169-178).

REC_SCHEMA = (
    "conv_id string, turn_idx int, table_idx int, cell_id int, "
    "ocr_box array<double>, rec_text string, rec_score double"
)

#: name -> zero-arg factory returning ``engine(img) -> [(box4, text, score)]``
#: where box4 is (xmin, ymin, xmax, ymax) in crop coordinates.  Register a
#: RapidOCR adapter here on a real cluster; the engine is constructed once
#: per python worker (same pattern as inference.runner.get_backend).
OCR_ENGINES = {}
_OCR_CACHE = {}


def register_ocr_engine(name, factory):
    OCR_ENGINES[name] = factory


def _get_ocr(engine):
    """Per-worker engine singleton.  ``engine`` is a registry NAME (only
    works for factories registered at import time of a module shipped to
    the workers — a ``register_ocr_engine`` call made at runtime on the
    driver mutates the driver's registry only) or a FACTORY CALLABLE,
    which travels inside the task closure and therefore always works."""
    if callable(engine):
        # cache key = the factory's pickled closure bytes: identical across
        # a job's tasks (one heavy construction per worker process) yet
        # distinct for differently-configured factories from the same code
        # path (make_engine('en') vs make_engine('ch') capture different
        # values).  __qualname__ would collide those; id()/repr() would
        # rebuild per task.
        try:
            from pyspark import cloudpickle

            key = hashlib.sha256(cloudpickle.dumps(engine)).hexdigest()
        except Exception:  # unpicklable factory: construct fresh, no cache
            return engine()
        if key not in _OCR_CACHE:
            _OCR_CACHE[key] = engine()
        return _OCR_CACHE[key]
    if engine not in _OCR_CACHE:
        try:
            factory = OCR_ENGINES[engine]
        except KeyError:
            raise ValueError(
                f"unknown OCR engine {engine!r}; pass the factory callable "
                "itself, or register_ocr_engine() at import time in a "
                "module shipped to the workers"
            ) from None
        # construct OUTSIDE the lookup's try: a KeyError raised inside the
        # factory body must surface as itself, not as 'unknown engine'
        _OCR_CACHE[engine] = factory()
    return _OCR_CACHE[engine]


def _fake_ocr_engine():
    """Deterministic stand-in (no OCR model in this container): one rec
    line per crop derived from the crop's pixel content; crops that are
    entirely white (blank cells) yield no result — exercising the
    reference's empty-OCR fallback branch (main.py:212-215)."""

    def run(img: "np.ndarray"):
        arr = np.asarray(img, dtype=np.float64)
        if arr.size == 0 or float(arr.min()) >= 250.0:
            return []
        h, w = arr.shape[0], arr.shape[1]
        mean = int(round(float(arr.mean())))
        return [
            (
                (0.0, 0.0, float(w), float(h)),
                f"rec:{h}x{w}:{mean}",
                round(1.0 - (mean % 100) / 1000.0, 3),
            )
        ]

    return run


register_ocr_engine("fake", _fake_ocr_engine)


def _rapidocr_engine():  # pragma: no cover - needs the rapidocr wheel
    """Adapter for the engine the reference drives (``rapidocr``,
    wired_table_rec/main.py:254 + the ``self.ocr(pad_img, use_det=True,
    use_cls=True, use_rec=True)`` call at main.py:211): constructed once
    per worker, normalizes rec tuples (quad-or-box, text, score) to the
    (xmin, ymin, xmax, ymax) box contract.  Lazy import — the wheel is not
    in this container; registration is unconditional so a cluster with it
    installed just passes ``engine="rapidocr"``."""
    import importlib

    ocr = importlib.import_module("rapidocr").RapidOCR()

    def run(img: "np.ndarray"):
        res, _ = ocr(img, use_det=True, use_cls=True, use_rec=True)
        out = []
        for det in res or []:
            box, text, score = det[0], det[1], det[2]
            b = np.asarray(box, dtype=float).reshape(-1, 2)
            out.append(
                (
                    (float(b[:, 0].min()), float(b[:, 1].min()),
                     float(b[:, 0].max()), float(b[:, 1].max())),
                    text,
                    float(score),
                )
            )
        return out

    return run


register_ocr_engine("rapidocr", _rapidocr_engine)


def recognize_crops(crops: DataFrame, engine="fake") -> DataFrame:
    """OCR each crop payload; one output row per recognized line.

    Arrow-batched ``mapInPandas``; the engine is a per-worker singleton so
    a real OCR session (onnx/paddle) loads once per executor core, not per
    batch.  Cells whose OCR comes back empty emit NO row here — the
    fallback lives in :func:`apply_reocr` (join-side), keeping this stage
    a pure map.
    """
    src = crops.select("conv_id", "turn_idx", "table_idx", "cell_id", "crop")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ocr = _get_ocr(engine)
        for pdf in batches:
            out = {k: [] for k in (
                "conv_id", "turn_idx", "table_idx", "cell_id",
                "ocr_box", "rec_text", "rec_score",
            )}
            for conv_id, turn_idx, table_idx, cell_id, blob in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["table_idx"],
                pdf["cell_id"], pdf["crop"],
            ):
                for box, text, score in ocr(unpack_class_mask(blob)):
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(int(turn_idx))
                    out["table_idx"].append(int(table_idx))
                    out["cell_id"].append(int(cell_id))
                    out["ocr_box"].append([float(v) for v in box])
                    out["rec_text"].append(str(text))
                    out["rec_score"].append(float(score))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=REC_SCHEMA)


def apply_reocr(
    cells: DataFrame,
    recs: DataFrame,
    score_thresh: float = 0.75,
    high_precise: bool = False,
) -> DataFrame:
    """Merge rec lines back into the cell map — the distributed analogue of
    the reference's in-place ``cell_box_map`` update.

    * a cell with rec rows → those rows (new box/text/score; several per
      cell possible, as in the reference where one crop can produce
      multiple det lines, main.py:216-218);
    * a selected cell with NO rec rows → the fill-blank row
      ``(quad-as-box, "", 1.0)`` (main.py:212-215 / fill_blank_rec);
    * in the default (non-high-precise) mode, unselected cells pass
      through untouched.

    Plain equi-join on the cell key; recs is usually a small fraction of
    cells, so AQE picks broadcast when it fits — no forced hint.
    """
    key = ["conv_id", "turn_idx", "table_idx", "cell_id"]
    selected = F.lit(True) if high_precise else _needs_rec(score_thresh)
    joined = cells.withColumn("_sel", selected).join(recs, key, "left")
    # quad (8 floats) -> axis-aligned box for the fallback, like the
    # reference's box_4_2_poly_to_box_4_1 on the t_ocr_res path.
    xs = F.array(F.col("quad")[0], F.col("quad")[2], F.col("quad")[4], F.col("quad")[6])
    ys = F.array(F.col("quad")[1], F.col("quad")[3], F.col("quad")[5], F.col("quad")[7])
    quad_box = F.array(F.array_min(xs), F.array_min(ys), F.array_max(xs), F.array_max(ys))
    has_rec = F.col("rec_text").isNotNull()
    return joined.select(
        *key,
        F.col("quad"),
        F.when(~F.col("_sel"), F.col("text"))
        .when(has_rec, F.col("rec_text"))
        .otherwise(F.lit("")).alias("text"),
        F.when(~F.col("_sel"), F.col("score"))
        .when(has_rec, F.col("rec_score"))
        .otherwise(F.lit(1.0)).alias("score"),
        F.when(F.col("_sel") & has_rec, F.col("ocr_box"))
        .otherwise(quad_box).alias("ocr_box"),
        F.col("_sel").alias("rerecognized"),
    )


def re_rec(
    cells: DataFrame,
    images: DataFrame,
    engine="fake",
    score_thresh: float = 0.75,
    pad: int = 10,
    high_precise: bool = False,
) -> DataFrame:
    """The full loop: select → crop (M10) → OCR → merge-back.

    ``high_precise=False`` re-recognizes only blank/low-score cells
    (fill_blank_rec trigger, wired_table_rec/main.py:119);
    ``high_precise=True`` redoes every cell (re_rec_high_precise,
    main.py:195-223).

    NB: the returned plan references ``cells`` TWICE (crop side and
    merge-back side).  If ``cells`` is an expensive pipeline (e.g.
    ``extract_cells`` over the corpus), persist or checkpoint it first —
    otherwise Spark recomputes its whole lineage for each subtree.
    """
    crops = low_confidence_cells(
        cells, images, score_thresh=score_thresh, pad=pad, select_all=high_precise
    )
    recs = recognize_crops(crops, engine=engine)
    return apply_reocr(cells, recs, score_thresh=score_thresh, high_precise=high_precise)


# ---------------------------------------------------------------------------
# Driver-oracle face: apply_reocr over a deterministic cell map derived from
# the documents table, so the merge-back semantics (rec replacement,
# fill-blank fallback, passthrough, multi-line rows) are DuckDB-verifiable.
# ---------------------------------------------------------------------------

def _reocr_inputs(spark, sf_dir: str):
    from tablestructurerec_spark.sources.read import read_table

    docs = read_table(spark, sf_dir, "documents")
    base = docs.select(
        F.col("source").alias("conv_id"),
        (F.col("doc_id") % 50).cast("int").alias("turn_idx"),
        F.lit(0).alias("table_idx"),
        F.col("doc_id").cast("int").alias("cell_id"),
        F.col("n_chars").cast("double").alias("w"),
        ((F.col("doc_id") % 100) / F.lit(100.0)).alias("score"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("")).otherwise(
            F.substring("text", 1, 8)
        ).alias("text"),
        F.col("doc_id"),
    )
    cells = base.select(
        "conv_id", "turn_idx", "table_idx", "cell_id",
        F.array(
            F.lit(0.0), F.lit(0.0), F.col("w"), F.lit(0.0),
            F.col("w"), F.lit(20.0), F.lit(0.0), F.lit(20.0),
        ).alias("quad"),
        "score", "text",
    )
    # rec lines exist only for SELECTED cells (they come from crops of the
    # selected set in re_rec); every 4th gets one line, every 8th a second.
    sel = base.where((F.col("text") == "") | (F.col("score") < 0.75))
    rec1 = sel.where(F.col("doc_id") % 4 == 0).select(
        "conv_id", "turn_idx", "table_idx", "cell_id",
        F.array(F.lit(1.0), F.lit(1.0), F.lit(2.0), F.lit(2.0)).alias("ocr_box"),
        F.concat(F.lit("rec-"), F.col("doc_id")).alias("rec_text"),
        F.lit(0.9).alias("rec_score"),
    )
    rec2 = sel.where(F.col("doc_id") % 8 == 0).select(
        "conv_id", "turn_idx", "table_idx", "cell_id",
        F.array(F.lit(1.0), F.lit(21.0), F.lit(2.0), F.lit(22.0)).alias("ocr_box"),
        F.concat(F.lit("rec2-"), F.col("doc_id")).alias("rec_text"),
        F.lit(0.8).alias("rec_score"),
    )
    return cells, rec1.unionAll(rec2)


def q_reocr_merge(spark, sf_dir: str):
    cells, recs = _reocr_inputs(spark, sf_dir)
    out = apply_reocr(cells, recs)
    return out.select(
        "conv_id", "turn_idx", "table_idx", "cell_id", "text",
        F.round("score", 6).alias("score"),
        F.col("ocr_box")[0].alias("ocr_x0"),
        F.col("ocr_box")[1].alias("ocr_y0"),
        F.col("ocr_box")[2].alias("ocr_x1"),
        F.col("ocr_box")[3].alias("ocr_y1"),
        F.col("rerecognized").cast("int").alias("rerecognized"),
    ).orderBy("cell_id", "text")


REOCR_MERGE_ORACLE = """
WITH base AS (
  SELECT source AS conv_id, CAST(doc_id % 50 AS INT) AS turn_idx, 0 AS table_idx,
         CAST(doc_id AS INT) AS cell_id, CAST(n_chars AS DOUBLE) AS w,
         (doc_id % 100) / 100.0 AS score,
         CASE WHEN doc_id % 3 = 0 THEN '' ELSE substr(text, 1, 8) END AS text,
         doc_id
  FROM documents
),
sel AS (SELECT *, (text = '' OR score < 0.75) AS s FROM base),
recs AS (
  SELECT conv_id, turn_idx, table_idx, cell_id,
         1.0 AS rx0, 1.0 AS ry0, 2.0 AS rx1, 2.0 AS ry1,
         'rec-' || doc_id AS rec_text, 0.9 AS rec_score
  FROM sel WHERE s AND doc_id % 4 = 0
  UNION ALL
  SELECT conv_id, turn_idx, table_idx, cell_id,
         1.0, 21.0, 2.0, 22.0, 'rec2-' || doc_id, 0.8
  FROM sel WHERE s AND doc_id % 8 = 0
)
SELECT b.conv_id, b.turn_idx, b.table_idx, b.cell_id,
       CASE WHEN NOT b.s THEN b.text
            WHEN r.rec_text IS NOT NULL THEN r.rec_text
            ELSE '' END AS text,
       ROUND(CASE WHEN NOT b.s THEN b.score
            WHEN r.rec_text IS NOT NULL THEN r.rec_score
            ELSE 1.0 END, 6) AS score,
       CASE WHEN b.s AND r.rec_text IS NOT NULL THEN r.rx0 ELSE 0.0 END AS ocr_x0,
       CASE WHEN b.s AND r.rec_text IS NOT NULL THEN r.ry0 ELSE 0.0 END AS ocr_y0,
       CASE WHEN b.s AND r.rec_text IS NOT NULL THEN r.rx1 ELSE b.w END AS ocr_x1,
       CASE WHEN b.s AND r.rec_text IS NOT NULL THEN r.ry1 ELSE 20.0 END AS ocr_y1,
       CAST(b.s AS INT) AS rerecognized
FROM sel b LEFT JOIN recs r
  ON b.conv_id = r.conv_id AND b.turn_idx = r.turn_idx
 AND b.table_idx = r.table_idx AND b.cell_id = r.cell_id
ORDER BY b.cell_id, text
"""
