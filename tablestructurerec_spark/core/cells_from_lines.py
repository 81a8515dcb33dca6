"""Wired-path cell extraction from ruling lines (the M6 tail, cv2-free).

The reference's UNet postprocess (wired_table_rec/table_structure_unet.py:
78-206) rasterizes the detected row/col line segments, takes connected
components of the NON-line interior regions, and turns each region into a
cell quad via min-area-rect with size filters (min_area_rect_box,
utils_table_line_rec.py:619-653: drop regions bigger than half the canvas or
thinner than 15px).  This module reproduces that composition with pure
numpy: segment rasterization → interior labeling (two-pass union-find) →
per-region ordered min-area-rect quads, ready for
:func:`core.recover.recover_logic_points`.

The reference's cv2 morphology (CLOSE with sqrt(w)-wide kernels) and skew
rotation are image-conditioning steps for noisy model masks; deterministic
segment input doesn't need them, and they are documented out of scope in
COVERAGE.md (no cv2 in this container).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .lines import min_area_rect_corners
from .wired_lines import label_components

__all__ = ["raster_segments", "cells_from_segments"]


def raster_segments(
    shape: Sequence[int], segments: Sequence[Sequence[float]], thickness: int = 3
) -> np.ndarray:
    """Binary mask with each (x0, y0, x1, y1) segment drawn ``thickness`` wide."""
    h, w = shape
    mask = np.zeros((h, w), dtype=bool)
    half = thickness // 2
    for x0, y0, x1, y1 in segments:
        n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
        xs = np.clip(np.round(np.linspace(x0, x1, n)).astype(int), 0, w - 1)
        ys = np.clip(np.round(np.linspace(y0, y1, n)).astype(int), 0, h - 1)
        for dy in range(-half, half + 1):
            for dx in range(-half, half + 1):
                mask[np.clip(ys + dy, 0, h - 1), np.clip(xs + dx, 0, w - 1)] = True
    return mask


def cells_from_segments(
    shape: Sequence[int],
    row_segments: Sequence[Sequence[float]],
    col_segments: Sequence[Sequence[float]],
    thickness: int = 3,
    min_side: float = 15,
) -> List[np.ndarray]:
    """Ruling segments → counter-clockwise cell quads in reading order.

    Contract shape (ref table_structure_unet.py:78-206 + min_area_rect_box
    :619-653): rasterize lines, connected-components of the interior,
    filter regions larger than half the canvas or with a side < ``min_side``,
    min-area-rect each survivor.  Returns ccw [tl, bl, br, tr] quads sorted
    top-to-bottom / left-to-right — the orientation and order
    ``recover_logic_points`` consumes.
    """
    lines = raster_segments(shape, list(row_segments) + list(col_segments), thickness)
    return cells_from_line_mask(lines, min_side)


def cells_from_line_mask(lines: np.ndarray, min_side: float = 15) -> List[np.ndarray]:
    """Rasterized line mask → ccw cell quads in reading order (the shared
    interior-CC body of cells_from_segments and the morphology skew path —
    cal_region_boxes, table_structure_unet.py:147-158 + min_area_rect_box
    filters)."""
    lines = np.asarray(lines, dtype=bool)
    h, w = lines.shape
    labels = label_components(~lines)
    quads: List[np.ndarray] = []
    for lab in range(1, labels.max() + 1):
        coords = np.argwhere(labels == lab)  # (row, col)
        y0, x0 = coords.min(axis=0)
        y1, x1 = coords.max(axis=0)
        bw, bh = x1 - x0 + 1, y1 - y0 + 1
        # reference filter chain (min_area_rect_box, utils_table_line_rec.py
        # :627,647-651, called with filtersmall=True): bbox 3/4-canvas
        # pre-filter, then MIN-AREA-RECT area < half canvas and rect sides
        # >= 15 — bbox-based tests diverge on skewed regions (a rotated
        # cell's bbox can cover most of the canvas while its rect doesn't;
        # a thin diagonal's bbox looks big while its rect is 3px wide)
        if bw * bh > 0.75 * w * h:
            continue
        quad = min_area_rect_corners(coords)  # cw [tl, tr, br, bl] full rect
        rw = float(np.hypot(*(quad[1] - quad[0])))
        rh = float(np.hypot(*(quad[2] - quad[1])))
        if rw * rh >= 0.5 * w * h:
            continue
        if rw < min_side or rh < min_side:
            continue
        # cw [tl, tr, br, bl] → ccw [tl, bl, br, tr]
        quads.append(np.array([quad[0], quad[3], quad[2], quad[1]], dtype=float))
    if quads:
        # W2 banded reading-order sort — tolerant to ±1px ragged cell tops
        # (a naive (y, x) sort scrambles within-row order on deskewed masks)
        from .polys import sort_quads

        quads = [q for q in sort_quads(np.asarray(quads))]
    return quads
