"""CycleCenterNet / UNet wired-path kernels: quad NMS, grid-vertex snapping,
line-mask segment extraction.

From-scratch reproductions of the remaining wired-table operators in
``wired_table_rec/utils/utils_table_line_rec.py``:

* ``quad_nms``            — ref :295-334 (greedy center-inside-quad
  suppression, with its early-``break``-on-first-low-score quirks)
* ``snap_cells_to_grid``  — ref :337-397 ``group_bbox_by_gbox``: a spatial
  nearest-neighbor join-with-update that pulls cell corners onto shared
  grid-box vertices
* ``mask_to_line_segments`` — ref :400-418 ``get_table_line``: 8-connected
  component labeling of a binary line mask → per-component min-area-rect
  medial segments.  The reference uses skimage.measure; this container has
  neither skimage nor cv2, so labeling is a two-pass union-find in numpy —
  same components, same outputs.

All of these run per table image inside pandas UDFs (tiny per-table data).
"""

from __future__ import annotations

import math
from typing import List

import numpy as np

from .lines import min_area_rect

__all__ = ["quad_nms", "snap_cells_to_grid", "mask_to_line_segments", "label_components"]


def _center_side_test(det_row, cx: float, cy: float) -> bool:
    """Is (cx, cy) strictly inside the quad det_row[:8] (cross-product side
    tests, all same sign)?  Ref :313-321 / :340-350."""
    x1, y1, x2, y2, x3, y3, x4, y4 = det_row[:8]
    a = (x2 - x1) * (cy - y1) - (y2 - y1) * (cx - x1)
    b = (x3 - x2) * (cy - y2) - (y3 - y2) * (cx - x2)
    c = (x4 - x3) * (cy - y3) - (y4 - y3) * (cx - x3)
    d = (x1 - x4) * (cy - y4) - (y1 - y4) * (cx - x4)
    return (a > 0 and b > 0 and c > 0 and d > 0) or (a < 0 and b < 0 and c < 0 and d < 0)


def quad_nms(dets: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy polygon NMS on score-sorted (N, 9) quad+score rows.

    Contract (ref nms :295-334), including its quirks: the outer loop stops
    at the first det below ``thresh`` (input is score-descending); the inner
    scan ``break``s at ``i == j`` or the first low-score det; det i survives
    when no higher-scoring det contains its center.
    """
    if len(dets) < 2:
        return dets
    keep_idx = []
    for i in range(len(dets)):
        if dets[i][-1] < thresh:
            break
        cx = (dets[i][0] + dets[i][2] + dets[i][4] + dets[i][6]) / 4
        cy = (dets[i][1] + dets[i][3] + dets[i][5] + dets[i][7]) / 4
        verdict = -1
        for j in range(len(dets)):
            if i == j or dets[j][-1] < thresh:
                break
            if _center_side_test(dets[j], cx, cy):
                if dets[i][8] > dets[j][8] and verdict < 0:
                    verdict = i
                elif dets[i][8] < dets[j][8]:
                    verdict = -2
                    break
        if verdict > -1:
            keep_idx.append(verdict)
        elif verdict == -1:
            keep_idx.append(i)
    return np.array([dets[k] for k in keep_idx])


def snap_cells_to_grid(
    cell_rows: np.ndarray,
    grid_rows: np.ndarray,
    score_thred: float = 0.3,
    v2c_dist_thred: float = 2,
    c2v_dist_thred: float = 0.5,
) -> np.ndarray:
    """Snap cell-quad corners onto shared grid-box vertices (in place).

    ``cell_rows``: (N, 9) [8 corner coords, score], score-descending.
    ``grid_rows``: (M, 11) [vertex xy, 4 center xys, score], score-descending.
    Contract (ref group_bbox_by_gbox :337-397): for each grid box vertex and
    each of its 4 centers (skipping degenerate vertex≈center pairs), find
    cells containing the center; move the cell's nearest corner (within
    0.5·max(w,h)) to the vertex, at most once per corner.  Early ``break``
    at the first low-score grid box / cell (inputs score-sorted).
    """
    snapped = cell_rows  # mutated, as in the reference
    work = cell_rows.copy()
    sign = np.zeros((len(work), 4))
    for gbox in grid_rows:
        if gbox[10] < score_thred:
            break
        vx, vy = gbox[0], gbox[1]
        for i in range(4):
            ctr = (gbox[2 * i + 2], gbox[2 * i + 3])
            if math.hypot(vx - ctr[0], vy - ctr[1]) < v2c_dist_thred:
                continue
            for k, cell in enumerate(work):
                if cell[8] < score_thred:
                    break
                if sign[k].sum() == 4:
                    continue
                w = (abs(cell[6] - cell[0]) + abs(cell[4] - cell[2])) / 2
                h = (abs(cell[3] - cell[1]) + abs(cell[5] - cell[7])) / 2
                if not _center_side_test(cell, ctr[0], ctr[1]):
                    continue
                dists = [
                    math.hypot(vx - cell[2 * j], vy - cell[2 * j + 1]) for j in range(4)
                ]
                j_min = int(np.argmin(dists))
                if dists[j_min] < c2v_dist_thred * max(w, h) and sign[k][j_min] == 0:
                    snapped[k][2 * j_min] = vx
                    snapped[k][2 * j_min + 1] = vy
                    sign[k][j_min] = 1
    return snapped


def label_components(mask: np.ndarray) -> np.ndarray:
    """8-connected component labeling (run-based union-find, pure numpy).

    Stand-in for skimage.measure.label(connectivity=2) used at ref :404;
    labels are positive ints densified in raster-scan first-encounter order,
    background 0 (label values may differ from skimage's; component
    membership is identical).  Loops over row *runs*, not pixels — the
    per-pixel two-pass variant was the hot spot of the mapInPandas wired
    kernel on large masks (~100× slower, verified output-equal).
    """
    m = np.asarray(mask, dtype=bool)
    h, w = m.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent: list = []

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    runs = []  # (y, start, end, id) in raster order
    prev_starts = prev_ends = prev_ids = None
    for y in range(h):
        rowm = m[y]
        if not rowm.any():
            prev_starts = prev_ends = prev_ids = None
            continue
        d = np.diff(rowm.astype(np.int8))
        starts = np.flatnonzero(d == 1) + 1
        ends = np.flatnonzero(d == -1) + 1
        if rowm[0]:
            starts = np.concatenate(([0], starts))
        if rowm[-1]:
            ends = np.concatenate((ends, [w]))
        ids = np.arange(len(parent), len(parent) + len(starts))
        parent.extend(ids.tolist())
        if prev_starts is not None and len(prev_starts):
            # 8-connectivity: run [s, e) touches prev run [ps, pe) iff
            # s <= pe and e >= ps (the diagonal extends reach by one)
            lo = np.searchsorted(prev_ends, starts, side="left")
            hi = np.searchsorted(prev_starts, ends, side="right")
            for rid, l, hgh in zip(ids.tolist(), lo.tolist(), hi.tolist()):
                for j in range(l, hgh):
                    ra, rb = find(rid), find(int(prev_ids[j]))
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        for rid, s, e in zip(ids.tolist(), starts.tolist(), ends.tolist()):
            runs.append((y, s, e, rid))
        prev_starts, prev_ends, prev_ids = starts, ends, ids
    remap: dict = {}
    for y, s, e, rid in runs:
        r = find(rid)
        lab = remap.setdefault(r, len(remap) + 1)
        labels[y, s:e] = lab
    return labels


def mask_to_line_segments(
    mask: np.ndarray, axis: int = 0, line_w: float = 10
) -> List[List[float]]:
    """Binary line mask → medial segments [xmin, ymin, xmax, ymax] per blob.

    Contract (ref get_table_line :400-418): 8-connected components; keep a
    component when its bbox extent along the line direction exceeds
    ``line_w`` (axis=0 → horizontal lines gated on width, axis=1 → vertical
    gated on height); each surviving component reduces to the midpoint
    segment of its min-area rect.
    """
    labels = label_components(np.asarray(mask) > 0)
    segs: List[List[float]] = []
    for lab in range(1, labels.max() + 1):
        coords = np.argwhere(labels == lab)  # (row, col) like skimage
        y0, x0 = coords.min(axis=0)
        y1, x1 = coords.max(axis=0) + 1
        extent = (y1 - y0) if axis == 1 else (x1 - x0)
        if extent > line_w:
            segs.append(min_area_rect(coords))
    return segs
