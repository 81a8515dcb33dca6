"""Quad/polygon kernels: hull IoU, reading-order quad sort, adjacent merge.

From-scratch reproductions of the polygon utilities in
``lineless_table_rec/utils/utils_table_recover.py`` (CycleCenterNet path):

* ``poly_iou``       — ref :39-67 (shapely there; pure numpy here)
* ``sort_quads``     — ref :14-36
* ``merge_adjacent_quads`` — ref :322-375 (fixpoint recursion)

These run inside per-table pandas UDFs; counts per table are tiny.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .lines import _convex_hull

__all__ = ["poly_iou", "sort_quads", "merge_adjacent_quads"]


def _shoelace(pts: np.ndarray) -> float:
    if len(pts) < 3:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


def _clip_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: intersection of two convex polygons (ccw)."""
    out = list(subject)
    n = len(clip)
    for k in range(n):
        a, b = clip[k], clip[(k + 1) % n]
        edge = b - a
        inp, out = out, []
        if not inp:
            break
        prev = inp[-1]
        prev_in = np.cross(edge, prev - a) >= 0
        for cur in inp:
            cur_in = np.cross(edge, cur - a) >= 0
            if cur_in != prev_in:
                denom = np.cross(edge, cur - prev)
                if denom != 0:
                    t = np.cross(edge, a - prev) / denom
                    out.append(prev + t * (cur - prev))
            if cur_in:
                out.append(cur)
            prev, prev_in = cur, cur_in
    return np.array(out) if out else np.empty((0, 2))


def poly_iou(a, b) -> float:
    """Convex-hull IoU of two 4-point polygons.

    Contract (ref utils_table_recover.py:39-67): intersection area of the two
    convex hulls over the area of the convex hull of ALL points (not the
    geometric union); disjoint hulls → 0.0; zero union area → 0.0.
    """
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    hull_a = _convex_hull(a)
    hull_b = _convex_hull(b)
    if len(hull_a) < 3 or len(hull_b) < 3:
        inter_area = 0.0
    else:
        inter_area = _shoelace(_clip_convex(hull_a, hull_b))
    if inter_area == 0.0:
        return 0.0
    union_area = _shoelace(_convex_hull(np.concatenate([a, b])))
    if union_area == 0:
        return 0.0
    return float(inter_area) / union_area


def sort_quads(quads: np.ndarray) -> np.ndarray:
    """Reading-order sort of (N,4,2) quads by top-left corner.

    Contract (ref utils_table_recover.py:14-36): stable sort on
    ``(y0, x0)``, then bubble-swap adjacent quads sharing a 10px y-band that
    are x-inverted, walking leftwards until the first non-swap.
    """
    n = len(quads)
    work = sorted(quads, key=lambda q: (q[0][1], q[0][0]))
    for i in range(n - 1):
        for j in range(i, -1, -1):
            if (
                abs(work[j + 1][0][1] - work[j][0][1]) < 10
                and work[j + 1][0][0] < work[j][0][0]
            ):
                work[j], work[j + 1] = work[j + 1], work[j]
            else:
                break
    return np.array(work)


def _combine_pair(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Merged quad from two overlapping quads (ref :339-367): corner 0 takes
    elementwise min, corner 2 elementwise max, corner 1 (min x, max y),
    corner 3 (max x, min y)."""
    return np.array(
        [
            np.minimum(p[0], q[0]),
            [min(p[1][0], q[1][0]), max(p[1][1], q[1][1])],
            np.maximum(p[2], q[2]),
            [max(p[3][0], q[3][0]), min(p[3][1], q[3][1])],
        ]
    )


def merge_adjacent_quads(quads: np.ndarray) -> np.ndarray:
    """Fixpoint merge of sort-adjacent quads with poly-IoU ≥ 0.1.

    Contract (ref utils_table_recover.py:322-375): compare each quad with its
    successor; merge overlapping pairs (corner min/max rules), drop the pair,
    append the merged quad, re-sort, repeat until no adjacent pair overlaps.
    (The reference's single-pair numpy squeeze raises on >1 simultaneous
    match, degrading to an empty output via its catch-all; we process all
    matched pairs — the documented, non-crashing semantics.)
    """
    quads = np.asarray(quads, dtype=float)
    while len(quads) >= 2:
        ious = [poly_iou(quads[i], quads[i + 1]) for i in range(len(quads) - 1)]
        hits = [i for i, v in enumerate(ious) if v >= 0.1]
        if not hits:
            return quads
        drop, merged = [], []
        for i in hits:
            drop.extend([i, i + 1])
            merged.append(_combine_pair(quads[i], quads[i + 1]))
        quads = np.delete(quads, drop, axis=0)
        quads = (
            np.append(quads, np.array(merged), axis=0) if len(quads) else np.array(merged)
        )
        quads = sort_quads(quads)
    return quads
