"""Line-segment post-processing kernels for the wired-table path.

From-scratch reproductions of the geometry helpers in
``wired_table_rec/utils/utils_table_line_rec.py``; goldens pinned by the
reference's tests/test_wired_table_line_util.py:13-218.  The reference leans
on cv2/scipy for two steps (minAreaRect, cdist) — this container has neither,
so those are re-derived here with plain numpy (rotating calipers / explicit
norms), keeping the same outputs within the goldens' tolerances.

Per-table line counts are tiny, so these run inside per-table pandas UDFs;
they are deliberately not Spark expressions.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

__all__ = [
    "order_quad_points",
    "center_rotate_angle",
    "fit_line",
    "point_line_side",
    "line_to_line",
    "adjust_lines",
    "final_adjust_lines",
    "min_area_rect",
]


def order_quad_points(pts: np.ndarray) -> np.ndarray:
    """Order 4 points as [top-left, top-right, bottom-right, bottom-left].

    Contract (ref utils_table_line_rec.py:489-509): split by x into left/right
    pairs; the left pair sorts by y into (tl, bl); on the right, the point
    farther from tl is br.
    """
    pts = np.asarray(pts, dtype=float)
    by_x = pts[np.argsort(pts[:, 0])]
    left = by_x[:2][np.argsort(by_x[:2, 1])]
    tl, bl = left
    right = by_x[2:]
    d = np.linalg.norm(right - tl, axis=1)
    far, near = right[np.argsort(d)[::-1]]
    return np.array([tl, near, far, bl], dtype="float32")


def center_rotate_angle(box: Sequence[float]) -> Tuple[float, float, float, float, float]:
    """(angle, w, h, cx, cy) of an ordered 8-tuple quad.

    Contract (ref utils_table_line_rec.py:458-486): w/h are averaged opposite
    edge lengths; the angle comes from the small-angle identity
    ``sinA = 2·(h·(x1−cx) − w·(y1−cy)) / (h² + w²)``.
    """
    x1, y1, x2, y2, x3, y3, x4, y4 = box[:8]
    cx = (x1 + x2 + x3 + x4) / 4.0
    cy = (y1 + y2 + y3 + y4) / 4.0
    w = (math.hypot(x2 - x1, y2 - y1) + math.hypot(x3 - x4, y3 - y4)) / 2
    h = (math.hypot(x2 - x3, y2 - y3) + math.hypot(x1 - x4, y1 - y4)) / 2
    sin_a = (h * (x1 - cx) - w * (y1 - cy)) * 2.0 / (h * h + w * w)
    return float(np.arcsin(sin_a)), w, h, cx, cy


def fit_line(p: Sequence[Sequence[float]]) -> Tuple[float, float, float]:
    """Two points → general line form (A, B, C) with Ax+By+C=0.

    Contract: ref utils_table_line_rec.py:664-676.
    """
    (x1, y1), (x2, y2) = p[0], p[1]
    return y2 - y1, x1 - x2, x2 * y1 - x1 * y2


def point_line_side(p: Sequence[float], a: float, b: float, c: float) -> float:
    """Signed side of point vs line (ref utils_table_line_rec.py:656-661)."""
    return a * p[0] + b * p[1] + c


def line_to_line(points1, points2, alpha: float = 10, angle: float = 30):
    """Extend segment 1 to its intersection with segment 2's line when close.

    Contract (ref utils_table_line_rec.py:583-616): only when both endpoints
    of segment 1 lie strictly on one side of segment 2's line; the nearer
    endpoint moves to the intersection if it is within ``alpha`` and the
    resulting segment is within ``angle`` degrees of horizontal or vertical.
    Returns the (possibly) new segment; unchanged input passes through as-is.
    """
    x1, y1, x2, y2 = points1
    a1, b1, c1 = fit_line([(x1, y1), (x2, y2)])
    ox1, oy1, ox2, oy2 = points2
    a2, b2, c2 = fit_line([(ox1, oy1), (ox2, oy2)])
    s1 = point_line_side((x1, y1), a2, b2, c2)
    s2 = point_line_side((x2, y2), a2, b2, c2)
    if not ((s1 > 0 and s2 > 0) or (s1 < 0 and s2 < 0)):
        return points1
    den = a1 * b2 - a2 * b1
    if den == 0:
        return points1
    px = (b1 * c2 - b2 * c1) / den
    py = (a2 * c1 - a1 * c2) / den
    r1 = math.hypot(px - x1, py - y1)
    r2 = math.hypot(px - x2, py - y2)
    if min(r1, r2) >= alpha:
        return points1
    if r1 < r2:
        slope = abs((y2 - py) / (x2 - px + 1e-10))
        deg = math.degrees(math.atan(slope))
        if deg < angle or abs(90 - deg) < angle:
            return np.array([px, py, x2, y2], dtype="float32")
    else:
        slope = abs((y1 - py) / (x1 - px + 1e-10))
        deg = math.degrees(math.atan(slope))
        if deg < angle or abs(90 - deg) < angle:
            return np.array([x1, y1, px, py], dtype="float32")
    return points1


def adjust_lines(
    lines: Sequence[Tuple[float, float, float, float]],
    alph: float = 50,
    angle: float = 50,
) -> List[Tuple[float, float, float, float]]:
    """Emit bridging segments between nearby same-orientation line endpoints.

    Contract (ref utils_table_line_rec.py:516-553), including its quirks: the
    ordered full cross-product (i≠j, both directions), the midpoint
    projection-overlap skip test, and the four endpoint-pair candidates each
    gated on distance < ``alph`` and inclination < ``angle`` degrees.
    """
    out: List[Tuple[float, float, float, float]] = []
    n = len(lines)
    for i in range(n):
        x1, y1, x2, y2 = lines[i]
        mx1, my1 = (x1 + x2) / 2, (y1 + y2) / 2
        for j in range(n):
            if i == j:
                continue
            x3, y3, x4, y4 = lines[j]
            mx2, my2 = (x3 + x4) / 2, (y3 + y4) / 2
            if (x3 < mx1 < x4 or y3 < my1 < y4) or (x1 < mx2 < x2 or y1 < my2 < y2):
                continue
            for (px, py), (qx, qy) in (
                ((x1, y1), (x3, y3)),
                ((x1, y1), (x4, y4)),
                ((x2, y2), (x3, y3)),
                ((x2, y2), (x4, y4)),
            ):
                dist = math.hypot(px - qx, py - qy)
                deg = math.degrees(math.atan(abs((qy - py) / (qx - px + 1e-10))))
                if dist < alph and deg < angle:
                    out.append((px, py, qx, qy))
    return out


def final_adjust_lines(rowlines: list, collines: list) -> Tuple[list, list]:
    """All-pairs mutual extension of row lines vs column lines.

    Contract: ref utils_table_line_rec.py:556-563 (alpha=20, angle=30),
    with in-place sequential mutation order preserved.
    """
    for i in range(len(rowlines)):
        for j in range(len(collines)):
            rowlines[i] = line_to_line(rowlines[i], collines[j], alpha=20, angle=30)
            collines[j] = line_to_line(collines[j], rowlines[i], alpha=20, angle=30)
    return rowlines, collines


def _convex_hull(points: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull (ccw, no duplicate endpoint).

    Scalar cross products on python floats — np.cross per candidate point
    dominated the whole wired-cell kernel (~40 µs/call × 10^5 calls)."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    seq = [(float(x), float(y)) for x, y in pts]

    def half(seq):
        h = []
        for px, py in seq:
            while len(h) >= 2:
                ax, ay = h[-2]
                bx, by = h[-1]
                if (bx - ax) * (py - ay) - (by - ay) * (px - ax) <= 0:
                    h.pop()
                else:
                    break
            h.append((px, py))
        return h

    lower = half(seq)
    upper = half(seq[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=float)


def min_area_rect_corners(coords: np.ndarray) -> np.ndarray:
    """Ordered [tl, tr, br, bl] corners of the min-area rotated rect of
    (row, col) points — the full-rect contract of the reference's
    ``min_area_rect_box`` (ref utils_table_line_rec.py:619-653), re-derived
    with rotating calipers over the convex hull (no cv2)."""
    pts = np.asarray(coords, dtype=float)[:, ::-1]  # (y,x) → (x,y)
    if len(pts) > 64:
        # pixel regions: only per-row x extremes can be hull vertices —
        # collapses O(area) points to O(height) before the hull
        order = np.lexsort((pts[:, 0], pts[:, 1]))
        sp = pts[order]
        rows, starts = np.unique(sp[:, 1], return_index=True)
        ends = np.append(starts[1:], len(sp)) - 1
        pts = np.concatenate([sp[starts], sp[ends]])
    hull = _convex_hull(pts)
    if len(hull) == 1:
        x, y = hull[0]
        return np.array([[x, y]] * 4, dtype="float32")
    if len(hull) == 2:
        (x1, y1), (x2, y2) = hull
        corners = np.array([[x1, y1], [x2, y2], [x2, y2], [x1, y1]])
    else:
        best_area, corners = np.inf, None
        for k in range(len(hull)):
            edge = hull[(k + 1) % len(hull)] - hull[k]
            norm = np.linalg.norm(edge)
            if norm == 0:
                continue
            u = edge / norm
            v = np.array([-u[1], u[0]])
            proj_u = pts @ u
            proj_v = pts @ v
            area = (proj_u.max() - proj_u.min()) * (proj_v.max() - proj_v.min())
            if area < best_area:
                best_area = area
                lo_u, hi_u = proj_u.min(), proj_u.max()
                lo_v, hi_v = proj_v.min(), proj_v.max()
                corners = np.array(
                    [
                        lo_u * u + lo_v * v,
                        hi_u * u + lo_v * v,
                        hi_u * u + hi_v * v,
                        lo_u * u + hi_v * v,
                    ]
                )
    return order_quad_points(corners)


def min_area_rect(coords: np.ndarray) -> List[float]:
    """Minimum-area rotated rect of (row, col) points → midpoint box_4_1.

    Contract (ref utils_table_line_rec.py:421-447): order the rect corners,
    then collapse the rect across its short side to midpoints, yielding
    [xmin, ymin, xmax, ymax] of the medial segment (used for LINE blobs).
    Goldens allow atol=2.
    """
    ordered = min_area_rect_corners(coords)
    x1, y1, x2, y2, x3, y3, x4, y4 = np.asarray(ordered).reshape(8)
    _, w, h, _, _ = center_rotate_angle([x1, y1, x2, y2, x3, y3, x4, y4])
    if w < h:
        return [(x1 + x2) / 2, (y1 + y2) / 2, (x3 + x4) / 2, (y3 + y4) / 2]
    return [(x1 + x4) / 2, (y1 + y4) / 2, (x2 + x3) / 2, (y2 + y3) / 2]
