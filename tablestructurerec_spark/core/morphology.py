"""Pure-numpy image conditioning for the wired path: the cv2/skimage-backed
steps of the reference's UNet postprocess, reproduced without cv2.

Reference semantics covered here (all file:line into /root/reference/):

* separable rect-kernel morphological CLOSE of the h/v line masks —
  ``wired_table_rec/table_structure_unet.py:111-120`` (kernels
  ``(int(sqrt(w)*1.2), 1)`` / ``(1, int(sqrt(h)*1.2))``, one iteration)
* skew estimate from the rasterized line image: min-area-rect of the
  largest connected line region, angle normalized into [-45, 45] —
  ``table_structure_unet.py:160-173`` (``cal_rotate_angle``)
* nearest-neighbor rotation about the integer center with replicate border —
  ``table_structure_unet.py:175-188`` (``rotate_image``)
* polygon un-rotation by the inverse rotation matrix —
  ``table_structure_unet.py:190-206`` (``unrotate_polygons``)
* the full postprocess composition (class mask → cell polygons), flags and
  default thresholds as in ``table_structure_unet.py:78-143``
* M9 orientation correction: dominant-Hough-line angle → rotate, angle
  normalized into (-45, 45] — ``wired_table_rec/utils/utils.py:517-559``
  (``ImageOrientationCorrector``; Canny approximated by a Sobel-magnitude
  edge threshold — the downstream contract is only the dominant angle)
* M10 perspective crop of a 4-point quad for re-OCR —
  ``lineless_table_rec/utils/utils_table_recover.py:621-653``
  (``get_rotate_crop_image``; bilinear sampling stands in for INTER_CUBIC,
  replicate border kept; the trailing h/w >= 1.5 → rot90 rule kept)

Everything is vectorized numpy — these run per table image inside
``mapInPandas`` workers, so per-pixel Python loops are off the table.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

__all__ = [
    "fold_45",
    "close_1d",
    "estimate_skew_angle",
    "rotate_mask",
    "rotate_points",
    "wired_polygons_from_class_mask",
    "dominant_line_angle",
    "correct_orientation",
    "perspective_crop",
]


def _slide_1d(arr: np.ndarray, k: int, axis: int, op: str) -> np.ndarray:
    """Running max/min over a k-window along ``axis`` with cv2's anchor
    (k//2) and morphology border convention (dilate pads -inf, erode +inf,
    i.e. the border never contributes).  Dilation uses the REFLECTED kernel
    (window [i-(k-1-a), i+a]) exactly as cv2 does — for even k this is what
    keeps CLOSE extensive (erode's window [i-a, i+k-1-a] then re-covers
    every dilated pixel)."""
    if k <= 1:
        return arr.copy()
    a = np.moveaxis(arr, axis, -1)
    anchor = k // 2
    if op == "max":
        lo, hi = k - 1 - anchor, anchor
    else:
        lo, hi = anchor, k - 1 - anchor
    pad_val = arr.dtype.type(0) if op == "max" else arr.dtype.type(1)
    padded = np.pad(
        a, [(0, 0)] * (a.ndim - 1) + [(lo, hi)],
        mode="constant", constant_values=pad_val,
    )
    win = np.lib.stride_tricks.sliding_window_view(padded, k, axis=-1)
    out = win.max(axis=-1) if op == "max" else win.min(axis=-1)
    return np.moveaxis(out, -1, axis)


def close_1d(mask: np.ndarray, k: int, axis: int) -> np.ndarray:
    """Binary morphological CLOSE (dilate then erode) with a 1-D rect kernel
    of width ``k`` along ``axis`` — the separable equivalent of cv2
    ``morphologyEx(MORPH_CLOSE, getStructuringElement(MORPH_RECT, (k,1)))``
    used on the line masks (table_structure_unet.py:113-120)."""
    m = np.asarray(mask).astype(np.uint8)
    return _slide_1d(_slide_1d(m, k, axis, "max"), k, axis, "min").astype(bool)


def fold_45(ang: float) -> float:
    """Fold an angle modulo 90-degree symmetry into [-45, 45], keeping -45
    as-is — the reference's boundary convention (cal_rotate_angle,
    table_structure_unet.py:166-172; ImageOrientationCorrector,
    wired_table_rec/utils/utils.py:550-553 both fold only when strictly
    beyond the boundary, so exactly -45 must not become +45)."""
    while ang > 45:
        ang -= 90
    while ang < -45:
        ang += 90
    return ang


def _rect_angle_deg(coords: np.ndarray) -> float:
    """Min-area-rect orientation of a point set, in degrees in [-45, 45]."""
    from .lines import min_area_rect_corners

    quad = np.asarray(min_area_rect_corners(coords), dtype=float)  # [tl,tr,br,bl] (x,y)
    e = quad[1] - quad[0]
    if abs(e[0]) < 1e-9 and abs(e[1]) < 1e-9:
        return 0.0
    return fold_45(math.degrees(math.atan2(e[1], e[0])))


def estimate_skew_angle(line_mask: np.ndarray) -> float:
    """cal_rotate_angle (table_structure_unet.py:160-173): min-area-rect of
    the largest connected line region, angle folded into [-45, 45]."""
    from .wired_lines import label_components

    m = np.asarray(line_mask) > 0
    if not m.any():
        return 0.0
    labels = label_components(m)
    sizes = np.bincount(labels.ravel())
    sizes[0] = 0
    coords = np.argwhere(labels == sizes.argmax())
    return _rect_angle_deg(coords)


def _rot_matrix(center: Tuple[float, float], angle_deg: float) -> np.ndarray:
    """cv2.getRotationMatrix2D(center, angle, 1.0): positive angle rotates
    counter-clockwise in image coordinates."""
    a = math.radians(angle_deg)
    ca, sa = math.cos(a), math.sin(a)
    cx, cy = center
    return np.array(
        [[ca, sa, (1 - ca) * cx - sa * cy], [-sa, ca, sa * cx + (1 - ca) * cy]]
    )


def rotate_mask(mask: np.ndarray, angle_deg: float) -> np.ndarray:
    """rotate_image (table_structure_unet.py:175-188): rotate about
    (w//2, h//2), nearest neighbor, replicate border."""
    m = np.asarray(mask)
    h, w = m.shape[:2]
    inv = _rot_matrix((w // 2, h // 2), -angle_deg)
    ys, xs = np.mgrid[0:h, 0:w]
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    sxi = np.clip(np.round(sx).astype(int), 0, w - 1)
    syi = np.clip(np.round(sy).astype(int), 0, h - 1)
    return m[syi, sxi]


def rotate_points(pts: np.ndarray, angle_deg: float, shape: Sequence[int]) -> np.ndarray:
    """Apply getRotationMatrix2D((w//2, h//2), angle) to (..., 2) xy points
    (unrotate_polygons passes -angle — table_structure_unet.py:190-206)."""
    h, w = shape[:2]
    M = _rot_matrix((w // 2, h // 2), angle_deg)
    p = np.asarray(pts, dtype=float)
    out = p @ M[:, :2].T
    out[..., 0] += M[0, 2]
    out[..., 1] += M[1, 2]
    return out


def wired_polygons_from_class_mask(
    pred: np.ndarray,
    row: float = 50,
    col: float = 30,
    h_lines_threshold: float = 100,
    v_lines_threshold: float = 15,
    angle: float = 50,
    enhance_box_line: bool = True,
    rotated_fix: bool = True,
    min_side: float = 15,
    kernel_shape: Tuple[int, int] | None = None,
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """The full UNet postprocess composition (table_structure_unet.py:78-143)
    from a class mask (0 bg / 1 h-line / 2 v-line) at original resolution:

    split → 1-D CLOSE (k = sqrt(dim)*1.2) → components-to-segments
    (get_table_line) → adjust_lines / final_adjust_lines → rasterize →
    skew estimate; if |angle| > 0.3 rotate, extract cells, un-rotate.

    ``kernel_shape`` is the (h, w) the CLOSE kernel sizes are computed from.
    The reference sizes them from the MODEL-resolution pred (~768-side)
    *before* resizing the masks to the original image
    (table_structure_unet.py:104-120), so a caller feeding an upsampled
    ONNX mask must pass the model-resolution shape here or the kernels grow
    ~sqrt(upscale) wider than the reference's.  Default None sizes from the
    given mask — correct when the mask IS at model resolution, as with the
    deterministic stub payloads.

    Returns (polygons, rotated_polygons) as lists of (4, 2) ccw quads, the
    same pair contract as the reference.
    """
    from .cells_from_lines import cells_from_line_mask, raster_segments
    from .lines import adjust_lines, final_adjust_lines
    from .wired_lines import mask_to_line_segments

    pred = np.asarray(pred)
    h, w = pred.shape
    kh, kw = kernel_shape if kernel_shape is not None else (h, w)
    hmask = pred == 1
    vmask = pred == 2
    vmask = close_1d(vmask, int(math.sqrt(kh) * 1.2), axis=0)
    if enhance_box_line:
        hmask = close_1d(hmask, int(math.sqrt(kw) * 1.2), axis=1)
    rowsegs = mask_to_line_segments(hmask, axis=0, line_w=row)
    colsegs = mask_to_line_segments(vmask, axis=1, line_w=col)
    if enhance_box_line:
        rowsegs = list(rowsegs) + list(adjust_lines(rowsegs, alph=h_lines_threshold, angle=angle))
        colsegs = list(colsegs) + list(adjust_lines(colsegs, alph=v_lines_threshold, angle=angle))
        rowsegs, colsegs = final_adjust_lines(rowsegs, colsegs)
    line_img = raster_segments((h, w), list(rowsegs) + list(colsegs), thickness=2)
    rot = estimate_skew_angle(line_img)
    if rotated_fix and abs(rot) > 0.3:
        rotated = rotate_mask(line_img, rot)
        rotated_polys = cells_from_line_mask(rotated, min_side)
        polys = [rotate_points(q, -rot, (h, w)) for q in rotated_polys]
        return polys, rotated_polys
    polys = cells_from_line_mask(line_img, min_side)
    return polys, [q.copy() for q in polys]




# ---------------------------------------------------------------------------
# M9 — orientation correction (dominant Hough line)
# ---------------------------------------------------------------------------
def dominant_line_angle(gray: np.ndarray, edge_thresh: float = 100.0) -> float:
    """Angle (degrees, in (-45, 45]) of the most-voted Hough line over the
    Sobel edge map — the decision variable of ImageOrientationCorrector
    (wired_table_rec/utils/utils.py:517-559).  Returns 0.0 when no edges."""
    g = np.asarray(gray, dtype=float)
    gx = np.zeros_like(g)
    gy = np.zeros_like(g)
    gx[:, 1:-1] = g[:, 2:] - g[:, :-2]
    gy[1:-1, :] = g[2:, :] - g[:-2, :]
    mag = np.hypot(gx, gy)
    ys, xs = np.nonzero(mag > edge_thresh)
    if len(xs) == 0:
        return 0.0
    # accumulate per theta with bincount: O(n_edge) memory per angle, vs a
    # full (n_edge, 180) rho matrix which reaches GBs on dense page scans —
    # this runs per image inside mapInPandas workers
    diag = int(np.ceil(math.hypot(*g.shape)))
    xs_f = xs.astype(float)
    ys_f = ys.astype(float)
    best_votes, theta_idx = -1, 0
    for t in range(180):
        th = math.radians(t)
        rho = np.round(xs_f * math.cos(th) + ys_f * math.sin(th)).astype(int) + diag
        votes = int(np.bincount(rho, minlength=2 * diag + 1).max())
        if votes > best_votes:
            best_votes, theta_idx = votes, t
    theta = math.radians(int(theta_idx))
    # line direction is perpendicular to (cos theta, sin theta)
    ang = math.degrees(math.atan2(math.cos(theta), -math.sin(theta))) if math.sin(theta) != 0 else 90.0
    return fold_45(ang)


def correct_orientation(img: np.ndarray, edge_thresh: float = 100.0) -> np.ndarray:
    """M9: rotate the image by the dominant line angle (nearest neighbor,
    replicate border), mirroring ImageOrientationCorrector.__call__."""
    ang = dominant_line_angle(
        img if img.ndim == 2 else np.asarray(img, dtype=float).mean(axis=2), edge_thresh
    )
    if abs(ang) < 1e-9:
        return np.asarray(img).copy()
    if img.ndim == 2:
        return rotate_mask(img, ang)
    return np.dstack([rotate_mask(img[..., c], ang) for c in range(img.shape[2])])


# ---------------------------------------------------------------------------
# M10 — perspective crop for re-OCR
# ---------------------------------------------------------------------------
def _homography(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3x3 H with dst ~ H @ src for 4 point pairs (getPerspectiveTransform).
    Degenerate (collinear / zero-area) quads fall back to least squares so a
    malformed upstream cell yields a junk crop, never a raised LinAlgError
    killing the whole mapInPandas task (cv2 likewise never throws here)."""
    A = []
    b = []
    for (x, y), (u, v) in zip(src, dst):
        A.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
        A.append([0, 0, 0, x, y, 1, -v * x, -v * y])
        b.extend([u, v])
    A = np.asarray(A, dtype=float)
    b = np.asarray(b, dtype=float)
    try:
        h = np.linalg.solve(A, b)
    except np.linalg.LinAlgError:
        h = np.linalg.lstsq(A, b, rcond=None)[0]
    return np.append(h, 1.0).reshape(3, 3)


def perspective_crop(img: np.ndarray, points: np.ndarray) -> np.ndarray:
    """get_rotate_crop_image (utils_table_recover.py:621-653): warp the quad
    [tl, tr, br, bl] to an upright w x h rect (w/h = max opposite-edge
    lengths), bilinear sampling with replicate border, then rot90 when
    h/w >= 1.5."""
    pts = np.asarray(points, dtype=float)
    cw = int(max(np.linalg.norm(pts[0] - pts[1]), np.linalg.norm(pts[2] - pts[3])))
    ch = int(max(np.linalg.norm(pts[0] - pts[3]), np.linalg.norm(pts[1] - pts[2])))
    cw, ch = max(cw, 1), max(ch, 1)
    dst = np.array([[0, 0], [cw, 0], [cw, ch], [0, ch]], dtype=float)
    Hinv = _homography(dst, pts)  # dst pixel -> src pixel
    ys, xs = np.mgrid[0:ch, 0:cw]
    ones = np.ones_like(xs, dtype=float)
    denom = Hinv[2, 0] * xs + Hinv[2, 1] * ys + Hinv[2, 2] * ones
    sx = (Hinv[0, 0] * xs + Hinv[0, 1] * ys + Hinv[0, 2]) / denom
    sy = (Hinv[1, 0] * xs + Hinv[1, 1] * ys + Hinv[1, 2]) / denom
    im = np.asarray(img, dtype=float)
    h, w = im.shape[:2]
    x0 = np.clip(np.floor(sx).astype(int), 0, w - 1)
    y0 = np.clip(np.floor(sy).astype(int), 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    fx = np.clip(sx - x0, 0.0, 1.0)
    fy = np.clip(sy - y0, 0.0, 1.0)
    if im.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    out = (
        im[y0, x0] * (1 - fx) * (1 - fy)
        + im[y0, x1] * fx * (1 - fy)
        + im[y1, x0] * (1 - fx) * fy
        + im[y1, x1] * fx * fy
    )
    out = out.astype(img.dtype) if np.issubdtype(np.asarray(img).dtype, np.integer) else out
    if ch * 1.0 / cw >= 1.5:
        out = np.rot90(out)
    return out
