"""CenterNet-style 4-point decode — vectorized numpy, from scratch.

Reproduces the semantics of the reference's LORE detection post-processing
(``lineless_table_rec/utils/utils_table_lore_rec.py``):

* ``sigmoid``            — ref :57-59
* ``peak_nms``           — ref :160-190 (3×3 max-pool peak suppression; the
  reference's python-loop pool is O(HW·k²) — here a strided sliding-window
  max, same outputs for its (1,1,H,W) inputs)
* ``topk`` / ``two_stage_topk`` — ref :215-245 / :193-212
* ``gather_channels``    — ref :248-289 (transpose→flatten→gather)
* ``decode_quads``       — ref :96-157 (reg offset, 8 wh corner offsets,
  corner-feature fusion ``logic += cr``)
* ``upper_left_affine`` / ``unwarp_coords`` — ref :357+ and
  ``get_affine_transform_upper_left`` (pure math; no cv2)
* score filter ≥ 0.15 + max-per-image cap — ref :61-93

Everything is whole-batch: these functions run inside ``mapInPandas`` on
Arrow record batches; no per-row python at the Spark level.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = [
    "sigmoid",
    "topk",
    "two_stage_topk",
    "peak_nms",
    "gather_channels",
    "decode_quads",
    "upper_left_affine",
    "unwarp_coords",
    "select_detections",
]


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def topk(a: np.ndarray, k: int, axis: int = -1) -> Tuple[np.ndarray, np.ndarray]:
    """Largest-k values+indices along ``axis``, sorted descending
    (argpartition two-phase, ref find_topk :215-245)."""
    size = a.shape[axis]
    k = min(k, size)
    part = np.argpartition(a, size - k, axis=axis)
    idx = np.take(part, np.arange(size - k, size), axis=axis)
    vals = np.take_along_axis(a, idx, axis=axis)
    order = np.flip(np.argsort(vals, axis=axis), axis=axis)
    return (
        np.take_along_axis(vals, order, axis=axis),
        np.take_along_axis(idx, order, axis=axis),
    )


def peak_nms(heat: np.ndarray, kernel: int = 3) -> np.ndarray:
    """Keep only local maxima of a (B, C, H, W) heatmap (3×3 neighborhood).

    Contract (ref _nms/max_pool :160-190): a cell survives iff it equals the
    max of its padded k×k window; suppressed cells become 0.
    """
    pad = (kernel - 1) // 2
    padded = np.pad(
        heat, ((0, 0), (0, 0), (pad, pad), (pad, pad)), constant_values=0
    )
    b, c, hp, wp = padded.shape
    h, w = heat.shape[2], heat.shape[3]
    win = np.lib.stride_tricks.sliding_window_view(padded, (kernel, kernel), axis=(2, 3))
    hmax = win.max(axis=(-2, -1))
    return heat * (hmax == heat)


def two_stage_topk(scores: np.ndarray, k: int):
    """Per-class top-k then global top-k over a (B, C, H, W) heatmap.

    Returns (score, flat_ind, cls, ys, xs) each (B, K) — ref _topk :193-212,
    including the float ys (``ind / width``) / int-truncated xs convention.
    """
    b, c, h, w = scores.shape
    per_cls_scores, per_cls_inds = topk(scores.reshape(b, c, -1), k)
    per_cls_inds = per_cls_inds % (h * w)
    ys = per_cls_inds / w
    xs = np.float32(np.int32(per_cls_inds % w))

    glob_scores, glob_inds = topk(per_cls_scores.reshape(b, -1), k)
    clses = np.int32(glob_inds / k)
    take = lambda t: np.take_along_axis(t.reshape(b, -1), glob_inds, axis=1)
    return glob_scores, take(per_cls_inds), clses, take(ys), take(xs)


def gather_channels(feat: np.ndarray, ind: np.ndarray) -> np.ndarray:
    """(B, C, H, W) + (B, K) flat spatial indices → (B, K, C)
    (ref _tranpose_and_gather_feat :285-289)."""
    b, c = feat.shape[0], feat.shape[1]
    flat = feat.transpose(0, 2, 3, 1).reshape(b, -1, c)
    return np.take_along_axis(flat, ind[:, :, None].astype(np.int64), axis=1)


def decode_quads(
    heads: Dict[str, np.ndarray], k: int = 3000
) -> Tuple[np.ndarray, np.ndarray]:
    """Full 4-point decode: heads {hm, wh, ax, cr, reg} → (dets, logic_feat).

    ``dets`` is (B, K, 10): 8 corner coords (center − wh offsets), score,
    class.  ``logic_feat`` is (B, K, D): the ax head gathered at peaks plus
    the cr corner features summed over the 4 corners (``logi += cr``, ref
    :51 and :96-157).  Peak centers are refined by the reg head.
    """
    hm = sigmoid(heads["hm"])[:, 0:1, :, :]
    b, _, h, w = hm.shape
    k = min(k, h * w)
    hm = peak_nms(hm)
    scores, inds, clses, ys, xs = two_stage_topk(hm, k)

    reg = gather_channels(heads["reg"], inds)
    xs = xs[:, :, None] + reg[:, :, 0:1]
    ys = ys[:, :, None] + reg[:, :, 1:2]

    wh = gather_channels(heads["wh"], inds)  # (B, K, 8)
    ax = gather_channels(heads["ax"], inds)  # (B, K, D)

    corners = []
    for i in range(4):
        corners.append(xs - wh[:, :, 2 * i : 2 * i + 1])
        corners.append(ys - wh[:, :, 2 * i + 1 : 2 * i + 2])
    quads = np.concatenate(corners, axis=2)  # (B, K, 8)

    # corner-feature gather: flat index of each (rounded-y, x) corner
    cr = heads["cr"]
    d = cr.shape[1]
    cr_flat = cr.transpose(0, 2, 3, 1).reshape(b, -1, d)
    corner_idx = np.concatenate(
        [
            np.round(quads[:, :, 2 * i : 2 * i + 1] + w * np.round(quads[:, :, 2 * i + 1 : 2 * i + 2]))
            for i in range(4)
        ],
        axis=2,
    ).astype(np.int64)  # (B, K, 4)
    # out-of-range handling mirrors ref _get_4ps_feat :306-315 exactly,
    # including its batch-1 (not size-1) fill for overflowing indices
    corner_idx = np.where(corner_idx < cr_flat.shape[1], corner_idx, np.int64(b - 1))
    corner_idx = np.where(corner_idx >= 0, corner_idx, np.int64(0))
    cr_feat = np.take_along_axis(
        cr_flat[:, :, :, None].repeat(4, axis=3),
        np.broadcast_to(corner_idx[:, :, None, :], (b, corner_idx.shape[1], d, 4)),
        axis=1,
    ).sum(axis=3)

    dets = np.concatenate(
        [quads, scores[:, :, None], clses.astype(np.float64)[:, :, None]], axis=2
    )
    return dets, ax + cr_feat


def upper_left_affine(span: float, out_w: int, out_h: int) -> np.ndarray:
    """2×3 affine warping an image anchored at the origin onto out_w×out_h.

    Pure-math twin of the reference's cv2-based
    ``get_affine_transform_upper_left`` with center (0,0): uniform scale
    ``out/span`` with no translation.
    """
    s = out_w / span if out_w <= out_h else out_h / span
    return np.array([[s, 0.0, 0.0], [0.0, s, 0.0]])


def unwarp_coords(coords: np.ndarray, span: float, out_w: int, out_h: int) -> np.ndarray:
    """Map decoded feature-space coords back to original image space
    (inverse of :func:`upper_left_affine`; ref transform_preds_upper_left)."""
    mat = upper_left_affine(span, out_w, out_h)
    inv_s = 1.0 / mat[0, 0]
    return coords * inv_s


def select_detections(
    dets: np.ndarray,
    logic_feat: np.ndarray,
    score_thresh: float = 0.15,
    max_per_image: int = 3000,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Score-threshold + cap (ref merge_outputs :61-76, filter :78-93).

    Single-image variant: keeps the top ``max_per_image`` by score, then the
    leading run with score ≥ ``score_thresh`` (the reference relies on
    descending score order from the decode — so do we).
    Returns (quads (N,4,2), logic_feat (N,D), scores (N,)).
    """
    scores = dets[0, :, 8]
    if len(scores) > max_per_image:
        kth = len(scores) - max_per_image
        thresh = np.partition(scores, kth)[kth]
        keep = scores >= thresh
        dets, logic_feat, scores = dets[:, keep], logic_feat[:, keep], scores[keep]
    n_valid = int((scores >= score_thresh).sum())
    quads = dets[0, :n_valid, :8].reshape(-1, 4, 2)
    return quads, logic_feat[0, :n_valid], scores[:n_valid]
