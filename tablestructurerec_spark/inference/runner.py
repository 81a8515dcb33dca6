"""Batched structure-model inference as a Spark stage.

Pattern (ref OrtInferSession, lineless_table_rec/utils/utils.py:33-224 +
TSRLore, table_structure_lore.py): ONE model session per executor python
worker, created lazily inside the UDF closure and cached at process level;
inputs batched per Arrow record batch; all decode math vectorized
(:mod:`.decode`).  No per-row Python at the Spark plan level.

Backends:
* ``onnx``  — real ONNXRuntime session (guarded import; this container has no
  onnxruntime or model weights, so constructing it raises with instructions —
  the Spark plumbing is identical either way).
* ``stub``  — deterministic fake: the payload bytes carry a JSON spec of the
  table's logical grid; the stub builds model HEADS (hm/wh/ax/cr/reg) whose
  decode through the real math reproduces that grid.  This makes the full
  M1→M4 path (heads → peak NMS → topk → gather → unwarp → snap/round)
  testable end-to-end without weights.
"""

from __future__ import annotations

import json
from typing import Dict, Iterator, Tuple

import numpy as np
import pandas as pd

from ..core.lore_post import snap_and_round_logic
from .decode import decode_quads, select_detections, unwarp_coords

__all__ = [
    "StubBackend",
    "OnnxBackend",
    "lore_preprocess",
    "decode_heads",
    "get_backend",
    "structure_infer",
    "wired_structure_infer",
    "pack_class_mask",
    "unpack_class_mask",
    "INFER_SCHEMA",
]

_FEAT_H = _FEAT_W = 192  # 768 / 4, ref table_structure_lore.py:16-17 + meta
_SPAN = 768.0
_CELL_W, _CELL_H = 30.0, 10.0  # feature-space cell size used by the stub


def _logit(p: float) -> float:
    return float(np.log(p / (1.0 - p)))


class StubBackend:
    """Deterministic heads generator (see module docstring)."""

    name = "stub"

    def __call__(self, payload: bytes) -> Dict[str, np.ndarray]:
        spec = json.loads(payload.decode("utf-8"))
        logic = spec["logic_points"]
        h, w = _FEAT_H, _FEAT_W
        heads = {
            "hm": np.full((1, 2, h, w), -12.0, dtype=np.float64),
            "wh": np.zeros((1, 8, h, w), dtype=np.float64),
            "ax": np.zeros((1, 4, h, w), dtype=np.float64),
            "cr": np.zeros((1, 4, h, w), dtype=np.float64),
            "reg": np.zeros((1, 2, h, w), dtype=np.float64),
        }
        for i, (r0, r1, c0, c1) in enumerate(logic):
            x0, x1 = c0 * _CELL_W, (c1 + 1) * _CELL_W
            y0, y1 = r0 * _CELL_H, (r1 + 1) * _CELL_H
            cx, cy = int((x0 + x1) / 2), int((y0 + y1) / 2)
            heads["hm"][0, 0, cy, cx] = _logit(0.9 - 0.0001 * i)
            # the decode's ys = flat_ind / width is FLOAT division (reference
            # quirk, ref utils_table_lore_rec.py:201) leaving an x/width
            # residue on y; a trained reg head absorbs it — so does the stub
            heads["reg"][0, 1, cy, cx] = -cx / w
            # wh = center − corner for the 4 corners (tl, tr, br, bl)
            corners = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
            for ci, (px, py) in enumerate(corners):
                heads["wh"][0, 2 * ci, cy, cx] = cx - px
                heads["wh"][0, 2 * ci + 1, cy, cx] = cy - py
            heads["ax"][0, :, cy, cx] = [r0, r1, c0, c1]
        return heads


LORE_MEAN = np.array([0.408, 0.447, 0.470], dtype=np.float32).reshape(1, 1, 3)
LORE_STD = np.array([0.289, 0.274, 0.278], dtype=np.float32).reshape(1, 1, 3)


def _affine_scale_axis(a: np.ndarray, new_len: int, f: float, axis: int) -> np.ndarray:
    """1-D bilinear sample of ``dst = src * f`` with warpAffine's mapping
    (``src = dst / f``, NO half-pixel shift — cv2.warpAffine, unlike
    cv2.resize) and BORDER_CONSTANT 0 (an out-of-range tap contributes 0,
    which for a zero border equals cv2's blend)."""
    a = np.moveaxis(np.asarray(a, dtype=float), axis, 0)
    old = a.shape[0]
    src = np.arange(new_len) / f
    lo = np.floor(src).astype(int)
    frac = src - lo
    shape = (-1,) + (1,) * (a.ndim - 1)
    w0 = ((1 - frac) * ((lo >= 0) & (lo < old))).reshape(shape)
    w1 = (frac * ((lo + 1 >= 0) & (lo + 1 < old))).reshape(shape)
    out = a[np.clip(lo, 0, old - 1)] * w0 + a[np.clip(lo + 1, 0, old - 1)] * w1
    return np.moveaxis(out, 0, axis)


def lore_preprocess(img: np.ndarray, inp_h: int = 768, inp_w: int = 768) -> Dict:
    """M1 — TSRLore.preprocess (ref table_structure_lore.py:35-55), cv2-free.

    Upper-left affine warp (scale ``inp/max(h, w)``, zero border) to
    ``inp_w x inp_h``, /255, LORE mean/std, HWC→NCHW.  Returns the
    reference's ``{"img", "meta"}`` dict; ``meta["s"]`` is the span the
    decode must unwarp with (transform_preds_upper_left).
    """
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.stack((img,) * 3, axis=-1)
    h, w = img.shape[:2]
    s = max(h, w) * 1.0
    f = min(inp_w, inp_h) / s  # upper_left_affine scale, decode.py:159-167
    warped = _affine_scale_axis(_affine_scale_axis(img, inp_h, f, 0), inp_w, f, 1)
    inp = ((warped / 255.0 - LORE_MEAN) / LORE_STD).astype(np.float32)
    return {
        "img": inp.transpose(2, 0, 1).reshape(1, 3, inp_h, inp_w),
        "meta": {"c": (0.0, 0.0), "s": s, "out_height": inp_h // 4, "out_width": inp_w // 4},
    }


class OnnxBackend:
    """Real ONNXRuntime detect-head session over the numpy preprocess.

    The preprocessing (M1) is real code — :func:`lore_preprocess` — so on a
    cluster the only additions are the onnxruntime wheel + weights
    (``--py-files``/``--files``); nothing else changes.  The payload is an
    npy-packed HWC uint8 BGR array (codec decode from JPEG/PNG bytes is a
    separate stage — :mod:`.multimodal`'s image decoder).
    """

    name = "onnx"

    def __init__(self, model_path: str):
        try:
            import onnxruntime as ort  # noqa: F401
        except ImportError as exc:  # pragma: no cover - no ort in container
            raise NotImplementedError(
                "onnxruntime is not installed in this environment; distribute "
                "the wheel + model via --py-files/--files and this backend "
                "becomes a per-worker ort.InferenceSession over the same "
                "preprocess + decode path."
            ) from exc
        import onnxruntime as ort

        opts = ort.SessionOptions()
        opts.graph_optimization_level = ort.GraphOptimizationLevel.ORT_ENABLE_ALL
        self._sess = ort.InferenceSession(model_path, sess_options=opts)

    def __call__(self, payload: bytes) -> Dict[str, np.ndarray]:  # pragma: no cover
        img = unpack_class_mask(payload)  # npy wire format, any uint8 array
        info = lore_preprocess(img)
        feed = {self._sess.get_inputs()[0].name: info["img"]}
        hm, st, wh, ax, cr, reg = self._sess.run(None, feed)
        return {
            "hm": hm, "st": st, "wh": wh, "ax": ax, "cr": cr, "reg": reg,
            "meta": info["meta"],
        }


_BACKEND_CACHE: Dict[Tuple[str, str], object] = {}


def get_backend(name: str = "stub", model_path: str = "") -> object:
    """Per-process backend singleton (the executor-side session cache)."""
    key = (name, model_path)
    if key not in _BACKEND_CACHE:
        _BACKEND_CACHE[key] = StubBackend() if name == "stub" else OnnxBackend(model_path)
    return _BACKEND_CACHE[key]


INFER_SCHEMA = (
    "conv_id string, turn_idx int, table_idx int, "
    "cell_quads array<array<double>>, logic_points array<array<int>>, "
    "n_cells int, mean_score double"
)


def decode_heads(heads: Dict[str, np.ndarray]):
    """Model heads → (quads (N,8) image-space, logic (N,4) int, scores).

    An onnx backend carries the per-image warp meta (``lore_preprocess``),
    which sets the unwarp span; the stub's payloads are already in the
    fixed feature space.
    """
    # read, don't pop: a backend may return a cached/shared heads dict, and
    # mutating it would make a second decode of the same payload silently
    # fall back to the stub span constants (decode_quads reads named keys,
    # so the extra "meta" entry is harmless downstream)
    meta = heads.get("meta", None)
    span, ow, oh = (
        (meta["s"], meta["out_width"], meta["out_height"])
        if meta
        else (_SPAN, _FEAT_W, _FEAT_H)
    )
    dets, logic_feat = decode_quads(heads, k=3000)
    quads, feat, scores = select_detections(dets, logic_feat)
    quads = unwarp_coords(quads, span, ow, oh)
    return quads, snap_and_round_logic(feat), scores


def structure_infer(df, backend: str = "stub", model_path: str = ""):
    """DataFrame(conv_id, turn_idx, table_idx, payload:binary) → structures.

    One Arrow-batched ``mapInPandas`` stage; the backend session is created
    once per python worker (closure + process cache), amortized over every
    batch that worker processes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = get_backend(backend, model_path)  # per-worker singleton
        for pdf in batches:
            out = {k: [] for k in (
                "conv_id", "turn_idx", "table_idx",
                "cell_quads", "logic_points", "n_cells", "mean_score",
            )}
            for conv_id, turn_idx, table_idx, payload in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["table_idx"], pdf["payload"]
            ):
                quads, logic, scores = decode_heads(model(bytes(payload)))
                out["conv_id"].append(conv_id)
                out["turn_idx"].append(int(turn_idx))
                out["table_idx"].append(int(table_idx))
                out["cell_quads"].append(quads.reshape(-1, 8).tolist())
                out["logic_points"].append(logic.tolist())
                out["n_cells"].append(len(logic))
                out["mean_score"].append(float(scores.mean()) if len(scores) else 0.0)
            yield pd.DataFrame(out)

    src = df.select("conv_id", "turn_idx", "table_idx", "payload")
    return src.mapInPandas(run, schema=INFER_SCHEMA)


def pack_class_mask(pred: "np.ndarray") -> bytes:
    """Serialize a uint8 class mask (0 bg / 1 h-line / 2 v-line) into the
    binary payload column (npy wire format — numpy-only, deterministic)."""
    import io

    buf = io.BytesIO()
    np.save(buf, np.asarray(pred, dtype=np.uint8), allow_pickle=False)
    return buf.getvalue()


def unpack_class_mask(payload: bytes) -> "np.ndarray":
    import io

    return np.load(io.BytesIO(bytes(payload)), allow_pickle=False)


def wired_structure_infer(df, rotated_fix: bool = True):
    """Wired-path twin of :func:`structure_infer`: DataFrame(conv_id,
    turn_idx, table_idx, payload:binary class mask) → same INFER_SCHEMA.

    The payload stands where the UNet's ONNX output mask would be (ref
    wired_table_rec/table_structure_unet.py:73-76 produces exactly this
    class mask); the whole postprocess (morphological close → line segments
    → adjust → skew fix → interior cells → TableRecover logic points) runs
    vectorized per mask inside one Arrow-batched ``mapInPandas`` stage —
    swapping in a real ONNX session only changes where ``pred`` comes from.
    """
    from ..core.morphology import wired_polygons_from_class_mask
    from ..core.recover import recover_logic_points

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "conv_id", "turn_idx", "table_idx",
                "cell_quads", "logic_points", "n_cells", "mean_score",
            )}
            for conv_id, turn_idx, table_idx, payload in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["table_idx"], pdf["payload"]
            ):
                pred = unpack_class_mask(payload)
                polys, rotated = wired_polygons_from_class_mask(
                    pred, rotated_fix=rotated_fix
                )
                if polys:
                    # TableRecover runs on the deskewed quads, as the
                    # reference does (wired_table_rec/main.py:99-101 feeds
                    # rotated_polygons)
                    logic = np.asarray(recover_logic_points(np.asarray(rotated)))
                    quads = np.asarray(polys).reshape(len(polys), 8)
                else:
                    logic = np.zeros((0, 4), dtype=int)
                    quads = np.zeros((0, 8))
                out["conv_id"].append(conv_id)
                out["turn_idx"].append(int(turn_idx))
                out["table_idx"].append(int(table_idx))
                out["cell_quads"].append(quads.tolist())
                out["logic_points"].append(logic.tolist())
                out["n_cells"].append(len(logic))
                out["mean_score"].append(1.0 if len(logic) else 0.0)
            yield pd.DataFrame(out)

    src = df.select("conv_id", "turn_idx", "table_idx", "payload")
    return src.mapInPandas(run, schema=INFER_SCHEMA)
