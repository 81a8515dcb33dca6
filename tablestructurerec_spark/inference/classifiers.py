"""M8 — the reference's three image-classifier preprocess/vote pipelines.

Reproduces (cv2/PIL-free) the crop/resize/normalize/vote semantics of the
wired-vs-wireless router backends:

* Yolo  — BGR→RGB, short-side resize to 640 + center crop (INTER_LINEAR),
  /255, CHW; decision = argmax of the first batch row, cls map
  ``{0: wireless, 1: wired}`` — ref ``table_cls/main.py:144-161``,
  ``resize_and_center_crop`` ref ``table_cls/utils/utils.py:183-214``.
* Paddle — short-side resize to 256 (INTER_LANCZOS4), 224 center crop,
  /255, ImageNet mean/std, CHW; decision = MAJORITY VOTE over per-row
  argmaxes, cls map ``{0: wired, 1: wireless}`` — ref ``main.py:74-112``.
  NB the reference does NOT convert BGR→RGB here (it normalizes BGR with
  RGB means) — reproduced as-is, quirk included.
* Qanything — BGR→RGB then cv2's *BGR* gray formula applied to the RGB
  array (so gray = 0.114 R + 0.587 G + 0.299 B, the reference's
  double-convert quirk), 3-channel stack, resize to 224 (PIL bicubic),
  /255, mean/std, CHW; decision = softmax argmax, ``{0: wired,
  1: wireless}`` — ref ``main.py:114-141``.

Resampling rides :mod:`.resize` (vectorized numpy, cv2's half-pixel
mapping).  As with M5, pixel-exact parity with cv2/PIL kernels is not
asserted (neither library ships in this container); the *geometry* —
resize arithmetic, crop windows, channel order, normalization constants,
vote logic — is exact and unit-tested.

The ONNX call itself follows the S3 pattern: any session callable taking a
``(N, C, H, W)`` float32 batch and returning ``(N, 2)`` scores drops in;
:class:`StubClsSession` is the deterministic sandbox stand-in.  The
structural router (:func:`core.pipeline.classify_table_kind`) remains the
default route for HTML-borne tables; these kernels make the image route
real code rather than a documented gap.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

__all__ = [
    "resize_and_center_crop",
    "yolo_preprocess",
    "paddle_preprocess",
    "qanything_preprocess",
    "yolo_decide",
    "paddle_decide",
    "qanything_decide",
    "StubClsSession",
    "classify_image",
    "table_cls_infer",
]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

_YOLO_CLS = {0: "wireless", 1: "wired"}
_PADDLE_CLS = {0: "wired", 1: "wireless"}
_Q_CLS = {0: "wired", 1: "wireless"}


def _bgr2rgb(img: np.ndarray) -> np.ndarray:
    return img[..., ::-1]


def resize_and_center_crop(image: np.ndarray, output_size: int = 640) -> np.ndarray:
    """Short side → ``output_size`` (bilinear), center crop to square.

    Exact size/window arithmetic of ref table_cls/utils/utils.py:183-214.
    """
    from .resize import imresize

    h, w = image.shape[:2]
    if w < h:
        new_w, new_h = output_size, int(output_size * h / w)
    else:
        new_w, new_h = int(output_size * w / h), output_size
    resized = imresize(image, (new_w, new_h), interpolation="bilinear")
    left = (new_w - output_size) // 2
    top = (new_h - output_size) // 2
    return resized[top : top + output_size, left : left + output_size]


def yolo_preprocess(img_bgr: np.ndarray, output_size: int = 640) -> np.ndarray:
    """ref YoloCls.preprocess (table_cls/main.py:149-155)."""
    img = _bgr2rgb(np.asarray(img_bgr))
    img = resize_and_center_crop(img, output_size)
    img = np.asarray(img, dtype=np.float32) / 255
    return np.expand_dims(img.transpose(2, 0, 1), 0)


def paddle_preprocess(
    img_bgr: np.ndarray, inp: int = 224, resize_short: int = 256
) -> np.ndarray:
    """ref PaddleCls.preprocess (table_cls/main.py:83-104): short resize
    (lanczos) → center crop → /255 → ImageNet mean/std → NCHW.  No channel
    swap, as in the reference."""
    from .resize import imresize

    img = np.asarray(img_bgr)
    h, w = img.shape[:2]
    percent = float(resize_short) / min(w, h)
    new_w, new_h = int(round(w * percent)), int(round(h * percent))
    img = imresize(img, (new_w, new_h), interpolation="lanczos")
    h2, w2 = img.shape[:2]
    w_start = (w2 - inp) // 2
    h_start = (h2 - inp) // 2
    img = img[h_start : h_start + inp, w_start : w_start + inp, :]
    img = np.asarray(img, dtype=np.float32) / 255.0
    img = (img - _IMAGENET_MEAN) / _IMAGENET_STD
    return np.expand_dims(img.transpose(2, 0, 1), 0)


def qanything_preprocess(img_bgr: np.ndarray, inp: int = 224) -> np.ndarray:
    """ref QanythingCls.preprocess (table_cls/main.py:121-133), including
    the double-convert gray quirk: BGR→RGB then the BGR gray formula on the
    RGB array, i.e. gray = 0.114 R + 0.587 G + 0.299 B."""
    from .resize import imresize

    rgb = _bgr2rgb(np.asarray(img_bgr)).astype(np.float64)
    gray = 0.114 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.299 * rgb[..., 2]
    gray = np.clip(np.round(gray), 0, 255).astype(np.uint8)
    img = np.stack((gray,) * 3, axis=-1)
    img = imresize(img, (inp, inp), interpolation="bicubic")
    img = np.asarray(img, dtype=np.float32) / 255.0
    img = (img - _IMAGENET_MEAN) / _IMAGENET_STD
    return np.expand_dims(img.transpose(2, 0, 1), 0)


def yolo_decide(scores: np.ndarray) -> str:
    """argmax of the first row (ref main.py:157-160)."""
    return _YOLO_CLS[int(np.argmax(np.asarray(scores), axis=1)[0])]


def paddle_decide(scores: np.ndarray) -> str:
    """Majority vote over per-row argmaxes (ref main.py:106-111): each crop
    votes; ties resolve by first-seen in the vote set, as the reference's
    ``max(set(idxs), key=idxs.count)`` does."""
    idxs = [int(i) for i in np.argmax(np.asarray(scores), axis=1)]
    cla = max(set(idxs), key=idxs.count)
    return _PADDLE_CLS[cla]


def qanything_decide(scores: np.ndarray) -> str:
    """Softmax then argmax of the first row (ref main.py:135-140)."""
    z = np.asarray(scores, dtype=np.float64)
    z = np.exp(z - z.max(axis=1, keepdims=True))
    z /= z.sum(axis=1, keepdims=True)
    return _Q_CLS[int(np.argmax(z, axis=1)[0])]


class StubClsSession:
    """Deterministic sandbox stand-in for OrtInferSession (S3 pattern):
    scores derived from simple batch statistics, so the full batched path
    executes without onnxruntime and identical inputs classify identically
    on every executor.  A real session (``ort.InferenceSession`` wrapped to
    return ``run(None, feed)[0]``) drops in unchanged."""

    def __call__(self, batch: np.ndarray) -> np.ndarray:
        x = np.asarray(batch, dtype=np.float64)
        m = x.mean(axis=(1, 2, 3))
        s = x.std(axis=(1, 2, 3))
        return np.stack([m, s], axis=1)


_PRE = {
    "yolo": (yolo_preprocess, yolo_decide),
    "yolox": (yolo_preprocess, yolo_decide),
    "paddle": (paddle_preprocess, paddle_decide),
    "q": (qanything_preprocess, qanything_decide),
}


def classify_image(img_bgr: np.ndarray, backend: str = "yolo", session=None) -> str:
    """preprocess → session → decide, per ref TableCls.__call__
    (table_cls/main.py:43-49)."""
    pre, decide = _PRE[backend]
    session = session or StubClsSession()
    return decide(session(pre(img_bgr)))


def table_cls_infer(df, backend: str = "yolo"):
    """Spark stage: route binary image payloads to a ``table_kind`` column.

    One Arrow-batched ``mapInPandas`` over ``(media_id, payload, meta)``
    (the :mod:`.multimodal` schema); the session is built once per python
    worker, images decode via :func:`multimodal.get_decoder` (real decoder
    when PIL/cv2 exist, deterministic fake otherwise).
    """
    import pandas as pd

    from .multimodal import get_decoder

    src = df.select("media_id", "payload", "meta")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        decode = get_decoder("image")
        session = StubClsSession()
        for pdf in batches:
            kinds = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                img = decode(bytes(payload), meta["width"], meta["height"], 3)
                kinds.append(classify_image(img, backend, session))
            yield pd.DataFrame({"media_id": pdf["media_id"], "table_kind": kinds})

    return src.mapInPandas(run, schema="media_id long, table_kind string")
