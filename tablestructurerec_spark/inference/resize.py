"""Keep-ratio model-input resize (M5 preprocess), cv2-free.

Reproduces the reference's resize chain
(``wired_table_rec/utils/utils.py:370-514``):

* ``rescale_size`` / ``_scale_size`` — the exact new-size arithmetic
  (``int(dim * factor + 0.5)``; short/long-edge-bounded scale factor),
  golden-tested by the reference's own cases
  (tests/test_wired_table_rec.py:228-244).
* ``imresize`` — separable resampling in vectorized numpy with cv2's
  half-pixel source mapping ``src = (dst + 0.5) * (old / new) - 0.5``:
  ``nearest``, ``bilinear``, ``bicubic`` (Catmull-Rom family, a = -0.75 as
  cv2), and ``area`` (box mean; exact for integer downscale factors,
  fractional-coverage weighting otherwise).  Pixel-exact parity with cv2 is
  not asserted anywhere (cv2 absent in this container) — the downstream
  contract is the UNet's tolerance to resampling, and the *size/scale*
  arithmetic, which is exact.
* ``resize_img`` — keep-ratio composition with the reference's
  area-when-shrinking / bicubic-when-growing choice
  (``utils.py:372-378``).
"""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np

__all__ = ["rescale_size", "imresize", "resize_img"]

Scale = Union[float, int, Tuple[int, int]]


def _scale_size(size: Tuple[int, int], scale) -> Tuple[int, int]:
    if isinstance(scale, (float, int)):
        scale = (scale, scale)
    w, h = size
    return int(w * float(scale[0]) + 0.5), int(h * float(scale[1]) + 0.5)


def rescale_size(old_size: Tuple[int, int], scale: Scale, return_scale: bool = False):
    """New (w, h) under a float factor or a (max_long, max_short) bound."""
    w, h = old_size
    if isinstance(scale, (float, int)):
        if scale <= 0:
            raise ValueError(f"Invalid scale {scale}, must be positive.")
        scale_factor = scale
    elif isinstance(scale, tuple):
        max_long_edge = max(scale)
        max_short_edge = min(scale)
        scale_factor = min(max_long_edge / max(h, w), max_short_edge / min(h, w))
    else:
        raise TypeError(f"Scale must be a number or tuple of int, but got {type(scale)}")
    new_size = _scale_size((w, h), scale_factor)
    if return_scale:
        return new_size, scale_factor
    return new_size


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    out = np.zeros_like(ax)
    m1 = ax <= 1
    m2 = (ax > 1) & (ax < 2)
    out[m1] = (a + 2) * ax[m1] ** 3 - (a + 3) * ax[m1] ** 2 + 1
    out[m2] = a * ax[m2] ** 3 - 5 * a * ax[m2] ** 2 + 8 * a * ax[m2] - 4 * a
    return out


def _resample_axis(img: np.ndarray, new_len: int, axis: int, interpolation: str) -> np.ndarray:
    """Separable 1-D resample along ``axis`` (half-pixel mapping)."""
    a = np.moveaxis(np.asarray(img, dtype=float), axis, 0)
    old_len = a.shape[0]
    if new_len == old_len:
        return np.moveaxis(a, 0, axis)
    ratio = old_len / new_len
    centers = (np.arange(new_len) + 0.5) * ratio - 0.5
    if interpolation == "nearest":
        idx = np.clip(np.floor((np.arange(new_len) + 0.5) * ratio).astype(int), 0, old_len - 1)
        out = a[idx]
    elif interpolation == "bilinear":
        lo = np.floor(centers).astype(int)
        frac = centers - lo
        lo0 = np.clip(lo, 0, old_len - 1)
        lo1 = np.clip(lo + 1, 0, old_len - 1)
        f = frac.reshape((-1,) + (1,) * (a.ndim - 1))
        out = a[lo0] * (1 - f) + a[lo1] * f
    elif interpolation == "bicubic":
        lo = np.floor(centers).astype(int)
        out = np.zeros((new_len,) + a.shape[1:], dtype=float)
        wsum = np.zeros((new_len,) + (1,) * (a.ndim - 1))
        for t in (-1, 0, 1, 2):
            idx = np.clip(lo + t, 0, old_len - 1)
            wgt = _cubic_kernel(centers - (lo + t)).reshape((-1,) + (1,) * (a.ndim - 1))
            out += a[idx] * wgt
            wsum += wgt
        out /= wsum
    elif interpolation == "lanczos":
        # Lanczos4 (cv2 INTER_LANCZOS4 family): sinc(x)*sinc(x/4), 8 taps
        lo = np.floor(centers).astype(int)
        out = np.zeros((new_len,) + a.shape[1:], dtype=float)
        wsum = np.zeros((new_len,) + (1,) * (a.ndim - 1))
        for t in range(-3, 5):
            idx = np.clip(lo + t, 0, old_len - 1)
            x = centers - (lo + t)
            wgt = np.where(np.abs(x) < 4, np.sinc(x) * np.sinc(x / 4), 0.0)
            wgt = wgt.reshape((-1,) + (1,) * (a.ndim - 1))
            out += a[idx] * wgt
            wsum += wgt
        out /= wsum
    elif interpolation == "area":
        # fractional box coverage: output i averages src span [i*r, (i+1)*r)
        starts = np.arange(new_len) * ratio
        ends = starts + ratio
        out = np.zeros((new_len,) + a.shape[1:], dtype=float)
        cum = np.concatenate([np.zeros((1,) + a.shape[1:]), np.cumsum(a, axis=0)])
        for i in range(new_len):
            s, e = starts[i], min(ends[i], old_len)
            s0, e0 = int(np.floor(s)), int(np.ceil(e))
            total = cum[e0] - cum[s0]
            if s > s0:
                total -= a[s0] * (s - s0)
            if e0 > e:
                total -= a[e0 - 1] * (e0 - e)
            out[i] = total / (e - s)
    else:
        raise ValueError(f"unsupported interpolation {interpolation}")
    return np.moveaxis(out, 0, axis)


def imresize(
    img: np.ndarray,
    size: Tuple[int, int],
    return_scale: bool = False,
    interpolation: str = "bilinear",
):
    """Resize to (w, h); separable numpy resampling, float output."""
    h, w = img.shape[:2]
    out = _resample_axis(img, size[1], 0, interpolation)
    out = _resample_axis(out, size[0], 1, interpolation)
    if np.issubdtype(np.asarray(img).dtype, np.integer):
        out = np.clip(np.round(out), np.iinfo(img.dtype).min, np.iinfo(img.dtype).max).astype(
            img.dtype
        )
    if not return_scale:
        return out
    return out, size[0] / w, size[1] / h


def resize_img(img: np.ndarray, scale: Scale, keep_ratio: bool = True):
    """Keep-ratio resize with the reference's interpolation choice: area
    when shrinking (min side > min target), bicubic when growing."""
    h, w = img.shape[:2]
    if keep_ratio:
        interpolation = "area" if min(img.shape[:2]) > min(scale) else "bicubic"
        new_size, _scale_factor = rescale_size((w, h), scale, return_scale=True)
        img_new = imresize(img, new_size, interpolation=interpolation)
        new_h, new_w = img_new.shape[:2]
        return img_new, new_w / w, new_h / h
    img_new, w_scale, h_scale = imresize(img, scale, return_scale=True)
    return img_new, w_scale, h_scale
