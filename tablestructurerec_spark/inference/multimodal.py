"""Multimodal columns: opaque binary payloads + typed metadata, Spark-side.

Images/audio/video ride as ``binary`` columns with a typed ``meta`` struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.  The actual codec step is STUBBED — this container
ships no image/audio libraries — behind :func:`get_decoder`: with PIL/cv2/
soundfile installed the real decoder drops in; without them a clearly-marked
deterministic fake (seeded from the payload bytes) produces arrays of the
meta-declared shape, so the Spark-side plumbing (schema, projection before
the UDF, batch shapes, partitioning) is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "synth_media",
    "image_features",
    "audio_features",
    "video_frame_sample",
]

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, channels:int, sample_rate:int, "
    "duration_ms:int, n_frames:int, format:string>"
)


def _fake_decode_image(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """DETERMINISTIC FAKE decoder (no PIL/cv2 in this container).

    Real deployment: replace via get_decoder() with PIL.Image.open(BytesIO).
    The fake seeds a generator from the payload digest so identical bytes
    decode identically on every executor.
    """
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


def _fake_decode_audio(payload: bytes, sample_rate: int, duration_ms: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    n = max(int(sample_rate * duration_ms / 1000), 1)
    return rng.standard_normal(n).astype(np.float32)


def get_decoder(kind: str):
    """Real decoder if its library exists, else the deterministic fake."""
    if kind == "image":
        try:  # pragma: no cover - PIL absent in this container
            from io import BytesIO

            from PIL import Image

            def _pil_decode(payload, w, h, c):
                # normalize EVERY payload (grayscale, palette, RGBA) to
                # 3-channel BGR — the reference's cv2 LoadImage contract
                # (lineless_table_rec/utils/utils.py:249-341) that all
                # consumers (classifier preprocess, feature stages) assume;
                # raw RGB here would silently channel-swap the models
                rgb = np.asarray(Image.open(BytesIO(payload)).convert("RGB"))
                return rgb[..., ::-1].copy()

            return _pil_decode
        except ImportError:
            return _fake_decode_image
    if kind == "audio":
        try:  # pragma: no cover - soundfile absent
            import soundfile as sf  # noqa: F401

            raise ImportError  # keep the fake until a real payload format is fixed
        except ImportError:
            return _fake_decode_audio
    raise ValueError(kind)


def synth_media(spark, n: int, kind: str = "image", seed: int = 42) -> DataFrame:
    """Deterministic synthetic media rows (payload = seeded bytes)."""
    base = spark.range(0, n)
    if kind == "image":
        meta = F.struct(
            F.lit(32).alias("width"), F.lit(24).alias("height"),
            F.lit(3).alias("channels"), F.lit(0).alias("sample_rate"),
            F.lit(0).alias("duration_ms"), F.lit(0).alias("n_frames"),
            F.lit("raw").alias("format"),
        )
    else:
        meta = F.struct(
            F.lit(0).alias("width"), F.lit(0).alias("height"),
            F.lit(0).alias("channels"), F.lit(8000).alias("sample_rate"),
            F.lit(250).alias("duration_ms"), F.lit(0).alias("n_frames"),
            F.lit("pcm").alias("format"),
        )
    return base.select(
        F.col("id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.sha2(F.concat(F.lit(f"{kind}-{seed}-"), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        meta.alias("meta"),
    )


_IMG_FEAT_SCHEMA = (
    "media_id long, mean_luma double, luma_hist array<double>, "
    "thumb_h int, thumb_w int"
)


def image_features(df: DataFrame, thumb: int = 8) -> DataFrame:
    """Decode → luma histogram + mean + nearest-neighbor thumbnail shape."""
    src = df.select("media_id", "payload", "meta.width", "meta.height", "meta.channels")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = get_decoder("image")
        for pdf in batches:
            out = {"media_id": [], "mean_luma": [], "luma_hist": [], "thumb_h": [], "thumb_w": []}
            for mid, payload, w, h, c in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"], pdf["channels"]
            ):
                img = decode(bytes(payload), int(w), int(h), int(c))
                luma = img.astype(np.float64).mean(axis=2)
                hist, _ = np.histogram(luma, bins=8, range=(0, 256))
                step_y = max(luma.shape[0] // thumb, 1)
                step_x = max(luma.shape[1] // thumb, 1)
                thumb_arr = luma[::step_y, ::step_x]
                out["media_id"].append(int(mid))
                out["mean_luma"].append(float(luma.mean()))
                out["luma_hist"].append((hist / hist.sum()).tolist())
                out["thumb_h"].append(thumb_arr.shape[0])
                out["thumb_w"].append(thumb_arr.shape[1])
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=_IMG_FEAT_SCHEMA)


_AUDIO_FEAT_SCHEMA = "media_id long, rms double, n_samples int, frame_energies array<double>"


def audio_features(df: DataFrame, frame_ms: int = 50) -> DataFrame:
    src = df.select("media_id", "payload", "meta.sample_rate", "meta.duration_ms")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = get_decoder("audio")
        for pdf in batches:
            out = {"media_id": [], "rms": [], "n_samples": [], "frame_energies": []}
            for mid, payload, sr, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["sample_rate"], pdf["duration_ms"]
            ):
                wave = decode(bytes(payload), int(sr), int(dur))
                frame = max(int(sr) * frame_ms // 1000, 1)
                n_frames = len(wave) // frame
                frames = wave[: n_frames * frame].reshape(n_frames, frame)
                out["media_id"].append(int(mid))
                out["rms"].append(float(np.sqrt((wave**2).mean())))
                out["n_samples"].append(len(wave))
                out["frame_energies"].append(np.sqrt((frames**2).mean(axis=1)).tolist())
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=_AUDIO_FEAT_SCHEMA)


def video_frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan: which frame indices to decode per video.

    Pure Catalyst (no UDF): the decode itself would consume these indices in
    a downstream image stage.
    """
    return df.select(
        "media_id",
        F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))
        .alias("frame_indices"),
    )
