"""Multimodal plumbing tests (decode stubbed, Spark plumbing real)."""

from pyspark.sql import functions as F

from tablestructurerec_spark.inference.multimodal import (
    audio_features,
    image_features,
    synth_media,
    video_frame_sample,
)


def test_image_features_deterministic(spark):
    df = synth_media(spark, 20, "image")
    out1 = {r.media_id: (r.mean_luma, tuple(r.luma_hist)) for r in image_features(df).collect()}
    out2 = {r.media_id: (r.mean_luma, tuple(r.luma_hist)) for r in image_features(df).collect()}
    assert out1 == out2 and len(out1) == 20
    for luma, hist in out1.values():
        assert 0 <= luma <= 255 and abs(sum(hist) - 1.0) < 1e-9


def test_audio_features_shapes(spark):
    df = synth_media(spark, 10, "audio")
    rows = audio_features(df).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.n_samples == 2000  # 8000 Hz * 250 ms
        assert len(r.frame_energies) == 5  # 50 ms frames
        assert r.rms > 0


def test_video_frame_sample_is_native(spark):
    df = synth_media(spark, 5, "image").withColumn(
        "meta", F.struct(F.lit(0).alias("width"), F.lit(0).alias("height"),
                         F.lit(0).alias("channels"), F.lit(0).alias("sample_rate"),
                         F.lit(0).alias("duration_ms"), F.lit(95).alias("n_frames"),
                         F.lit("mp4").alias("format"))
    )
    out = video_frame_sample(df, every_n=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan.split("Range")[0]
    rows = out.collect()
    assert rows[0].frame_indices == list(range(0, 95, 10))
