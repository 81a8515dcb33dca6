"""M8 classifier preprocess/vote parity tests (geometry + quirks exact).

cv2/PIL are absent here, so these pin the reference's *arithmetic* —
resize sizes, crop windows, channel order, normalization constants, gray
quirk, vote logic (ref table_cls/main.py:30-161,
table_cls/utils/utils.py:183-214) — on synthetic images where the expected
values are hand-computable.
"""

import numpy as np
import pytest

from tablestructurerec_spark.inference.classifiers import (
    StubClsSession,
    classify_image,
    paddle_decide,
    paddle_preprocess,
    qanything_decide,
    qanything_preprocess,
    resize_and_center_crop,
    table_cls_infer,
    yolo_decide,
    yolo_preprocess,
)

_MEAN = np.array([0.485, 0.456, 0.406])
_STD = np.array([0.229, 0.224, 0.225])


def _const_bgr(b, g, r, h=100, w=160):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = b, g, r
    return img


def test_resize_and_center_crop_shapes_and_window():
    # landscape: height is short side -> new = (w*640/h, 640)
    out = resize_and_center_crop(_const_bgr(1, 2, 3, h=100, w=160), 640)
    assert out.shape == (640, 640, 3)
    # portrait
    out = resize_and_center_crop(_const_bgr(1, 2, 3, h=160, w=100), 640)
    assert out.shape == (640, 640, 3)
    # crop window arithmetic: left = (new_w - size)//2 (ref utils.py:205-211)
    img = np.tile(np.arange(200, dtype=np.uint8)[None, :, None], (100, 1, 3))
    out = resize_and_center_crop(img, 100)  # new_w = 200, left = 50
    # bilinear resize of an x-gradient keeps the gradient; the crop center
    # must equal the image center column value
    assert abs(int(out[50, 50, 0]) - 100) <= 2


def test_yolo_preprocess_channel_swap_scale_and_shape():
    x = yolo_preprocess(_const_bgr(0, 0, 255), output_size=64)
    assert x.shape == (1, 3, 64, 64) and x.dtype == np.float32
    # pure-red BGR -> RGB channel 0 is the red plane
    assert np.allclose(x[0, 0], 1.0) and np.allclose(x[0, 1:], 0.0)


def test_paddle_preprocess_no_channel_swap_and_imagenet_norm():
    x = paddle_preprocess(_const_bgr(255, 0, 0, h=300, w=400))  # pure blue
    assert x.shape == (1, 3, 224, 224)
    # reference quirk: no BGR->RGB, so channel 0 is still BLUE and is
    # normalized with the R mean/std
    want0 = (1.0 - _MEAN[0]) / _STD[0]
    want12 = (0.0 - _MEAN[1:]) / _STD[1:]
    assert np.allclose(x[0, 0], want0, atol=1e-5)
    assert np.allclose(x[0, 1], want12[0], atol=1e-5)
    assert np.allclose(x[0, 2], want12[1], atol=1e-5)


def test_paddle_resize_short_side_arithmetic():
    # h=300,w=400 -> percent=256/300; sizes int(round(...)) (ref main.py:85-89)
    from tablestructurerec_spark.inference.resize import imresize

    h, w = 300, 400
    percent = 256.0 / 300
    assert (int(round(w * percent)), int(round(h * percent))) == (341, 256)
    out = imresize(np.zeros((h, w, 3), np.uint8), (341, 256), interpolation="lanczos")
    assert out.shape == (256, 341, 3)


def test_qanything_gray_quirk_swapped_coefficients():
    # pure-red BGR: proper gray would be 76 (0.299*255); the reference's
    # double-convert computes 0.114*255 = 29
    x = qanything_preprocess(_const_bgr(0, 0, 255))
    got = x[0, 0, 0, 0] * _STD[0] + _MEAN[0]  # undo normalization
    assert abs(got * 255 - 29) < 1.0
    # pure-blue BGR gets the 0.299 coefficient instead
    x = qanything_preprocess(_const_bgr(255, 0, 0))
    got = x[0, 0, 0, 0] * _STD[0] + _MEAN[0]
    assert abs(got * 255 - 76) < 1.0
    assert x.shape == (1, 3, 224, 224)


def test_decides_match_reference_cls_maps_and_vote():
    assert yolo_decide(np.array([[0.9, 0.1]])) == "wireless"
    assert yolo_decide(np.array([[0.1, 0.9]])) == "wired"
    # majority vote across rows (ref main.py:106-111)
    votes = np.array([[0.9, 0.1], [0.2, 0.8], [0.3, 0.7]])
    assert paddle_decide(votes) == "wireless"
    assert paddle_decide(np.array([[0.9, 0.1]])) == "wired"
    assert qanything_decide(np.array([[2.0, 1.0]])) == "wired"
    assert qanything_decide(np.array([[1.0, 2.0]])) == "wireless"


def test_classify_image_deterministic_all_backends():
    img = _const_bgr(10, 60, 200, h=256, w=320)
    for backend in ("yolo", "paddle", "q"):
        a = classify_image(img, backend)
        b = classify_image(img, backend)
        assert a == b and a in ("wired", "wireless"), backend


def test_lanczos_resample_properties():
    from tablestructurerec_spark.inference.resize import imresize

    const = np.full((40, 60), 7.0)
    out = imresize(const, (30, 20), interpolation="lanczos")
    assert out.shape == (20, 30) and np.allclose(out, 7.0)
    same = imresize(const, (60, 40), interpolation="lanczos")
    assert np.allclose(same, const)


def test_table_cls_infer_stage(spark):
    from tablestructurerec_spark.inference.multimodal import synth_media

    df = synth_media(spark, 12, kind="image", seed=3)
    out = table_cls_infer(df, backend="yolo").collect()
    assert len(out) == 12
    assert all(r.table_kind in ("wired", "wireless") for r in out)
    # deterministic across runs (payload-seeded decode + stub session)
    again = table_cls_infer(df, backend="yolo").collect()
    assert sorted((r.media_id, r.table_kind) for r in out) == sorted(
        (r.media_id, r.table_kind) for r in again
    )
