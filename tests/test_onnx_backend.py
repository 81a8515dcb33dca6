"""OnnxBackend construction/feed wiring, tested via a fake onnxruntime.

The container has no onnxruntime wheel, so the import guard fired before any
of OnnxBackend's code ran in earlier rounds — "only the wheel + weights are
missing" was asserted, not tested.  A monkeypatched fake module covers the
real code path: session options, model path, input-name feed wiring, the
exact preprocess tensor handed to run(), head unpacking, and the meta
threading that decode_heads unwarps with.

Ref parity surface: table_structure_lore.py:57-76 (session + feed),
lineless_table_rec/utils/utils.py:33-90 (OrtInferSession options).
"""

import sys
import types

import numpy as np
import pytest


class _FakeSession:
    """Records construction + run() inputs; returns stub-derived heads."""

    last = None

    def __init__(self, model_path, sess_options=None):
        self.model_path = model_path
        self.sess_options = sess_options
        self.feeds = []
        _FakeSession.last = self

    def get_inputs(self):
        return [types.SimpleNamespace(name="input.1")]

    def run(self, outputs, feed):
        assert outputs is None
        self.feeds.append(feed)
        # six LORE heads at the 768/4 = 192 feature resolution, one planted
        # cell: center heat + corner offsets + logic axis, like StubBackend
        h = w = 192
        hm = np.full((1, 2, h, w), -12.0)
        st = np.zeros((1, 8, h, w))
        wh = np.zeros((1, 8, h, w))
        ax = np.zeros((1, 4, h, w))
        cr = np.zeros((1, 4, h, w))
        reg = np.zeros((1, 2, h, w))
        cx, cy = 40, 24
        hm[0, 0, cy, cx] = 6.0  # sigmoid ≈ 0.9975
        reg[0, 1, cy, cx] = -cx / w
        for ci, (px, py) in enumerate(
            [(cx - 8, cy - 4), (cx + 8, cy - 4), (cx + 8, cy + 4), (cx - 8, cy + 4)]
        ):
            wh[0, 2 * ci, cy, cx] = cx - px
            wh[0, 2 * ci + 1, cy, cx] = cy - py
        ax[0, :, cy, cx] = [1, 2, 3, 4]
        return hm, st, wh, ax, cr, reg


@pytest.fixture()
def fake_ort(monkeypatch):
    mod = types.ModuleType("onnxruntime")
    mod.SessionOptions = lambda: types.SimpleNamespace(graph_optimization_level=None)
    mod.GraphOptimizationLevel = types.SimpleNamespace(ORT_ENABLE_ALL="ENABLE_ALL")
    mod.InferenceSession = _FakeSession
    monkeypatch.setitem(sys.modules, "onnxruntime", mod)
    # the backend cache would otherwise return a stale instance across tests
    from tablestructurerec_spark.inference import runner

    monkeypatch.setattr(runner, "_BACKEND_CACHE", {})
    return mod


def _payload(img):
    from tablestructurerec_spark.inference.runner import pack_class_mask

    return pack_class_mask(img)


def test_session_options_and_model_path(fake_ort):
    from tablestructurerec_spark.inference.runner import OnnxBackend

    be = OnnxBackend("/models/lore_detect.onnx")
    sess = be._sess
    assert sess.model_path == "/models/lore_detect.onnx"
    assert sess.sess_options.graph_optimization_level == "ENABLE_ALL"


def test_feed_is_named_preprocess_tensor(fake_ort):
    from tablestructurerec_spark.inference.runner import OnnxBackend, lore_preprocess

    img = (np.arange(100 * 80 * 3, dtype=np.int64) % 251).astype(np.uint8).reshape(
        100, 80, 3
    )
    be = OnnxBackend("m.onnx")
    heads = be(_payload(img))
    (feed,) = be._sess.feeds
    assert set(feed) == {"input.1"}
    x = feed["input.1"]
    assert x.shape == (1, 3, 768, 768) and x.dtype == np.float32
    np.testing.assert_array_equal(x, lore_preprocess(img)["img"])
    # head unpacking: six named arrays + the preprocess meta rides along
    assert set(heads) == {"hm", "st", "wh", "ax", "cr", "reg", "meta"}
    assert heads["meta"]["s"] == 100.0  # max(h, w)
    assert heads["meta"]["out_width"] == 192


def test_decode_unwarps_with_session_meta(fake_ort):
    from tablestructurerec_spark.inference.runner import OnnxBackend, decode_heads

    img = np.zeros((300, 200, 3), dtype=np.uint8)
    be = OnnxBackend("m.onnx")
    quads, logic, scores = decode_heads(be(_payload(img)))
    assert len(quads) == 1 and list(logic[0]) == [1, 2, 3, 4]
    # meta span: feature coords scale by s / out_width = 300 / 192
    f = 300.0 / 192.0
    np.testing.assert_allclose(
        quads[0][0], [(40 - 8) * f, (24 - 4) * f], rtol=1e-9
    )


def test_backend_cache_is_per_model_singleton(fake_ort):
    from tablestructurerec_spark.inference.runner import get_backend

    a = get_backend("onnx", "m1.onnx")
    b = get_backend("onnx", "m1.onnx")
    c = get_backend("onnx", "m2.onnx")
    assert a is b and a is not c
