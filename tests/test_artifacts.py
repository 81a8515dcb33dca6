"""S2 artifact fetch-with-cache vs the reference DownloadModel contract
(lineless_table_rec/utils/download_model.py:16-67) — no network needed:
local paths and file:// URLs exercise the same code path as http."""

import hashlib
from pathlib import Path

import pytest

from tablestructurerec_spark.inference.artifacts import (
    MODEL_REGISTRY,
    ArtifactError,
    fetch,
    resolve_model_path,
    sha256_file,
)


@pytest.fixture()
def src(tmp_path):
    p = tmp_path / "src" / "weights.onnx"
    p.parent.mkdir()
    p.write_bytes(b"fake-onnx-bytes-123")
    return p


def test_fetch_names_after_url_basename(src, tmp_path):
    cache = tmp_path / "cache"
    out = fetch(src, cache_dir=cache)
    assert Path(out) == cache / "weights.onnx"
    assert Path(out).read_bytes() == b"fake-onnx-bytes-123"


def test_fetch_file_url_scheme(src, tmp_path):
    out = fetch(f"file://{src}", cache_dir=tmp_path / "c")
    assert Path(out).read_bytes() == b"fake-onnx-bytes-123"


def test_existing_file_short_circuits(src, tmp_path):
    # Reference rule (download_model.py:33-35): pre-existing target wins,
    # no re-download — prove it by pre-seeding different bytes.
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "weights.onnx").write_bytes(b"already-here")
    out = fetch(src, cache_dir=cache)
    assert Path(out).read_bytes() == b"already-here"


def test_explicit_name_override(src, tmp_path):
    out = fetch(src, cache_dir=tmp_path / "c", name="renamed.onnx")
    assert Path(out).name == "renamed.onnx"


def test_sha256_pin_pass_and_fail(src, tmp_path):
    good = hashlib.sha256(b"fake-onnx-bytes-123").hexdigest()
    out = fetch(src, cache_dir=tmp_path / "c", sha256=good)
    assert sha256_file(out) == good
    with pytest.raises(ArtifactError):
        fetch(src, cache_dir=tmp_path / "c2", sha256="0" * 64)


def test_sha256_pin_heals_stale_cache(src, tmp_path):
    # a corrupted cached copy is deleted and re-fetched (pin-checked), not
    # a permanent error on the node
    cache = tmp_path / "c"
    cache.mkdir()
    (cache / "weights.onnx").write_bytes(b"corrupted")
    pin = hashlib.sha256(b"fake-onnx-bytes-123").hexdigest()
    out = fetch(src, cache_dir=cache, sha256=pin)
    assert Path(out).read_bytes() == b"fake-onnx-bytes-123"
    # but if the SOURCE is also bad, the pin still refuses
    src.write_bytes(b"also-bad")
    (cache / "weights.onnx").write_bytes(b"corrupted")
    with pytest.raises(ArtifactError):
        fetch(src, cache_dir=cache, sha256=pin)


def test_fetch_missing_source_raises(tmp_path):
    with pytest.raises(ArtifactError):
        fetch(tmp_path / "nope.onnx", cache_dir=tmp_path / "c")
    assert not (tmp_path / "c" / "nope.onnx").exists()  # no torn/empty file left


def test_resolve_explicit_path_wins(tmp_path):
    # main.py:171-172 — caller-supplied path bypasses registry + download.
    assert resolve_model_path("lore", "/opt/custom.onnx") == "/opt/custom.onnx"
    d = {"lore_detect": "a", "lore_process": "b"}
    assert resolve_model_path("lore", d) == d


def test_resolve_unknown_type_lists_known():
    with pytest.raises(ArtifactError) as ei:
        resolve_model_path("bogus")
    assert "unet" in str(ei.value)


def test_resolve_dict_entry_fetches_each(tmp_path, monkeypatch):
    # LORE maps to a detect+process pair (lineless_table_rec/main.py:33-38);
    # point the registry at local files and check both land in the cache.
    det = tmp_path / "detect.onnx"
    proc = tmp_path / "process.onnx"
    det.write_bytes(b"d")
    proc.write_bytes(b"p")
    monkeypatch.setitem(
        MODEL_REGISTRY, "lore", {"lore_detect": str(det), "lore_process": str(proc)}
    )
    got = resolve_model_path("lore", cache_dir=tmp_path / "cache")
    assert set(got) == {"lore_detect", "lore_process"}
    assert Path(got["lore_detect"]).read_bytes() == b"d"
    assert Path(got["lore_process"]).read_bytes() == b"p"


def test_registry_covers_all_reference_engines():
    # One key per reference KEY_TO_MODEL_URL entry across the three engines
    # (lineless main.py:33, wired main.py:37, table_cls main.py:22).
    assert {"lore", "unet", "cycle_center_net", "yolo", "yolox", "paddle", "q"} <= set(
        MODEL_REGISTRY
    )


def test_worker_path_cache_fallback(tmp_path, monkeypatch):
    from tablestructurerec_spark.inference import artifacts

    (tmp_path / "w.onnx").write_bytes(b"x")
    assert artifacts.worker_path("w.onnx", cache_dir=tmp_path).endswith("w.onnx")
    with pytest.raises(ArtifactError):
        artifacts.worker_path("absent.onnx", cache_dir=tmp_path)
