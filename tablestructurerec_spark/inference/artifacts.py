"""S2 — model artifact resolution: fetch-with-cache + cluster distribution.

Re-creates the reference's ``DownloadModel`` contract
(lineless_table_rec/utils/download_model.py:16-67) and the per-engine
``get_model_path`` dispatch (lineless_table_rec/main.py:170-186,
wired_table_rec/main.py:229-245, table_cls/main.py:55-71):

* ``fetch(url)`` — download to a local cache dir, named after the URL's
  basename, **skipping the download when the file already exists** (the
  reference's cache rule, download_model.py:33-35);
* ``resolve_model_path(model_type, model_path)`` — explicit path wins,
  else the registry maps model_type to one URL (single-model engines) or
  a dict of URLs (LORE's detect+process pair), each fetched through the
  cache (main.py:170-186).

Spark-first differences from the reference (deliberate, for the cluster):

* **atomic writes** — download to ``<name>.part.<pid>`` then ``os.replace``,
  so N executors racing on a shared cache dir (NFS, hostPath volume)
  never observe a torn file; the reference writes in place, fine for one
  process, wrong for a thousand;
* **optional sha256 pinning** — a cluster pulling weights at scale must
  not silently run a corrupted/stale artifact;
* **SparkFiles integration** — the driver calls ``distribute(spark, path)``
  once (``SparkContext.addFile``; equivalent to ``spark-submit --files``),
  executors call ``worker_path(name)`` which prefers the SparkFiles copy
  and falls back to the shared cache.  Ship-once-per-job beats
  N-executors × fetch-per-task.

Only stdlib ``urllib`` is used (the reference uses requests+tqdm; neither
is needed and requests may be absent on a stripped executor image).
"""

from __future__ import annotations

import hashlib
import os
import urllib.parse
import urllib.request
from pathlib import Path
from typing import Dict, Optional, Union

__all__ = [
    "ArtifactError",
    "DEFAULT_CACHE_DIR",
    "MODEL_REGISTRY",
    "fetch",
    "resolve_model_path",
    "distribute",
    "worker_path",
    "sha256_file",
]

ArtifactError = type("ArtifactError", (RuntimeError,), {})

DEFAULT_CACHE_DIR = Path(
    os.environ.get("TSR_SPARK_MODEL_DIR", str(Path.home() / ".cache" / "tsr_spark_models"))
)

# Mirrors the reference's three KEY_TO_MODEL_URL tables
# (lineless_table_rec/main.py:32-38, wired_table_rec/main.py:36-41,
# table_cls/main.py:21-28).  str value = single model; dict = named pair.
_ROOT_URL = "https://www.modelscope.cn/models/RapidAI/RapidTable/resolve/master"
MODEL_REGISTRY: Dict[str, Union[str, Dict[str, str]]] = {
    "lore": {
        "lore_detect": f"{_ROOT_URL}/lore/detect.onnx",
        "lore_process": f"{_ROOT_URL}/lore/process.onnx",
    },
    "unet": f"{_ROOT_URL}/unet.onnx",
    "cycle_center_net": f"{_ROOT_URL}/cycle_center_net.onnx",
    "yolo": f"{_ROOT_URL}/table_cls/yolo_cls.onnx",
    "yolox": f"{_ROOT_URL}/table_cls/yolo_cls_x.onnx",
    "paddle": f"{_ROOT_URL}/table_cls/paddle_cls.onnx",
    "q": f"{_ROOT_URL}/table_cls/q_cls.onnx",
}


def sha256_file(path: Union[str, Path], chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _read_source(url: str) -> bytes:
    """Bytes of a local path, file:// URL, or http(s) URL."""
    parsed = urllib.parse.urlparse(str(url))
    if parsed.scheme in ("", "file"):
        src = parsed.path if parsed.scheme == "file" else str(url)
        return Path(src).read_bytes()
    # 64 KiB chunks like the reference (download_model.py:55); no tqdm.
    with urllib.request.urlopen(str(url), timeout=180) as resp:  # pragma: no cover - net
        return resp.read()


def fetch(
    url: Union[str, Path],
    cache_dir: Union[str, Path, None] = None,
    name: Optional[str] = None,
    sha256: Optional[str] = None,
) -> str:
    """Download ``url`` into the cache, returning the local path.

    Reference semantics (download_model.py:18-43): target name defaults to
    the URL basename; an existing file short-circuits the download.  Added:
    atomic rename and optional sha256 pinning (checked on both the cached
    and the freshly fetched file).
    """
    cache = Path(cache_dir) if cache_dir is not None else DEFAULT_CACHE_DIR
    cache.mkdir(parents=True, exist_ok=True)
    target = cache / (name or Path(urllib.parse.urlparse(str(url)).path or str(url)).name)

    if target.exists():
        if sha256 and sha256_file(target) != sha256:
            # self-heal: a torn/stale cached copy (pre-atomic writer, partial
            # rsync) must trigger a re-fetch, not poison the node forever —
            # the fresh download below is itself pin-checked before install
            target.unlink()
        else:
            return str(target)

    try:
        blob = _read_source(str(url))
    except Exception as exc:
        raise ArtifactError(f"cannot fetch {url}") from exc
    if sha256 and hashlib.sha256(blob).hexdigest() != sha256:
        raise ArtifactError(f"fetched {url} fails sha256 pin {sha256}")

    part = target.with_name(f"{target.name}.part.{os.getpid()}")
    part.write_bytes(blob)
    os.replace(part, target)  # atomic on POSIX: racers converge on one file
    return str(target)


def resolve_model_path(
    model_type: str,
    model_path: Union[str, Path, Dict[str, str], None] = None,
    cache_dir: Union[str, Path, None] = None,
) -> Union[str, Dict[str, str]]:
    """Explicit path wins; else registry lookup + cached fetch.

    Mirrors ``get_model_path`` (lineless_table_rec/main.py:170-186): a str
    registry entry returns one path, a dict entry returns a dict of paths,
    an unknown type raises listing the known keys (main.py:60-62).
    """
    if model_path is not None:
        return model_path if isinstance(model_path, dict) else str(model_path)
    entry = MODEL_REGISTRY.get(model_type)
    if entry is None:
        known = ",".join(sorted(MODEL_REGISTRY))
        raise ArtifactError(f"{model_type} is not a supported model type ({known})")
    if isinstance(entry, str):
        return fetch(entry, cache_dir=cache_dir)
    return {k: fetch(u, cache_dir=cache_dir) for k, u in entry.items()}


def distribute(spark, path: Union[str, Path]) -> str:
    """Driver-side: ship an artifact to every executor (once per job).

    ``SparkContext.addFile`` is the programmatic twin of
    ``spark-submit --files`` (scripts/submit.sh); executors then read it
    via :func:`worker_path`.  Returns the basename to use there.
    """
    spark.sparkContext.addFile(str(path))
    return Path(path).name


def worker_path(name: str, cache_dir: Union[str, Path, None] = None) -> str:
    """Executor-side: locate a distributed artifact by basename.

    Prefers the SparkFiles copy (present when the driver called
    :func:`distribute` or the job launched with ``--files``), falling back
    to the shared cache dir.  Raises if neither exists — a worker must
    never silently run without its weights.
    """
    try:
        from pyspark import SparkFiles

        p = Path(SparkFiles.get(name))
        if p.exists():
            return str(p)
    except Exception:
        pass
    fallback = (Path(cache_dir) if cache_dir is not None else DEFAULT_CACHE_DIR) / name
    if fallback.exists():
        return str(fallback)
    raise ArtifactError(f"artifact {name!r} not found in SparkFiles or {fallback.parent}")
