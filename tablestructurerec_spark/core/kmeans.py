"""Deterministic Lloyd k-means for the IVF coarse quantizer.

This is the TRAINED-quantizer analogue of the reference's fixed model
artifacts (the reference ships pre-trained weights and runs them
deterministically; see ``/root/reference/table_cls/main.py`` model loading).
The engine needs a quantizer whose fit is a *pure function of the training
sample* so that (a) repeat runs of ``ann_ivf_kmeans_topk`` are identical and
(b) an independent oracle process can refit on the same sample and get
bit-identical centers — which is what upgrades the query from a rows-only
driver check to a full value-hash oracle.

Design for 100 TB: the quantizer never trains distributed.  The caller
collects a BOUNDED sample (fixed id range, not a corpus fraction — see
``operators/similarity._KMEANS_SAMPLE_MAX_ID``) to the driver, fits here in
numpy (≤131k × 64 float64 ≈ 67 MB, milliseconds per iteration), and
broadcasts the O(k·dim) centers.  Assignment — the O(corpus) part — stays a
distributed map-side argmin.  This replaces the round-2 MLlib ``KMeans``
(seeded but implementation-opaque: k-means|| init made the fit
non-reproducible outside the JVM, so no oracle could replay it).

Determinism contract (both the Spark query and the DuckDB-oracle builder
call this exact function on the exact same float32-widened rows, in the
same vec_id order, on the same machine):

* init: the first ``k`` rows of the sample (callers order by vec_id) —
  k-means++ would need an RNG whose stream both sides share; first-k is
  deterministic and on a bounded *hash-ordered* id range is an arbitrary
  (unbiased) draw from the corpus;
* assignment ties: ``argmin`` keeps the lowest center index;
* empty cluster: keeps its previous center (no resample — RNG-free);
* fixed iteration count, no tolerance early-exit (float tolerance tests
  are another cross-process hazard; 8 Lloyd rounds on a bounded sample is
  a fixed, cheap cost).
"""

from __future__ import annotations

import numpy as np

__all__ = ["lloyd"]

_CHUNK = 8192  # rows per distance block: bounds the (chunk, k, dim) temp


def lloyd(vectors: np.ndarray, k: int, iters: int = 8) -> np.ndarray:
    """Fit ``k`` centers on ``vectors`` (n, dim) with ``iters`` Lloyd rounds.

    Returns a (k, dim) float64 array.  Pure function of the inputs — no RNG,
    no data-dependent iteration count.  Requires n >= k.
    """
    x = np.ascontiguousarray(vectors, dtype=np.float64)
    n = x.shape[0]
    if n < k:
        raise ValueError(f"need at least k={k} training rows, got {n}")
    centers = x[:k].copy()
    assign = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        for start in range(0, n, _CHUNK):
            block = x[start : start + _CHUNK]
            # (chunk, k): exact squared distances; the expanded ||x||²-2x·c
            # form is faster but floats differently — keep the direct form
            # so every caller computes identical assignments
            d = ((block[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign[start : start + block.shape[0]] = d.argmin(axis=1)
        for j in range(k):
            members = x[assign == j]
            if members.shape[0]:
                centers[j] = members.mean(axis=0)
    return centers
