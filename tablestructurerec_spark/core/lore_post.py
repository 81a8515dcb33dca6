"""LORE logical-coordinate postprocess (snap + non-standard rounding).

Contract (ref lineless_table_rec/table_structure_lore.py:78-92): per cell,
row bounds closer than 0.2 collapse to their mean (likewise column bounds);
then values round as ``floor(x) + (frac(x) > 0.5)`` — ties at exactly .5
round DOWN, unlike ``np.round``.  Reproduced bit-exactly; runs vectorized
inside the inference UDF.
"""

from __future__ import annotations

import numpy as np

__all__ = ["snap_and_round_logic"]


def snap_and_round_logic(raw_logic: np.ndarray) -> np.ndarray:
    """(N, 4) float ``[row_start, row_end, col_start, col_end]`` → int32."""
    vals = np.asarray(raw_logic, dtype=np.float64).copy()
    if vals.size:
        row_close = np.abs(vals[:, 0] - vals[:, 1]) < 0.2
        row_mean = (vals[:, 0] + vals[:, 1]) / 2
        vals[row_close, 0] = row_mean[row_close]
        vals[row_close, 1] = row_mean[row_close]
        col_close = np.abs(vals[:, 2] - vals[:, 3]) < 0.2
        col_mean = (vals[:, 2] + vals[:, 3]) / 2
        vals[col_close, 2] = col_mean[col_close]
        vals[col_close, 3] = col_mean[col_close]
    low = np.floor(vals)
    return np.where(vals - low > 0.5, low + 1, low).astype(np.int32)
