"""Direct kernel checks for the hygiene run-length aggregates: the Spark
expressions must equal a Python Counter ground truth on random inputs
(the DuckDB oracle checks end-to-end equality; this isolates the kernels)."""

import random
from collections import Counter

from pyspark.sql import functions as F

from tablestructurerec_spark.operators.hygiene import _dup_run_chars, _occurrence_max


def _truth_occurrence_max(arr):
    return max(Counter(arr).values()) if arr else 0


def _truth_dup_chars(arr):
    return sum(c * len(s) for s, c in Counter(arr).items() if c > 1)


def test_run_length_kernels_match_counter_truth(spark):
    rng = random.Random(20260817)
    vocab = ["a", "bb", "ccc", "dddd", "e", "ff f", ""]  # incl. empty string
    rows = []
    for i in range(300):
        n = rng.randrange(0, 30)
        rows.append((i, [rng.choice(vocab) for _ in range(n)]))
    df = spark.createDataFrame(rows, "id long, arr array<string>")
    got = {
        r.id: (r.occ, r.dup)
        for r in df.select(
            "id",
            _occurrence_max(F.col("arr")).alias("occ"),
            _dup_run_chars(F.array_sort("arr")).alias("dup"),
        ).collect()
    }
    for i, arr in rows:
        assert got[i][0] == _truth_occurrence_max(arr), (i, arr)
        assert got[i][1] == _truth_dup_chars(arr), (i, arr)
