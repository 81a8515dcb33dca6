"""Sequence-packing invariants beyond the exact-match oracle."""

from collections import defaultdict

from pyspark.sql import functions as F

from tablestructurerec_spark.operators.sampling import (
    _PACK_BUDGET,
    q_pack_sequences,
)

SF_DIR = "/root/testdata/sf0.001"


def test_packing_invariants(spark):
    rows = q_pack_sequences(spark, SF_DIR).collect()
    assert rows
    fills: dict = defaultdict(int)
    docs_in_bin: dict = defaultdict(int)
    for r in rows:
        fills[(r.shard, r.bin_idx)] += r.n_tokens
        docs_in_bin[(r.shard, r.bin_idx)] += 1
    # a bin only exceeds the budget when a single oversized doc owns it
    for k, fill in fills.items():
        assert fill <= _PACK_BUDGET or docs_in_bin[k] == 1, (k, fill)
    # bins are contiguous 0..max per shard (no gaps — the greedy fold never
    # skips an index)
    per_shard = defaultdict(set)
    for shard, b in fills:
        per_shard[shard].add(b)
    for shard, bins in per_shard.items():
        assert bins == set(range(max(bins) + 1)), (shard, sorted(bins))


def test_packing_is_deterministic_and_shard_parallel(spark):
    a = q_pack_sequences(spark, SF_DIR).collect()
    b = q_pack_sequences(spark, SF_DIR).collect()
    assert a == b
    # the only wide stage is the shard shuffle feeding applyInPandas: the
    # exchange carries (doc_id, shard, n_tokens) — never text
    plan = q_pack_sequences(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "text" not in plan.split("Exchange hashpartitioning")[1].split("\n")[0]
