"""The reliable-checkpoint variant of dedup_components is result-identical.

At 100 TB the iterative label propagation must truncate lineage through
reliable checkpoint storage (executor loss mid-iteration costs a re-read,
not the job); locally both paths must produce the same components.
"""

from tablestructurerec_spark.operators.dedup import q_dedup_components

SF = "/root/testdata/sf0.001"


def test_reliable_checkpoint_matches_local(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    base = [tuple(r) for r in q_dedup_components(spark, SF).collect()]
    reliable = [
        tuple(r)
        for r in q_dedup_components(spark, SF, reliable_checkpoint=True).collect()
    ]
    assert base == reliable and len(base) > 0
