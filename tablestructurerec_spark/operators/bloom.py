"""Bloom-filter prefilter for incremental dedup — the probabilistic prune
a 100 TB ingest pipeline runs BEFORE the expensive banded index join.

``q_dedup_incremental`` joins every (band, bucket) key of the new batch
against the persisted MinHash index.  At real scale the overwhelming
majority of crawl-increment documents are novel — none of their buckets
exist in the index — yet the equi-join still has to move every new key to
its bucket's partition to discover that.  A Bloom filter built over the
index's keys answers "definitely absent" without the join: documents whose
every band-bucket is Bloom-negative are provably match-free (a Bloom
filter has NO false negatives), so only the Bloom-positive sliver proceeds
to the real join.

Spark shape, audited for 100 TB:

* the filter is a RELATIONAL table, not a driver-side byte blob:
  ``(block, bits)`` rows where ``block = position >> 5`` and ``bits`` is
  the bit_or of 32-bit word masks.  A production-sized filter (2^33 bits
  = 256M words for ~1B keys at 1% fp) is just another dimension table —
  AQE broadcasts it while it is small and shuffles the equi-join on
  ``block`` when it is not; nothing funnels through the driver;
* the build is one explode(k)→groupBy(block) partial-agg shuffle of
  integer pairs; ``bit_or`` is idempotent, so duplicate keys need no
  pre-``distinct`` (OR-ing the same mask twice is a no-op);
* membership is a LEFT join on ``block`` (missing block ⇔ all-zero word
  ⇔ definitely absent) + ``bool_and`` over the k probe bits, then
  ``bool_or`` over the document's bands — new docs, the common case,
  short-circuit to ``candidate = false`` and never reach the index join;
* every position is integer arithmetic over md5 hex — both engines
  compute identical bits, so the DuckDB oracle is value-exact.  Word
  size is 32 bits deliberately: masks stay in non-negative BIGINT range
  in both engines (DuckDB raises on ``1::BIGINT << 63``).

Composition contract (pinned in tests/test_bloom.py): every
``new_doc`` that ``q_dedup_incremental`` reports MUST be ``candidate``
here — zero false negatives is the mathematical property that makes the
prune sound; the false-positive rate is a tunable cost knob (m, k).
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tablestructurerec_spark.operators.dedup import (
    _BAND_ROWS,
    _INCR_MOD,
    _INCR_REM,
    _N_HASHES,
    _banded_cte,
    _banded_docs,
    _hv_docs,
)

__all__ = ["QUERIES", "q_dedup_bloom_prefilter", "_BLOOM_SQL", "bloom_sql"]

_M_BITS = 1 << 16  # filter size in bits
_K = 4  # probes per key


def _key(band: Column, bucket: Column) -> Column:
    return F.concat(band.cast("string"), F.lit(":"), bucket)


def _pos(key: Column, j: int, m_bits: int) -> Column:
    salted = F.md5(F.concat(key, F.lit(f"#{j}")))
    return (
        F.conv(F.substring(salted, 1, 15), 16, 10).cast("long") % F.lit(m_bits)
    )


def _bloom_blocks(keys: DataFrame, m_bits: int, k: int) -> DataFrame:
    """(block, bits) 32-bit-word Bloom filter over ``keys.key``."""
    pos = keys.select(
        F.explode(F.array(*[_pos(F.col("key"), j, m_bits) for j in range(k)])).alias(
            "pos"
        )
    )
    return (
        pos.select(
            F.shiftright("pos", 5).alias("block"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("block")
        .agg(F.bit_or("mask").alias("bits"))
    )


def q_dedup_bloom_prefilter(
    spark: SparkSession,
    sf_dir: str,
    m_bits: int = _M_BITS,
    k: int = _K,
) -> DataFrame:
    """Per-new-doc prune report ``(doc_id, candidate, has_match)``:
    ``candidate`` = some band-bucket of the doc is Bloom-positive against
    the index (the doc must proceed to the real join), ``has_match`` = the
    real join would actually find an index collision (ground truth;
    ``has_match → candidate`` always — no false negatives)."""
    hv = _hv_docs(spark, sf_dir)
    is_new = (F.col("doc_id") % _INCR_MOD) == _INCR_REM
    idx_b = _banded_docs(hv.where(~is_new), _N_HASHES, _BAND_ROWS)
    new_b = _banded_docs(hv.where(is_new), _N_HASHES, _BAND_ROWS)

    blocks = _bloom_blocks(
        idx_b.select(_key(F.col("band"), F.col("bucket")).alias("key")), m_bits, k
    )

    probes = new_b.select(
        "doc_id",
        "band",
        "bucket",
        F.posexplode(
            F.array(
                *[_pos(_key(F.col("band"), F.col("bucket")), j, m_bits) for j in range(k)]
            )
        ).alias("j", "pos"),
    ).select(
        "doc_id",
        "band",
        "bucket",
        F.shiftright("pos", 5).alias("block"),
        F.col("pos").bitwiseAND(F.lit(31)).cast("int").alias("bitpos"),
    )
    member = (
        probes.join(blocks, "block", "left")
        .groupBy("doc_id", "band", "bucket")
        .agg(
            F.bool_and(
                F.coalesce(
                    F.expr("(shiftright(bits, bitpos) & 1) = 1"), F.lit(False)
                )
            ).alias("hit")
        )
        .groupBy("doc_id")
        .agg(F.bool_or("hit").alias("candidate"))
    )

    truth = (
        new_b.alias("n")
        .join(
            idx_b.alias("i"),
            (F.col("n.band") == F.col("i.band"))
            & (F.col("n.bucket") == F.col("i.bucket")),
            "left_semi",
        )
        .select("doc_id")
        .distinct()
        .withColumn("has_match", F.lit(True))
    )
    return (
        member.join(truth, "doc_id", "left")
        .select(
            "doc_id",
            "candidate",
            F.coalesce("has_match", F.lit(False)).alias("has_match"),
        )
        .orderBy("doc_id")
    )


def bloom_sql(m_bits: int = _M_BITS, k: int = _K) -> str:
    js = ", ".join(str(j) for j in range(k))
    pos = (
        "('0x' || substr(md5(key || '#' || CAST(j AS VARCHAR)), 1, 15))::BIGINT"
        f" % {m_bits}"
    )
    return f"""
{_banded_cte()}
, idx_keys AS (
  SELECT CAST(band AS VARCHAR) || ':' || bucket AS key
  FROM banded WHERE doc_id % {_INCR_MOD} <> {_INCR_REM}
), blocks AS (
  SELECT pos >> 5 AS block,
         bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
  FROM (SELECT {pos} AS pos
        FROM idx_keys CROSS JOIN (SELECT unnest([{js}]) AS j))
  GROUP BY 1
), probes AS (
  SELECT doc_id, band, bucket,
         {pos.replace("key", "(CAST(band AS VARCHAR) || ':' || bucket)")} AS pos
  FROM banded CROSS JOIN (SELECT unnest([{js}]) AS j)
  WHERE doc_id % {_INCR_MOD} = {_INCR_REM}
), member AS (
  SELECT doc_id, bool_or(hit) AS candidate FROM (
    SELECT doc_id, band, bucket,
           bool_and(coalesce((b.bits >> CAST(p.pos % 32 AS INT)) & 1, 0) = 1) AS hit
    FROM probes p LEFT JOIN blocks b ON (p.pos >> 5) = b.block
    GROUP BY doc_id, band, bucket)
  GROUP BY doc_id
), truth AS (
  SELECT DISTINCT y.doc_id
  FROM banded y JOIN banded x ON y.band = x.band AND y.bucket = x.bucket
  WHERE y.doc_id % {_INCR_MOD} = {_INCR_REM}
    AND x.doc_id % {_INCR_MOD} <> {_INCR_REM}
)
SELECT m.doc_id, m.candidate, (t.doc_id IS NOT NULL) AS has_match
FROM member m LEFT JOIN truth t ON m.doc_id = t.doc_id
ORDER BY m.doc_id
"""


_BLOOM_SQL = bloom_sql()


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_dedup_bloom_prefilter": q_dedup_bloom_prefilter,
}
