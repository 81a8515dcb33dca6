"""Conversation-level dedup: retry/regeneration PREFIX containment.

Agent-transcript corpora duplicate at the *conversation* granularity in a
way web text does not: a client retry, a resumed session, or a
regeneration produces a conversation that is an exact PREFIX of a longer
one (same turns, same order, stopped earlier).  Document-level dedup
(`operators/relational.py`, `operators/paradedup.py`) can't see it — every
individual turn of the stub also exists in the keeper, but no whole-doc or
paragraph hash matches.  The right rule is: a conversation is a duplicate
iff its full turn sequence equals a strict prefix of another conversation
(keep the longer; the equal-length case degenerates to exact conversation
dedup, keep-first by conv_id).

Relational formulation (never all-pairs): per conversation, the ordered
per-turn content hashes ``th = md5(role ∥ US ∥ text)`` are aggregated into
one array, and every prefix ``i`` gets a hash ``md5(concat(th_1..th_i))``.
Conversation A is dominated iff some OTHER conversation B has a prefix row
with ``(hash, len) = (full_hash_A, n_turns_A)`` and ``(n_turns_B,
conv_id_B)`` beats ``(n_turns_A, conv_id_A)`` under (longer, then smaller
id).  That is ONE equi-join on the composite key ``(hash, len)`` between
the full-hash frame (one row per conversation) and the prefix frame (one
row per TURN) — O(total turns) state, high-cardinality join key, chains
(A ⊂ B ⊂ C) resolve transitively because only the maximal conversation is
never dominated.

Spark shape, audited for 10^12 turns: one ``groupBy(conv_id)`` shuffle to
assemble turn-hash arrays (the input is already conv-keyed in a real
transcript table — bucketing by conv_id makes this zero-exchange, see
`plans/bucketing.py`); prefix hashing is a map-side HOF over the array;
the domination test is one equi-join + one aggregation on (hash, len).
The deterministic keeper pick is a window over DOMINATOR rows only (a few
rows per dominated conv), not over the corpus.  Prefix hashing as written
is O(n²) bytes per conversation in turn count n (md5 of the joined
slice); at the observed mean of ~8 turns that is noise, and for
deep-conversation corpora (n ~ 10^3+) the documented swap-in is the O(n)
chained form ``p_i = md5(p_{i-1} ∥ th_i)`` via ``F.aggregate`` — same
join, different (still engine-portable) hash definition.

The fixture derivation mirrors the flagship's pure-projection keying
(__spark_entry__._transcripts_from_documents): conv/turn keys are
arithmetic on ``doc_id`` — no corpus-wide window, no skewed
low-cardinality shuffle.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "QUERIES",
    "dedup_conv_prefix",
    "q_dedup_conv_prefix",
    "_CONV_PREFIX_SQL",
    "TURNS_PER_CONV",
]

TURNS_PER_CONV = 8  # fixture keying: conv_id = doc_id // 8, turn_idx = doc_id % 8
_US = "\x1f"  # unit separator between role and text in the turn hash


def _fixture_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tablestructurerec_spark.sources.read import read_table

    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        F.floor(F.col("doc_id") / TURNS_PER_CONV).alias("conv_id"),
        (F.col("doc_id") % TURNS_PER_CONV).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        "text",
    )


def dedup_conv_prefix(turns: DataFrame) -> DataFrame:
    """``turns(conv_id, turn_idx, role, text)`` →
    ``(conv_id, n_turns, is_dup, kept_by)``: ``is_dup`` marks conversations
    whose full turn sequence is a prefix of (or equal to) another
    conversation's; ``kept_by`` is the canonical keeper (longest dominator,
    then smallest conv_id) or NULL for survivors."""
    th = F.md5(F.concat(F.col("role"), F.lit(_US), F.col("text")))
    conv = (
        turns.select("conv_id", "turn_idx", th.alias("th"))
        .groupBy("conv_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "th"))),
                lambda x: x["th"],
            ).alias("hs")
        )
        .select(
            "conv_id",
            F.size("hs").alias("n_turns"),
            F.transform(
                F.sequence(F.lit(1), F.size("hs")),
                lambda i: F.md5(F.array_join(F.slice("hs", F.lit(1), i), "")),
            ).alias("prefixes"),
        )
    )
    full = conv.select(
        "conv_id", "n_turns", F.element_at("prefixes", F.col("n_turns")).alias("h")
    )
    pref = conv.select(
        F.col("conv_id").alias("p_conv"),
        F.col("n_turns").alias("p_n"),
        F.posexplode("prefixes").alias("pos0", "h"),
    ).select("p_conv", "p_n", (F.col("pos0") + 1).alias("len"), "h")

    dominators = (
        full.join(pref, (full["h"] == pref["h"]) & (full["n_turns"] == pref["len"]))
        .where(F.col("p_conv") != F.col("conv_id"))
        .where(
            (F.col("p_n") > F.col("n_turns"))
            | ((F.col("p_n") == F.col("n_turns")) & (F.col("p_conv") < F.col("conv_id")))
        )
        .select("conv_id", "p_conv", "p_n")
    )
    w = Window.partitionBy("conv_id").orderBy(F.desc("p_n"), F.asc("p_conv"))
    keeper = (
        dominators.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("conv_id", F.col("p_conv").alias("kept_by"))
    )
    return (
        full.select("conv_id", "n_turns")
        .join(keeper, "conv_id", "left")
        .select(
            "conv_id",
            "n_turns",
            F.col("kept_by").isNotNull().alias("is_dup"),
            "kept_by",
        )
        .orderBy("conv_id")
    )


def q_dedup_conv_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_conv_prefix(_fixture_turns(spark, sf_dir))


_US_SQL = "chr(31)"

_CONV_PREFIX_SQL = f"""
WITH turns AS (
  SELECT CAST(floor(doc_id / {TURNS_PER_CONV}) AS BIGINT) AS conv_id,
         CAST(doc_id % {TURNS_PER_CONV} AS INT) AS turn_idx,
         CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         text
  FROM documents
), conv AS (
  SELECT conv_id,
         CAST(len(hs) AS INT) AS n_turns,
         list_transform(range(1, len(hs) + 1),
                        i -> md5(array_to_string(hs[1:i], ''))) AS prefixes
  FROM (
    SELECT conv_id,
           list(md5(role || {_US_SQL} || text) ORDER BY turn_idx) AS hs
    FROM turns GROUP BY conv_id
  )
), full_h AS (
  SELECT conv_id, n_turns, prefixes[n_turns] AS h FROM conv
), pref AS (
  SELECT conv_id AS p_conv, n_turns AS p_n,
         generate_subscripts(prefixes, 1) AS len, unnest(prefixes) AS h
  FROM conv
), keeper AS (
  SELECT conv_id, p_conv AS kept_by
  FROM (
    SELECT f.conv_id, p.p_conv,
           row_number() OVER (PARTITION BY f.conv_id
                              ORDER BY p.p_n DESC, p.p_conv ASC) AS rn
    FROM full_h f
    JOIN pref p ON f.h = p.h AND f.n_turns = p.len
    WHERE p.p_conv <> f.conv_id
      AND (p.p_n > f.n_turns OR (p.p_n = f.n_turns AND p.p_conv < f.conv_id))
  ) WHERE rn = 1
)
SELECT f.conv_id, f.n_turns,
       k.kept_by IS NOT NULL AS is_dup,
       k.kept_by
FROM full_h f LEFT JOIN keeper k ON f.conv_id = k.conv_id
ORDER BY f.conv_id
"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_dedup_conv_prefix": q_dedup_conv_prefix,
}
