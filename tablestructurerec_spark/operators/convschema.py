"""Conversation-schema operators — the transcript-native hygiene passes an
RLHF / agent-trace pipeline runs before training on multi-turn data.

Two operators over ``(conv_id, turn_idx, role, text)``:

* **q_role_sequence_audit** — chat-ML schema validation per conversation:
  bad opening role (must be system/user), adjacent same-role turns
  (user→user, assistant→assistant), tool results not preceded by an
  assistant/tool turn, and conversations left dangling on a user/tool turn.
  One ``lag(role)`` window partitioned by conv_id feeds a groupBy on the
  SAME key, so Catalyst plans a SINGLE exchange for the whole audit
  (plan-pinned): window sort and aggregation share the conv_id
  partitioning.  At 10^12 turns the Zipf-hot conversations cost one task's
  sort each (the skew audit's salt_factor measures exactly this frame).

* **q_conv_suffix_pack** — context-window packing: keep the longest SUFFIX
  of each conversation whose token total fits ``TOKEN_BUDGET`` (the
  standard truncate-from-the-left rule for multi-turn training examples).
  A reverse cumulative sum (descending turn_idx window, same single
  conv_id exchange) marks kept turns; no self-join, no per-conv collect.

The q_ wrappers derive a deterministic transcript view from ``documents``
(conv/turn/role as pure md5-based projections — the
``_transcripts_from_documents`` precedent in ``__spark_entry__``), so both
operators carry full DuckDB value-exact oracles.  Standalone operators with
pytest parity (the driver registry sits at its 50-row cap).
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tablestructurerec_spark.operators.textstats import tokens_col, tokens_sql

__all__ = [
    "QUERIES",
    "q_role_sequence_audit",
    "q_conv_suffix_pack",
    "q_conv_audit",
    "role_sequence_audit",
    "conv_suffix_pack",
    "role_audit_sql",
    "suffix_pack_sql",
    "conv_audit_sql",
    "q_pack_efficiency",
    "pack_efficiency",
    "pack_efficiency_sql",
    "TOKEN_BUDGET",
    "ROLES",
]

TOKEN_BUDGET = 160
ROLES = ["system", "user", "assistant", "tool"]
_TURNS_PER_CONV = 5


def _conv_view(docs: DataFrame) -> DataFrame:
    """Deterministic transcript projection of documents: contiguous
    (conv_id, turn_idx) plus an md5-derived role — identical in DuckDB."""
    role_ix = F.expr("CAST(conv('0' || substring(md5(concat('role:', CAST(doc_id AS STRING))), 1, 2), 16, 10) AS INT) % 4")
    return docs.select(
        F.expr(f"CAST(doc_id DIV {_TURNS_PER_CONV} AS BIGINT)").alias("conv_id"),
        F.expr(f"CAST(doc_id % {_TURNS_PER_CONV} AS INT)").alias("turn_idx"),
        F.element_at(F.array(*[F.lit(r) for r in ROLES]), role_ix + 1).alias("role"),
        "text",
    )


_CONV_VIEW_SQL = f"""
  SELECT CAST(doc_id // {_TURNS_PER_CONV} AS BIGINT) AS conv_id,
         CAST(doc_id % {_TURNS_PER_CONV} AS INT) AS turn_idx,
         (['system', 'user', 'assistant', 'tool'])[
             (('0x' || substr(md5('role:' || CAST(doc_id AS VARCHAR)), 1, 2))::INT % 4) + 1
         ] AS role,
         text
  FROM documents
"""


def q_role_sequence_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tablestructurerec_spark.sources.read import read_table

    return role_sequence_audit(_conv_view(read_table(spark, sf_dir, "documents")))


def role_sequence_audit(turns: DataFrame) -> DataFrame:
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    flagged = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        F.lag("role").over(w).alias("prev_role"),
        F.row_number().over(w).alias("rn"),
    )
    first_bad = F.when(
        (F.col("rn") == 1) & (~F.col("role").isin("system", "user")), 1
    )
    # tool→tool chains are legitimate (multiple results for one assistant
    # call); same-role adjacency is a violation only for non-tool roles
    same_adj = F.when(
        F.col("prev_role").isNotNull()
        & (F.col("role") == F.col("prev_role"))
        & (F.col("role") != "tool"),
        1,
    )
    tool_bad = F.when(
        (F.col("role") == "tool")
        & (
            F.col("prev_role").isNull()
            | (~F.col("prev_role").isin("assistant", "tool"))
        ),
        1,
    )
    agg = flagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.count(first_bad).cast("int").alias("bad_start"),
        F.count(same_adj).cast("int").alias("n_same_role_adjacent"),
        F.count(tool_bad).cast("int").alias("n_bad_tool"),
        F.max_by("role", "turn_idx").alias("last_role"),
    )
    return (
        agg.select(
            "conv_id",
            "n_turns",
            "bad_start",
            "n_same_role_adjacent",
            "n_bad_tool",
            F.when(F.col("last_role").isin("user", "tool"), 1)
            .otherwise(0)
            .cast("int")
            .alias("dangling_last"),
            (
                (F.col("bad_start") == 0)
                & (F.col("n_same_role_adjacent") == 0)
                & (F.col("n_bad_tool") == 0)
                & (~F.col("last_role").isin("user", "tool"))
            ).alias("is_valid"),
        )
        .orderBy("conv_id")
    )


def role_audit_sql() -> str:
    """DuckDB twin of :func:`q_role_sequence_audit` — value-exact."""
    return f"""
WITH turns AS ({_CONV_VIEW_SQL}),
flagged AS (
  SELECT conv_id, turn_idx, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM turns
),
agg AS (
  SELECT conv_id,
         count(*) AS n_turns,
         CAST(count(CASE WHEN rn = 1 AND role NOT IN ('system', 'user') THEN 1 END) AS INT) AS bad_start,
         CAST(count(CASE WHEN prev_role IS NOT NULL AND role = prev_role AND role <> 'tool' THEN 1 END) AS INT) AS n_same_role_adjacent,
         CAST(count(CASE WHEN role = 'tool' AND (prev_role IS NULL OR prev_role NOT IN ('assistant', 'tool')) THEN 1 END) AS INT) AS n_bad_tool,
         max_by(role, turn_idx) AS last_role
  FROM flagged GROUP BY conv_id
)
SELECT conv_id, n_turns, bad_start, n_same_role_adjacent, n_bad_tool,
       CAST(CASE WHEN last_role IN ('user', 'tool') THEN 1 ELSE 0 END AS INT) AS dangling_last,
       (bad_start = 0 AND n_same_role_adjacent = 0 AND n_bad_tool = 0
        AND last_role NOT IN ('user', 'tool')) AS is_valid
FROM agg
ORDER BY conv_id
"""


def q_conv_suffix_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tablestructurerec_spark.sources.read import read_table

    return conv_suffix_pack(_conv_view(read_table(spark, sf_dir, "documents")))


def conv_suffix_pack(turns: DataFrame, budget: int = TOKEN_BUDGET) -> DataFrame:
    """Longest per-conversation suffix under the token budget (left
    truncation).  A turn is kept iff the token total from it to the END of
    the conversation fits."""
    w_rev = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = turns.select(
        "conv_id",
        "turn_idx",
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tok"),
    ).withColumn("cum_from_end", F.sum("n_tok").over(w_rev))
    return scored.select(
        "conv_id",
        "turn_idx",
        "n_tok",
        "cum_from_end",
        (F.col("cum_from_end") <= budget).alias("kept"),
    ).orderBy("conv_id", "turn_idx")


def suffix_pack_sql(budget: int = TOKEN_BUDGET) -> str:
    """DuckDB twin of :func:`q_conv_suffix_pack` — value-exact."""
    return f"""
WITH turns AS ({_CONV_VIEW_SQL}),
scored AS (
  SELECT conv_id, turn_idx,
         CAST(len({tokens_sql()}) AS BIGINT) AS n_tok
  FROM turns
)
SELECT conv_id, turn_idx, n_tok,
       sum(n_tok) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_from_end,
       sum(n_tok) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= {budget} AS kept
FROM scored
ORDER BY conv_id, turn_idx
"""


def q_conv_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUSED per-conversation row registered with the driver (the
    ``t_text_profile`` consolidation pattern — VERDICT r3 #6): the
    role-sequence audit columns joined to the suffix-pack summary, so ONE
    green driver row certifies both operators.  Both sides are the
    modules' own query functions over the SAME ``_conv_view`` — nothing
    re-implemented, nothing to drift; the oracle composes
    :func:`role_audit_sql` and :func:`suffix_pack_sql` verbatim."""
    audit = q_role_sequence_audit(spark, sf_dir)
    pack = (
        q_conv_suffix_pack(spark, sf_dir)
        .groupBy("conv_id")
        .agg(
            F.sum("n_tok").alias("total_tokens"),
            F.sum(F.when(F.col("kept"), F.col("n_tok")).otherwise(F.lit(0)))
            .alias("kept_tokens"),
            F.count(F.when(F.col("kept"), F.lit(1))).cast("int").alias(
                "kept_turns"
            ),
        )
    )
    return audit.join(pack, "conv_id").orderBy("conv_id")


def conv_audit_sql() -> str:
    """Composed DuckDB oracle — the two constituents' SQL, joined."""
    return f"""
WITH audit AS ({role_audit_sql()}),
pack AS (
  SELECT conv_id,
         CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens,
         CAST(count(CASE WHEN kept THEN 1 END) AS INT) AS kept_turns
  FROM ({suffix_pack_sql()}) GROUP BY conv_id
)
SELECT a.*, p.total_tokens, p.kept_tokens, p.kept_turns
FROM audit a JOIN pack p USING (conv_id)
ORDER BY conv_id
"""


def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tablestructurerec_spark.sources.read import read_table

    return pack_efficiency(_conv_view(read_table(spark, sf_dir, "documents")))


def pack_efficiency(turns: DataFrame, budget: int = TOKEN_BUDGET) -> DataFrame:
    """Context-window FILL-RATE report over the suffix packer — the metric
    a training team actually tracks: every example whose kept suffix fills
    only half the window wastes half the step's FLOPs, and every truncated
    conversation loses left context.

    Per conversation (riding the packer's own kept flags, so the report
    cannot disagree with what the packer ships): ``used`` = kept tokens,
    ``waste = budget - used``, ``dropped`` = truncated-away tokens.  The
    corpus report buckets conversations by fill DECILE
    (``used*1e6 DIV budget DIV 1e5``, all-integer) — bounded 11-row
    output.  Shuffle shape: the conv-grain aggregation reuses the packer
    window's conv_id partitioning (subset-key rule), the decile rollup is
    a bounded second exchange."""
    packed = conv_suffix_pack(turns, budget=budget)
    per_conv = packed.groupBy("conv_id").agg(
        F.sum(F.when(F.col("kept"), F.col("n_tok")).otherwise(F.lit(0)))
        .cast("long")
        .alias("used"),
        F.sum(F.when(~F.col("kept"), F.col("n_tok")).otherwise(F.lit(0)))
        .cast("long")
        .alias("dropped"),
        F.count(F.when(~F.col("kept"), 1)).cast("long").alias("n_cut_turns"),
    )
    return (
        per_conv.select(
            F.expr(f"used * 1000000 DIV {budget} DIV 100000").alias("fill_decile"),
            "used",
            F.expr(f"{budget} - used").alias("waste"),
            "dropped",
            (F.col("n_cut_turns") > 0).alias("truncated"),
        )
        .groupBy("fill_decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_convs"),
            F.sum("used").cast("long").alias("total_used_tok"),
            F.sum("waste").cast("long").alias("total_waste_tok"),
            F.sum("dropped").cast("long").alias("total_dropped_tok"),
            F.count(F.when(F.col("truncated"), 1)).cast("long").alias("n_truncated"),
        )
        .orderBy("fill_decile")
    )


def pack_efficiency_sql(budget: int = TOKEN_BUDGET) -> str:
    """DuckDB twin of :func:`q_pack_efficiency` — value-exact (reuses the
    suffix-pack SQL so the report and the packer cannot drift)."""
    return f"""
WITH packed AS ({suffix_pack_sql(budget).replace("ORDER BY conv_id, turn_idx", "")}),
per_conv AS (
  SELECT conv_id,
         SUM(CASE WHEN kept THEN n_tok ELSE 0 END)::BIGINT AS used,
         SUM(CASE WHEN NOT kept THEN n_tok ELSE 0 END)::BIGINT AS dropped,
         COUNT(*) FILTER (WHERE NOT kept)::BIGINT AS n_cut_turns
  FROM packed GROUP BY conv_id
)
SELECT (used * 1000000 // {budget}) // 100000 AS fill_decile,
       COUNT(*)::BIGINT AS n_convs,
       SUM(used)::BIGINT AS total_used_tok,
       SUM({budget} - used)::BIGINT AS total_waste_tok,
       SUM(dropped)::BIGINT AS total_dropped_tok,
       COUNT(*) FILTER (WHERE n_cut_turns > 0)::BIGINT AS n_truncated
FROM per_conv GROUP BY fill_decile ORDER BY fill_decile
"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_role_sequence_audit": q_role_sequence_audit,
    "t_conv_suffix_pack": q_conv_suffix_pack,
    "t_conv_audit": q_conv_audit,
    "t_pack_efficiency": q_pack_efficiency,
}
