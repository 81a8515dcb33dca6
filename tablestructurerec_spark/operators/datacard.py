"""Per-source data card — the one-page summary a dataset release ships
with (Gebru et al. 2021 "Datasheets for Datasets"): volume, token mass,
length distribution, language mix, and exact-duplicate rate per source,
in a single bounded table.

Two aggregation legs over one logical scan each:

* **profile leg** — ``groupBy(source)`` over staged per-doc token counts:
  docs, token/char mass, exact median tokens (type-7 ``percentile``,
  bit-identical to DuckDB's ``quantile_cont`` on small ints), English
  share, distinct languages.
* **duplication leg** — ``groupBy(source, md5(text))`` then per-source:
  ``dup_rate = Σ(class_size − 1) / n_docs`` — the fraction of rows exact
  dedup would remove.

Both legs partial-aggregate map-side; the final join is between two
per-source frames (bounded by the source count, AQE broadcasts).  Ratios
are rounded to 6dp before output (repo-wide hash-exactness discipline),
so the operator carries a full value-exact DuckDB oracle (standalone; the
driver registry sits at its 50-row cap).
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tablestructurerec_spark.operators.textstats import tokens_col, tokens_sql

__all__ = ["QUERIES", "q_data_card", "_DATACARD_SQL"]


def q_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per source: volume, length, language, duplication."""
    from tablestructurerec_spark.sources.read import read_table

    docs = read_table(spark, sf_dir, "documents")
    staged = docs.select(
        "source",
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tok"),
        F.md5("text").alias("h"),
    )
    prof = staged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.percentile("n_tok", F.lit(0.5)), 6).alias("median_tokens"),
        F.round(
            F.sum((F.col("lang") == "en").cast("long")) * 1.0 / F.count(F.lit(1)),
            6,
        ).alias("en_share"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )
    dup = (
        staged.groupBy("source", "h")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source")
        .agg(
            F.round(
                F.sum(F.col("c") - 1) * 1.0 / F.sum("c"), 6
            ).alias("exact_dup_rate")
        )
    )
    return (
        prof.join(dup, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "total_chars",
            "median_tokens",
            "en_share",
            "n_langs",
            "exact_dup_rate",
        )
        .orderBy("source")
    )


_DATACARD_SQL = f"""
WITH staged AS (
  SELECT source, lang,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len({tokens_sql()}) AS BIGINT) AS n_tok,
         md5(text) AS h
  FROM documents
), prof AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         ROUND(quantile_cont(n_tok, 0.5), 6) AS median_tokens,
         ROUND(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
           AS en_share,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
  FROM staged GROUP BY source
), dup AS (
  SELECT source, ROUND(sum(c - 1) * 1.0 / sum(c), 6) AS exact_dup_rate
  FROM (SELECT source, h, count(*) AS c FROM staged GROUP BY source, h)
  GROUP BY source
)
SELECT prof.*, dup.exact_dup_rate
FROM prof JOIN dup USING (source)
ORDER BY source
"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_data_card": q_data_card,
}
