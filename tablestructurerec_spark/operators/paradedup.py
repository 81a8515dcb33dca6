"""Paragraph-level exact deduplication (Dolma-style) — the granularity
between whole-document exact dedup (`operators/relational.py
q_dedup_exact`) and substring-span dedup (`operators/hygiene.py` Lee et
al. windows): crawl corpora repeat whole *paragraphs* (navigation blurbs,
cookie banners, licence footers) across millions of otherwise-distinct
pages, and removing the paragraph — not the page, not an arbitrary
50-token window — is the cheapest transform that kills the repetition
without collateral damage.

Semantics (keep-first, corpus-global):

* paragraphs = ``split(text, '\\n\\n', -1)`` — the ``-1`` limit keeps
  trailing empties so Spark matches DuckDB's ``string_split`` exactly and
  the rebuild round-trips byte-for-byte on untouched documents;
* a paragraph instance survives iff it is the FIRST occurrence of its
  exact text in corpus order ``(doc_id, para_idx)``, OR it is *short*
  (``length(trim(para)) < min_len``, default 15) — the standard
  exemption: headers, list bullets and blank paragraphs repeat naturally
  and carry no memorization risk.  The exemption doubles as skew
  armour: the natural hot keys of this dedup (empty string, ``"* "``,
  boilerplate one-liners) never enter the window shuffle at all;
* each document is rebuilt from its surviving paragraphs in original
  order, joined with ``'\\n\\n'`` — a document with no duplicated
  paragraphs rebuilds byte-identical.

Spark shape, audited for 100 TB: posexplode is map-side; the keep-first
decision is ONE ``row_number`` window shuffled on the paragraph text
itself (exact — no hash-collision caveat), with the short-paragraph
population routed AROUND the shuffle via the exemption predicate (they
skip the window entirely through a union, so the shuffle carries only
dedup candidates); the rebuild is one groupBy(doc_id) aggregation with
partial map-side combine on the counts.  Two shuffles total, both on
high-cardinality keys, no window funnels to a single task because the
partition key is the paragraph text (millions of distinct values).
Residual skew (one paragraph repeated 10^8 times — a true boilerplate
epidemic) is bounded because only ``(doc_id, para_idx)`` rank-1 survives:
AQE skew-join/agg splitting applies, and `operators/hygiene.py`'s
boilerplate miner is the right tool to FIND such paragraphs first.

Reference anchor: the reference strips boilerplate around detected tables
per-document (`lineless_table_rec/main.py` pre-clean); corpus-global
paragraph dedup is the training-data generalization of that step.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["QUERIES", "q_dedup_paragraphs", "_PARA_DEDUP_SQL", "MIN_LEN"]

MIN_LEN = 15  # trimmed chars below which a paragraph is dedup-exempt
_SEP = "\n\n"


def q_dedup_paragraphs(
    spark: SparkSession, sf_dir: str, min_len: int = MIN_LEN
) -> DataFrame:
    """Per-document ``(doc_id, n_paras, n_dropped, clean_text)``:
    ``clean_text`` is the document rebuilt from paragraphs surviving the
    corpus-global keep-first rule; ``n_dropped`` counts removed duplicate
    paragraphs (0 ⇒ ``clean_text`` is byte-identical to ``text``)."""
    from tablestructurerec_spark.sources.read import read_table

    docs = read_table(spark, sf_dir, "documents")
    paras = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), _SEP, -1)).alias("idx", "para"),
    )
    exempt = F.length(F.trim(F.col("para"))) < F.lit(min_len)

    # route the short/hot population around the shuffle entirely
    short = paras.where(exempt).select("doc_id", "idx", "para")
    cand = paras.where(~exempt)
    w = Window.partitionBy("para").orderBy("doc_id", "idx")
    kept_cand = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "idx", "para")
    )
    kept = short.unionByName(kept_cand)

    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "para"))),
                lambda x: x["para"],
            ),
            _SEP,
        ).alias("clean_text"),
    )
    totals = paras.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_paras"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_paras").cast("int").alias("n_paras"),
            (F.col("n_paras") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("int")
            .alias("n_dropped"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


_SEP_SQL = "chr(10) || chr(10)"

_PARA_DEDUP_SQL = f"""
WITH paras AS (
  SELECT doc_id,
         generate_subscripts(a, 1) - 1 AS idx,
         unnest(a) AS para
  FROM (SELECT doc_id, string_split(text, {_SEP_SQL}) AS a FROM documents)
), kept AS (
  SELECT doc_id, idx, para FROM paras WHERE length(trim(para)) < {MIN_LEN}
  UNION ALL
  SELECT doc_id, idx, para FROM (
    SELECT doc_id, idx, para,
           row_number() OVER (PARTITION BY para ORDER BY doc_id, idx) AS rn
    FROM paras WHERE length(trim(para)) >= {MIN_LEN}
  ) WHERE rn = 1
), rebuilt AS (
  SELECT doc_id,
         count(*) AS n_kept,
         string_agg(para, {_SEP_SQL} ORDER BY idx) AS clean_text
  FROM kept GROUP BY doc_id
), totals AS (
  SELECT doc_id, count(*) AS n_paras FROM paras GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(t.n_paras AS INT) AS n_paras,
       CAST(t.n_paras - coalesce(r.n_kept, 0) AS INT) AS n_dropped,
       coalesce(r.clean_text, '') AS clean_text
FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
ORDER BY t.doc_id
"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_dedup_paragraphs": q_dedup_paragraphs,
}
