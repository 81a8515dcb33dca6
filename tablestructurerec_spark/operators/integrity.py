"""Fused character-integrity profile row — THREE text-integrity operators,
one driver-certified result (round-5 registry rotation #2; per-doc
``t_text_profile`` join pattern).

The byte-level health of a corpus — which scripts a document is written
in, whether its Unicode is normal-form, and whether its declared language
matches its dominant script — gates everything downstream (tokenizers,
language routing, dedup keys).  The three operators here each carry
their own value-exact DuckDB oracle and pytest (``charprofile`` /
``normalize`` / ``langscript``) but none has ever held a row in the
driver's capped 50-row registry.  This module joins them into one row
per document:

* the full per-doc script/character profile (``charprofile``),
* the normalization audit columns ``nfc_changed`` + ``norm_md5``
  (``normalize`` — the md5 pins the cleanup+NFC kernel byte-exactly
  without shipping ``clean_text`` itself through the compare),
* the language↔script consistency verdict joined back per doc on
  ``(lang, dominant_script)`` (``langscript`` — its aggregate n_docs and
  the expected-script map surface as per-doc columns, LEFT-joined so a
  null ``lang`` keeps the row with a null verdict in both engines).

Nothing is re-implemented: Spark calls the home modules' query
functions; the oracle composes ``_CHARPROFILE_SQL`` / ``_NORMALIZE_SQL``
/ ``langscript_sql()`` verbatim as CTEs.  Scale shape inherited: three
scan-shaped per-doc passes plus one broadcast-sized ``(lang,
dominant_script)`` frame; the doc_id equi-joins are the only new edges.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tablestructurerec_spark.operators.charprofile import (
    _CHARPROFILE_SQL,
    SCRIPT_CLASSES,
    q_char_profile,
)
from tablestructurerec_spark.operators.langscript import (
    langscript_sql,
    q_lang_script_consistency,
)
from tablestructurerec_spark.operators.normalize import (
    _NORMALIZE_SQL,
    q_normalize_text,
)

__all__ = ["QUERIES", "q_char_integrity", "char_integrity_sql"]

_SCRIPT_COLS = [f"n_{name}" for name, _ in SCRIPT_CLASSES]


def q_char_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per document: the char profile + normalization audit +
    per-doc language/script consistency verdict."""
    from tablestructurerec_spark.sources.read import read_table

    cp = q_char_profile(spark, sf_dir)
    nz = q_normalize_text(spark, sf_dir).select("doc_id", "nfc_changed", "norm_md5")
    ls = q_lang_script_consistency(spark, sf_dir).select(
        "lang",
        F.col("dominant_script").alias("ls_dom"),
        F.col("n_docs").alias("script_group_docs"),
        "expected_script",
        "is_consistent",
    )
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        cp.join(nz, "doc_id")
        .join(docs, "doc_id")
        .join(
            ls,
            (docs["lang"] == ls["lang"]) & (cp["dominant_script"] == ls["ls_dom"]),
            "left",
        )
        .select(
            "doc_id",
            docs["lang"].alias("lang"),
            "n_chars",
            *_SCRIPT_COLS,
            "n_digit",
            "n_ws",
            "non_ascii_frac",
            cp["dominant_script"].alias("dominant_script"),
            "nfc_changed",
            "norm_md5",
            "script_group_docs",
            "expected_script",
            "is_consistent",
        )
        .orderBy("doc_id")
    )


def char_integrity_sql() -> str:
    """DuckDB twin — the three home-module oracle strings composed
    verbatim as CTEs, joined with the same keys and renames."""
    cols = ", ".join(f"cp.{c}" for c in _SCRIPT_COLS)
    return f"""
WITH cp AS ({_CHARPROFILE_SQL}),
nz AS ({_NORMALIZE_SQL}),
ls AS ({langscript_sql()})
SELECT cp.doc_id, d.lang, cp.n_chars, {cols}, cp.n_digit, cp.n_ws,
       cp.non_ascii_frac, cp.dominant_script,
       nz.nfc_changed, nz.norm_md5,
       ls.n_docs AS script_group_docs, ls.expected_script, ls.is_consistent
FROM cp
JOIN nz ON nz.doc_id = cp.doc_id
JOIN documents d ON d.doc_id = cp.doc_id
LEFT JOIN ls ON ls.lang = d.lang AND ls.dominant_script = cp.dominant_script
ORDER BY cp.doc_id
"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_char_integrity": q_char_integrity,
}

ORACLE_SQL: Dict[str, str] = {
    "t_char_integrity": char_integrity_sql(),
}
