"""Transcript table source (S1) — polymorphic input, one canonical schema.

The reference's ``LoadImage`` accepts str/Path/bytes/ndarray/PIL and always
emits the same BGR ndarray contract
(lineless_table_rec/utils/utils.py:249-341).  The graft's source is the
transcripts *table*; this module is the same idea one level up: read
parquet/json/csv (or normalize an existing DataFrame) and always emit the
canonical transcript schema

    conv_id string, turn_idx int, role string, text string,
    tool string, ts timestamp

with explicit coercion and hard errors for missing required columns — so
every downstream plan can rely on the shape exactly as the reference's
stages rely on the ndarray contract.  Reads stay declarative
(``spark.read``), so Catalyst keeps predicate pushdown / column pruning /
partition pruning on the source format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["TRANSCRIPT_FIELDS", "normalize_transcripts", "read_transcripts"]

TRANSCRIPT_FIELDS = {
    "conv_id": T.StringType(),
    "turn_idx": T.IntegerType(),
    "role": T.StringType(),
    "text": T.StringType(),
    "tool": T.StringType(),
    "ts": T.TimestampType(),
}
_REQUIRED = ("conv_id", "turn_idx", "text")


def normalize_transcripts(df: DataFrame) -> DataFrame:
    """Coerce any column superset/ordering to the canonical transcript
    schema; missing optional columns become typed nulls, missing required
    columns raise with the full list."""
    missing = [c for c in _REQUIRED if c not in df.columns]
    if missing:
        raise ValueError(
            f"transcripts input is missing required columns {missing}; "
            f"have {df.columns}"
        )
    cols = []
    for name, dtype in TRANSCRIPT_FIELDS.items():
        if name in df.columns:
            # try_cast, not cast: under Spark 4's ANSI-on default a plain
            # cast ABORTS the job on one malformed value; the documented
            # contract is "malformed rows surface as nulls"
            cols.append(F.col(name).try_cast(dtype).alias(name))
        else:
            cols.append(F.lit(None).cast(dtype).alias(name))
    return df.select(*cols)


def _validate_json_keys(
    spark: SparkSession, path: str, options: dict, sample: int = 50
) -> None:
    """Reject inputs that are clearly not transcripts: if a bounded sample of
    raw lines shows NONE of the required keys, the imposed permissive schema
    would silently null every column, so fail loudly instead.

    Only a zero-required-keys sample fails: JSON writers drop null fields by
    default (Spark's own ``ignoreNullFields=true``), so any single key may
    legitimately be absent from the first lines of a sparse but valid corpus.
    The sample (``limit()`` stops at the first partition — no full scan,
    unlike schema inference) forwards the caller's reader options so file
    selection (``pathGlobFilter``, ``recursiveFileLookup``, ``lineSep``, …)
    matches the real read; options the text source doesn't know are ignored.
    Line-delimited JSON only; multiLine inputs skip this (a raw line is not
    an object there)."""
    import json as _json

    rows = spark.read.options(**options).text(path).limit(sample).collect()
    if not rows:
        return  # empty input: normalize's schema still holds
    seen: set[str] = set()
    for r in rows:
        try:
            obj = _json.loads(r[0])
        except ValueError:
            continue
        if isinstance(obj, dict):
            seen.update(obj.keys())
    if seen and not any(c in seen for c in _REQUIRED):
        raise ValueError(
            f"json transcripts at {path} carry none of the required keys "
            f"{list(_REQUIRED)} in the first {len(rows)} records; found keys "
            f"{sorted(seen)}"
        )


def read_transcripts(
    spark: SparkSession, path: str, fmt: str = "parquet", **options
) -> DataFrame:
    """Read a transcripts table in any supported format → canonical schema.

    ``fmt``: parquet (default) | json | csv | orc | table | iceberg.
    CSV defaults to header=true; json/csv read with an explicit schema
    (all-string + cast) so malformed rows surface as nulls, not inference
    surprises.

    ``table``/``iceberg`` treat ``path`` as a catalog table name
    (``catalog.db.transcripts``) and read through ``spark.read.table`` —
    with an Iceberg catalog configured (``spark.sql.catalog.<name>`` +
    the iceberg-spark-runtime jar on a real cluster) this is the Iceberg
    read path, and Catalyst keeps partition pruning, hidden-partition
    transforms, and snapshot metadata.  Options pass through, so
    ``snapshot-id`` / ``as-of-timestamp`` give time travel.
    """
    fmt = fmt.lower()
    reader = spark.read
    if fmt in ("table", "iceberg"):
        for k, v in options.items():
            reader = reader.option(k, v)
        return normalize_transcripts(reader.table(path))
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    if fmt == "json":
        # explicit permissive schema: every declared column as string, cast
        # in normalize — inference on big corpora is a full extra scan
        # (json binds by NAME, so an explicit schema is safe there).  The
        # imposed schema makes the read total (absent keys -> typed null),
        # which would silently defeat normalize's missing-required-column
        # error — recover it with a bounded key-presence sample below.
        schema = T.StructType(
            [T.StructField(n, T.StringType(), True) for n in TRANSCRIPT_FIELDS]
        )
        df = reader.schema(schema).format(fmt).load(path)
        # Spark reader options are case-insensitive — match that here
        multi = {k.lower(): str(v) for k, v in options.items()}.get(
            "multiline", "false"
        )
        if multi.lower() != "true":
            _validate_json_keys(spark, path, options)
    elif fmt == "csv":
        # CSV with an explicit schema binds columns POSITIONALLY (the header
        # row is skipped, not matched) — a reordered or superset CSV would
        # be silently misassigned.  Read header-named all-string columns
        # (inferSchema stays off: no extra scan) and cast by name in
        # normalize_transcripts.
        df = reader.option("inferSchema", "false").format(fmt).load(path)
    else:
        df = reader.format(fmt).load(path)
    return normalize_transcripts(df)
