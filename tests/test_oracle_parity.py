"""Emulates the driver's DuckDB oracle comparison for every queries() entry.

Runs each Spark query and its ANSI-SQL oracle on the same parquet (sf0.001
for speed; the driver uses sf0.01) and compares row count, column names, and
order-insensitive values.
"""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("TSR_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).df()


def _normalize(df):
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append(round(v, 6) if not math.isnan(v) else "nan")
            else:
                row.append(v)
        rows.append(tuple(row))
    return sorted(rows, key=repr)


def _entry_maps():
    import __spark_entry__ as entry_mod

    # sf-specific oracle builders (kmeans refit, BPE re-encode) embed
    # literals computed from the parquet at TSR_TEST_SF_DIR — pin it to the
    # sf this mirror runs at so both sides see the same corpus
    os.environ["TSR_TEST_SF_DIR"] = SF_DIR
    return entry_mod.queries(), entry_mod.oracle_sql()


def _query_names():
    qs, _ = _entry_maps()
    return sorted(qs)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, name):
    queries, oracles = _entry_maps()
    spark_df = queries[name](spark, SF_DIR).toPandas()
    if name not in oracles:
        assert len(spark_df) >= 0  # rows-only check, as the driver does
        return
    duck_df = _duck(oracles[name])
    assert sorted(spark_df.columns) == sorted(duck_df.columns), name
    assert len(spark_df) == len(duck_df), f"{name}: {len(spark_df)} vs {len(duck_df)}"
    a, b = _normalize(spark_df), _normalize(duck_df)
    n_bad = sum(x != y for x, y in zip(a, b))
    assert n_bad == 0, f"{name}: {n_bad}/{len(a)} rows differ; first: {next((x, y) for x, y in zip(a, b) if x != y)}"
