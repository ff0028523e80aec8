"""Driver-contract gate simulation: run every ``queries()`` entry at
sf0.01 and compare against its ``oracle_sql()`` via DuckDB — the same
check CORRECTNESS_r{N}.json records (row count + column names +
order-insensitive values).  Rows-only queries are smoke-checked.
"""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _spark_rows(df):
    return sorted(tuple(_norm(v) for v in row) for row in df.collect())


def _duck_rows(res):
    return sorted(tuple(_norm(v) for v in row) for row in res.fetchall())


ORACLE_QUERIES = sorted(E.oracle_sql().keys())
ROWS_ONLY = sorted(set(E.queries().keys()) - set(ORACLE_QUERIES))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, ddb, name):
    qdf = E.queries()[name](spark, SF)
    osql = E.oracle_sql()[name]
    got = _spark_rows(qdf)
    want = _duck_rows(ddb.sql(osql))
    assert [c.lower() for c in sorted(qdf.columns)] == sorted(
        c.lower() for c in ddb.sql(osql).columns
    ), f"{name}: column names differ"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {mism[:3]}"


# Minimum row counts at sf0.01 for every registry entry that CAN run
# without an oracle_sql entry (ADVICE r05 #1): ann_approx degrades to
# rows-only when the ANN aux is unsupported (>100k-vector corpora) and
# the other two degrade if aux generation ever fails — without a floor
# those entries would be completely unverified.  Applied only to
# whatever ROWS_ONLY actually contains at collection time.
_MIN_ROWS = {
    "fingerprints": 500,  # one row per document
    "ann_approx": 20,     # ≥ 2 paths × queries × top-k, minus misses
    "media_features": 1000,  # 8 feats × ~1k media docs
}


def test_rows_only_have_floor():
    """Any entry that lost (or never had) its oracle must still carry a
    minimum-row floor, or it silently becomes unverified."""
    missing = [k for k in ROWS_ONLY if k not in _MIN_ROWS]
    assert not missing, f"rows-only entries without a _MIN_ROWS floor: {missing}"


def test_registry_fits_driver_window():
    """The driver verifies only the first 50 registry entries (r3 ran
    50/56 with exactly the last six missing) — every entry must sit
    inside the window, oracle-bearing ones first."""
    keys = list(E.queries().keys())
    assert len(keys) <= 50, f"{len(keys)} entries > driver's 50-entry window"
    oracled = set(E.oracle_sql().keys())
    first_rows_only = next((i for i, k in enumerate(keys) if k not in oracled), len(keys))
    assert all(k not in oracled for k in keys[first_rows_only:]), (
        "oracle-bearing entries must precede all rows-only entries"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_smoke(spark, name):
    df = E.queries()[name](spark, SF)
    n = df.count()
    assert n >= _MIN_ROWS[name], f"{name}: {n} rows < {_MIN_ROWS[name]}"


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_scalar_columns_only(spark, name):
    """The driver's canonicalizer (pandas sort_values/factorize over all
    columns) crashes on array/map/struct columns — every contract query
    must return atomic column types (CORRECTNESS_r01 regression)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = E.queries()[name](spark, SF)
    complex_cols = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, f"{name}: complex-typed columns {complex_cols}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert df.columns == ["query_id", "rank", "doc_id", "score"]
