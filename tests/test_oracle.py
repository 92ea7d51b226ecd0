"""Local replica of the driver's DuckDB-oracle correctness gate.

For every ``queries()`` entry with an ``oracle_sql()`` twin: run both at
sf0.001, compare row count, column names, and an order-insensitive value
comparison (rows sorted by all columns, exact equality on ints/strings,
exact on doubles too — our queries are engineered to be bit-identical
across engines; any drift is a bug to fix at the query level, not with a
tolerance here).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from __spark_entry__ import oracle_sql, queries

import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(rows, columns):
    """Sort columns by name, then rows by value — driver-compare shape."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def key(row):
        out = []
        for i in order:
            v = row[i]
            out.append((v is None, str(type(v)), str(v)))
        return out

    return sorted([tuple(row[i] for i in order) for row in rows], key=lambda r: key(list(r)))


def _values_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
        return a == b
    return a == b


ORACLES = oracle_sql()
QUERY_NAMES = [n for n in queries() if n in ORACLES]


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    qfn = queries()[name]
    sdf = qfn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(ORACLES[name])
    duck_cols = rel.columns
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    mismatches = []
    for i, (sr, dr) in enumerate(zip(s_norm, d_norm)):
        for j, (sv, dv) in enumerate(zip(sr, dr)):
            if not _values_equal(sv, dv):
                mismatches.append((i, sorted(spark_cols)[j], sv, dv))
                if len(mismatches) >= 5:
                    break
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"{name}: value mismatches (row, col, spark, duck): {mismatches}"


def test_every_query_has_rows_or_is_known_empty(spark):
    """Queries should exercise real data; empty results are suspicious.

    Known-empty allowance: none currently — tune thresholds instead of
    whitelisting emptiness.
    """
    qs = queries()
    empties = []
    for name, fn in qs.items():
        n = fn(spark, SF_DIR).count()
        if n == 0:
            empties.append(name)
    assert not empties, f"queries returned 0 rows at sf0.001: {empties}"
