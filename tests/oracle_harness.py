"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet,
then compares row count, column names, and order-insensitive values
(exact for non-floats; floats must match to ~1 ulp since the engine's
deterministic-aggregate discipline makes them bit-identical in theory).
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import duckdb

FIXTURE_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rows_key(rows):
    return sorted(repr(r) for r in rows)


def compare(spark, sf_dir: str, name: str, query_fn, oracle: str) -> None:
    sdf = query_fn(spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(_norm(v) for v in row) for row in sdf.collect()]

    con = duckdb_conn(sf_dir)
    res = con.sql(oracle)
    dcols = [c.lower() for c in res.columns]
    drows = [tuple(_norm(v) for v in row) for row in res.fetchall()]

    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={scols} duckdb={dcols}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row count mismatch spark={len(srows)} duckdb={len(drows)}"
    )

    # Driver compare sorts columns by name; replicate.
    s_order = [scols.index(c) for c in sorted(scols)]
    d_order = [dcols.index(c) for c in sorted(dcols)]
    s_sorted = [tuple(r[i] for i in s_order) for r in srows]
    d_sorted = [tuple(r[i] for i in d_order) for r in drows]

    mismatches = _diff_multisets(s_sorted, d_sorted)
    assert not mismatches, f"{name}: value mismatch, first diffs: {mismatches[:6]}"


def _diff_multisets(a, b):
    """Rows in a XOR b; exact comparison — the engine's deterministic
    aggregates are expected to be bit-identical to the oracle. Returns []
    when multisets match."""
    from collections import Counter

    ca, cb = Counter(map(repr, a)), Counter(map(repr, b))
    only_a = sorted((ca - cb).keys())
    only_b = sorted((cb - ca).keys())
    if not only_a and not only_b:
        return []
    return [("spark", r) for r in only_a[:3]] + [("duckdb", r) for r in only_b[:3]]
