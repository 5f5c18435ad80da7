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
from pyspark.sql import types as T

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


# ---------------------------------------------------------------------------
# Type-class compare — driver-faithful dtype strictness.
#
# The driver hashes a typed (arrow/pandas) materialization of both results.
# DuckDB HUGEINT / DECIMAL become float64 there while Spark LONG stays int64,
# so identical *values* still hash-mismatch when the oracle leaves e.g.
# ``SUM(CASE WHEN … THEN 1 ELSE 0 END)`` uncast (round-1 failures a07, g11,
# b15, b28). ``fetchall()`` hides this (HUGEINT -> Python int), so values
# alone cannot catch it; we classify both sides' LOGICAL types into the
# equivalence classes the driver's hash actually distinguishes and require
# them to match per column.
# ---------------------------------------------------------------------------
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _duck_class(t) -> str:
    s = str(t).upper()
    if s in _DUCK_INT:
        return "int"
    if s in ("HUGEINT", "UHUGEINT"):
        # pandas has no int128: the driver sees float64. Flag loudly —
        # the fix is always CAST(… AS BIGINT) in the oracle SQL.
        return "float"
    if s in ("FLOAT", "DOUBLE") or s.startswith("DECIMAL"):
        return "float"
    if s == "BOOLEAN":
        return "bool"
    if s == "DATE":
        return "date"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    if s in ("VARCHAR", "UUID", "BLOB"):
        return "string"
    if s.endswith("[]") or s.startswith(("STRUCT", "MAP", "LIST")):
        return "nested"
    return "other"


def _spark_class(d) -> str:
    if isinstance(d, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(d, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(d, T.DecimalType):
        # Deliberately NOT merged with "float": queries must expose
        # doubles (dsum/davg already cast) so both sides materialize the
        # same arrow type at the driver.
        return "decimal"
    if isinstance(d, T.BooleanType):
        return "bool"
    if isinstance(d, T.DateType):
        return "date"
    if isinstance(d, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(d, (T.StringType, T.BinaryType)):
        return "string"
    if isinstance(d, (T.ArrayType, T.StructType, T.MapType)):
        return "nested"
    return "other"


def assert_flat_output_schema(name: str, sdf) -> None:
    """Fail when a query's OUTPUT schema contains array/map/struct
    columns. The external driver canonicalizes results with a pandas
    ``sort_values`` over every column, and non-scalar cells are
    unhashable in pandas' lexsort — the round-5 m06 failure mode
    (``TypeError: unhashable type: 'list'`` in the driver, no verdict
    recorded). Scored queries must emit flat scalar columns only;
    list-shaped payloads are joined into deterministic strings
    (see m06's replica_ids)."""
    bad = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name}: non-scalar output columns {bad} — the driver's pandas "
        f"sort_values canonicalization cannot hash them (round-5 m06). "
        f"Emit a sorted joined string instead."
    )


#: Row cap for the canonicalization-survival probe. Whether pandas
#: ``sort_values`` throws is a property of the cell TYPES (unhashable
#: list/dict cells — the round-5 m06 failure came from a typed array
#: column, present in every row), and ``assert_flat_output_schema``
#: already rejects nested schema types outright — so sorting a bounded
#: prefix proves survival without a full O(n log n) pandas sort of
#: multi-million-row results (c02 at sf0.1 is ~7.7M pairs).
_CANON_SAMPLE_ROWS = 10_000


def _driver_canon(name: str, side: str, cols, raw_rows):
    """Replicate the external driver's canonicalization: a pandas
    frame, columns reordered by name, then ``sort_values`` — on the
    RAW (un-normalized) values so anything the driver's compare would
    choke on (unhashable list/dict cells) fails HERE, in the local
    harness, before a round ships. Bounded to a row-sample; see
    ``_CANON_SAMPLE_ROWS``."""
    import pandas as pd

    df = pd.DataFrame(raw_rows[:_CANON_SAMPLE_ROWS], columns=cols)
    df = df[sorted(df.columns)]
    try:
        return df.sort_values(list(df.columns)).reset_index(drop=True)
    except TypeError as exc:  # pragma: no cover - exercised via m06 test
        raise AssertionError(
            f"{name}: {side} result does not survive the driver's pandas "
            f"sort_values canonicalization ({exc}) — scored queries must "
            f"emit flat scalar columns only."
        ) from exc


def assert_type_classes_match(name, sdf, relation) -> None:
    """Fail when any output column's type class differs between the Spark
    result and the DuckDB oracle (e.g. BIGINT vs HUGEINT → the driver's
    typed hash would mismatch even with identical values)."""
    s_cls = {f.name.lower(): _spark_class(f.dataType) for f in sdf.schema.fields}
    d_cls = {
        c.lower(): _duck_class(t)
        for c, t in zip(relation.columns, relation.types)
    }
    bad = [
        (c, s_cls[c], d_cls[c])
        for c in sorted(set(s_cls) & set(d_cls))
        if s_cls[c] != d_cls[c]
    ]
    assert not bad, (
        f"{name}: oracle/spark type-class mismatch {bad} — identical values "
        f"would still fail the driver's typed hash. For int-vs-float this "
        f"usually means an uncast SUM(CASE…) in the oracle: wrap it in "
        f"CAST(… AS BIGINT)."
    )


def compare(spark, sf_dir: str, name: str, query_fn, oracle: str) -> None:
    sdf = query_fn(spark, sf_dir)
    assert_flat_output_schema(name, sdf)
    scols = [c.lower() for c in sdf.columns]
    sraw = [tuple(row) for row in sdf.collect()]
    srows = [tuple(_norm(v) for v in row) for row in sraw]

    con = duckdb_conn(sf_dir)
    res = con.sql(oracle)
    dcols = [c.lower() for c in res.columns]
    draw = res.fetchall()
    drows = [tuple(_norm(v) for v in row) for row in draw]

    # Both sides must survive the driver's pandas canonicalization
    # (sort_values over every column on raw values) — the exact step
    # that errored m06 in round 5 without recording a verdict.
    _driver_canon(name, "spark", scols, sraw)
    _driver_canon(name, "duckdb", dcols, draw)

    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={scols} duckdb={dcols}"
    )
    assert_type_classes_match(name, sdf, res)
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
