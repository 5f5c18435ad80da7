"""Deterministic aggregate builders.

Floating-point ``SUM``/``AVG`` results depend on partition/merge order,
so the same query can return slightly different doubles run-to-run (and
engine-to-engine). The reference sidesteps this only by ``round(x, 2)``
(AnalysisAggregator.scala:113-118) which still has boundary risk. We do
it properly: accumulate in exact decimal, then cast the final value back
to double. Decimal addition is associative/commutative, so results are
bit-identical regardless of partitioning — which is exactly what a
100 TB cluster run needs for reproducibility, and what lets the DuckDB
oracle match us bit-for-bit.

Cost note: decimal hash-agg is marginally slower than double but stays
inside whole-stage codegen; the scan still dominates at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Wide enough for sums over ~1e12 rows of money-sized values.
_DECIMAL = "decimal(25,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM over a double column, returned as double.

    DuckDB-oracle equivalent:
    ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DECIMAL)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG (decimal-sum / non-null count) as double.

    DuckDB-oracle equivalent:
    ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DECIMAL)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dround(col: Column, scale: int, alias: str | None = None) -> Column:
    """Round a (deterministic) double; use only on already-deterministic
    inputs such as ``dsum``/``davg`` outputs, mirroring the reference's
    ``round(x, 2)`` post-aggregation formatting."""
    out = F.round(col, scale)
    return out.alias(alias) if alias else out
