"""Registry wiring query callables to their DuckDB oracle SQL."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_query_conf

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: DataFrames persisted by the most recent query invocation. Query
#: results are returned lazily (the caller runs the terminal action), so
#: a query cannot unpersist its own intermediates before returning;
#: instead each invocation releases the PREVIOUS query's cache, bounding
#: a long-lived session (bench loop, the service) to one query's worth
#: of cached blocks instead of accumulating forever.
_TRACKED_CACHE: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist an intermediate and register it for release when the next
    query runs (or on an explicit ``release_tracked_caches`` call)."""
    df.persist()
    _TRACKED_CACHE.append(df)
    return df


def release_tracked_caches() -> None:
    while _TRACKED_CACHE:
        _TRACKED_CACHE.pop().unpersist()


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a correctness query.

    ``oracle`` is ANSI SQL for DuckDB over views named after the fixture
    tables. ``None`` marks a genuinely non-SQL-expressible operator
    (custom stateful streaming etc.) — the driver then records a weaker
    rows-only check.
    """

    def decorate(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_query_conf(spark)
            release_tracked_caches()
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return decorate
