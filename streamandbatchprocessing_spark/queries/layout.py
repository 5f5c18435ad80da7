"""Physical-layout queries (b30+): bucketing as a first-class operator.

The one shuffle every TPC-H-shaped workload pays over and over is
lineitem ⋈ orders. ``sources/bucketed.py`` moves it to write time;
b30 runs the full cycle — bucket both facts on the join key, join
WITHOUT an exchange, aggregate — and returns a result a plain SQL join
verifies, so the layout machinery is oracle-gated like every other
operator (the exchange-free plan itself is pinned by
tests/test_plans.py::test_bucketed_join_has_no_exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.aggregates import dsum
from ..sources.batch import load_table
from ..sources.staging import staging_dir
from ..sources.bucketed import colocated_fact_join
from .registry import query

_N_BUCKETS = 8

#: (applicationId, sf_dir) → staged join. A bucketed layout is a
#: write-once artifact: re-running b30 in the same session must REUSE
#: it, not write fresh fact-table copies into a new temp dir each call
#: (the DROP TABLE in write_bucketed only removes catalog metadata, so
#: un-memoized re-staging orphaned the previous data directories).
_STAGED: dict[tuple[str, str], DataFrame] = {}


def bucketed_lineitem_orders_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-located join itself (plan-testable): both facts bucketed
    into ``_N_BUCKETS`` on the order key, merge-join with no Exchange."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _STAGED.get(key)
    if cached is not None:
        return cached
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    base = staging_dir("sbp-bucketed-")
    joined = colocated_fact_join(
        spark,
        lineitem,
        orders,
        "l_orderkey",
        "o_orderkey",
        base,
        n_buckets=_N_BUCKETS,
        names=("sbp_bucketed_lineitem", "sbp_bucketed_orders"),
    )
    _STAGED[key] = joined
    return joined


@query(
    "b30_bucketed_colocated_join",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
)
def b30_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority over the bucketed lineitem ⋈ orders
    join. Identical answer to the plain join (the oracle); the
    difference is WHERE the shuffle happens — once, at table-write time,
    instead of inside every query. At 100 TB this is the difference
    between an nightly-layout job and a per-query exabyte exchange."""
    joined = bucketed_lineitem_orders_join(spark, sf_dir)
    return (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# b31 — z-ordered layout: multi-dimensional data skipping
# ---------------------------------------------------------------------------
#: Memoized z-write per (app, sf_dir) — the layout is a write-once
#: artifact like the bucketed tables above.
_ZSTAGED: dict[tuple[str, str], DataFrame] = {}

#: The selective box b31 scans: both dimensions constrained, which is
#: exactly the predicate shape a single-column sort cannot skip for.
_Z_PART_LO, _Z_PART_HI = 50, 120
_Z_ORD_LO, _Z_ORD_HI = 1000, 20000


def zordered_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem re-clustered on the Morton interleave of
    (l_partkey, l_orderkey) — each output file covers a compact
    rectangle of the 2-D key space, so parquet min/max stats skip files
    for predicates on EITHER key (tests/test_zorder.py pins the
    locality; production swaps 16 files for thousands, nothing else
    changes)."""
    from ..sources.zorder import write_zordered

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _ZSTAGED.get(key)
    if cached is not None:
        return cached
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount",
    )
    out = write_zordered(
        li, "l_partkey", "l_orderkey",
        staging_dir("sbp-zorder-") + "/lineitem",
    )
    _ZSTAGED[key] = out
    return out


@query(
    "b31_zorder_box_scan",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
               AS total_qty,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_partkey BETWEEN {_Z_PART_LO} AND {_Z_PART_HI}
      AND l_orderkey BETWEEN {_Z_ORD_LO} AND {_Z_ORD_HI}
    """,
)
def b31_zorder_box_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-selective aggregate over the z-ordered lineitem copy:
    identical answer to scanning the original table (the oracle — the
    layout must be value-invisible), but the scan prunes by file-level
    min/max on BOTH keys because z-clustering gave every file a compact
    2-D rectangle. A date-sorted or partkey-sorted layout skips on one
    dimension only; at 100 TB the z-layout turns this box query from a
    full scan into a few-file read."""
    z = zordered_lineitem(spark, sf_dir)
    return z.filter(
        F.col("l_partkey").between(_Z_PART_LO, _Z_PART_HI)
        & F.col("l_orderkey").between(_Z_ORD_LO, _Z_ORD_HI)
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.countDistinct("l_partkey").alias("n_parts"),
        dsum("l_quantity", "total_qty"),
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
        ),
    )


# ---------------------------------------------------------------------------
# b32 — date-partitioned layout: directory-level partition pruning
# ---------------------------------------------------------------------------
#: Memoized partitioned write per (app, sf_dir) — write-once artifact.
_PART_STAGED: dict[tuple[str, str], DataFrame] = {}

#: The date window b32 scans (the fixture spans 2024-01-01..01-30 at
#: every SF, so this 7-day slice prunes ~77 % of partitions).
_PART_LO, _PART_HI = "2024-01-08", "2024-01-14"


def date_partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events rewritten as a hive-partitioned layout
    (``event_date=YYYY-MM-DD/`` directories). A date filter then never
    touches excluded directories — pruning happens at PLANNING time
    from the file listing, before any I/O, visible as
    ``PartitionFilters`` in the scan (pinned by
    tests/test_plans.py::test_partition_pruning_reaches_scan)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _PART_STAGED.get(key)
    if cached is not None:
        return cached
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    base = staging_dir("sbp-datepart-") + "/events"
    ev.write.partitionBy("event_date").mode("overwrite").parquet(base)
    # Explicit schema: a zero-row write leaves no part files to infer
    # from (UNABLE_TO_INFER_SCHEMA), and at scale schema-on-read
    # inference is a listing-cost anti-pattern anyway. The partition
    # column keeps its DATE type via the declared field.
    out = spark.read.schema(ev.schema).parquet(base)
    _PART_STAGED[key] = out
    return out


@query(
    "b32_partition_pruned_scan",
    oracle=f"""
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE)
              BETWEEN DATE '{_PART_LO}' AND DATE '{_PART_HI}'
    GROUP BY 1, 2
    ORDER BY event_date, event_type
    """,
)
def b32_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type rollup over a 7-day slice of the date-partitioned
    events copy: identical answer to filtering the unpartitioned table
    (the oracle — layout must be value-invisible), but the date
    predicate resolves against DIRECTORY NAMES during planning, so
    excluded days cost zero I/O and zero tasks. At 100 TB,
    date-partitioning is the first-line layout decision — a 7-day
    dashboard query reads 7 partitions of a 3-year table instead of
    scanning it — and composes with b30/b31 (bucket or z-order WITHIN
    each partition)."""
    ev = date_partitioned_events(spark, sf_dir)
    return (
        ev.filter(F.col("event_date").between(_PART_LO, _PART_HI))
        .groupBy("event_date", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
        )
        .orderBy("event_date", "event_type")
    )


# ---------------------------------------------------------------------------
# b33 — dynamic partition pruning (runtime dim-driven partition skip)
# ---------------------------------------------------------------------------
#: The review panel: the 7 highest purchase-revenue days.
_DPP_TOP_DAYS = 7


@query(
    "b33_dynamic_partition_prune",
    oracle=f"""
    WITH byday AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
                          SUM(CAST(CASE WHEN event_type = 'purchase'
                                        THEN value ELSE 0 END
                                   AS DECIMAL(25,6))) AS ptotal
                   FROM events GROUP BY 1),
    top AS (SELECT d FROM (SELECT d, ROW_NUMBER()
                                      OVER (ORDER BY ptotal DESC, d) AS rn
                           FROM byday WHERE ptotal > 0)
            WHERE rn <= {_DPP_TOP_DAYS}),
    ev AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date,
                  event_type, value
           FROM events)
    SELECT ev.event_date, ev.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ev.value AS DECIMAL(25,6))) AS DOUBLE)
               AS total_value
    FROM ev JOIN top ON top.d = ev.event_date
    GROUP BY 1, 2
    ORDER BY event_date, event_type
    """,
)
def b33_dynamic_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type rollup of the 7 highest positive purchase-revenue days
    (a zero-purchase day is not reviewable, and the positivity filter
    is ALSO what lets Spark insert the dynamic-pruning subquery — DPP
    requires a selective predicate on the dim side; a bare top-K limit
    does not qualify), computed
    as a dimension-driven join against the date-partitioned events
    layout (b32) — the DYNAMIC partition-pruning shape: the day panel
    only exists at RUNTIME (it is itself an aggregate), so no static
    predicate can prune the fact scan; instead Spark broadcasts the
    panel, derives an IN-filter from it, and skips the other 23 of 30
    date partitions before reading them
    (``dynamicpruningexpression`` in the scan's PartitionFilters,
    pinned by tests/test_plans.py::test_dynamic_partition_pruning).

    At 100 TB this is the difference between "join the 3-year fact
    table, then discard 99% of it" and "read 7 partitions": DPP turns
    a dim-side decision into fact-side I/O elimination with no layout
    change beyond b32's date partitioning. The day ranking orders by
    the EXACT decimal revenue (ties broken by date, which is unique,
    so the ordering is total and the panel engine-deterministic) and
    is planned as ``TakeOrderedAndProject`` — per-partition top-K
    merged on the driver — NOT an unpartitioned ranking window, so
    the panel selection itself scales to any number of days without
    a single-partition exchange (plan-pinned by
    tests/test_plans.py::test_b33_panel_take_ordered)."""
    ev = load_table(spark, sf_dir, "events")
    byday = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value"))
                .otherwise(0)
                .cast("decimal(25,6)")
            ).alias("ptotal")
        )
    )
    top = (
        byday.filter(F.col("ptotal") > 0)
        .orderBy(F.desc("ptotal"), F.asc("d"))
        .limit(_DPP_TOP_DAYS)
        .select(F.col("d").alias("event_date"))
    )
    fact = date_partitioned_events(spark, sf_dir)
    return (
        fact.join(F.broadcast(top), "event_date")
        .groupBy("event_date", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
        )
        .orderBy("event_date", "event_type")
    )


# ---------------------------------------------------------------------------
# b34 — statistics-driven compaction plan (small-files remediation)
# ---------------------------------------------------------------------------
#: Target bytes per output file. Fixture-sized so the plan is
#: non-degenerate at the gate SFs; a production lake uses 128-512 MB —
#: the arithmetic below is scale-free (exact integer ceil-div).
_COMPACT_TARGET_BYTES = 16_384


@query(
    "b34_compaction_plan",
    oracle=f"""
    WITH e AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date,
                      CAST(32 + length(event_type) + length(props) AS BIGINT)
                          AS row_bytes
               FROM events),
    p AS (SELECT event_date,
                 CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(SUM(row_bytes) AS BIGINT) AS est_bytes
          FROM e GROUP BY event_date)
    SELECT event_date, n_rows, est_bytes,
           CAST((est_bytes + {_COMPACT_TARGET_BYTES - 1})
                // {_COMPACT_TARGET_BYTES} AS BIGINT) AS planned_files,
           CAST((n_rows + ((est_bytes + {_COMPACT_TARGET_BYTES - 1})
                           // {_COMPACT_TARGET_BYTES}) - 1)
                // ((est_bytes + {_COMPACT_TARGET_BYTES - 1})
                    // {_COMPACT_TARGET_BYTES}) AS BIGINT) AS rows_per_file
    FROM p
    ORDER BY event_date
    """,
)
def b34_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics-driven compaction plan for the date-partitioned
    events layout (b32): per partition, the row count, the estimated
    uncompressed bytes (fixed-width columns + measured string widths),
    and the target file layout — how many files a compactor should
    write and the rows per file. This is the planner half of OPTIMIZE /
    small-files remediation: the decision runs on aggregated
    STATISTICS (one linear scan, |partitions|-bounded output), never on
    file listings of the data lake, so planning a 3-year 100 TB table
    costs one metadata-light aggregate. All sizing is exact integer
    ceil-division — no float boundary for engines to disagree on.

    The byte estimate prices int64/double/timestamp columns at 8 bytes
    each (4 x 8 = 32) plus the two measured strings; a production
    planner calibrates with observed compression ratios, which scales
    every partition identically and cannot change the file-count
    ordering."""
    ev = load_table(spark, sf_dir, "events")
    t = _COMPACT_TARGET_BYTES
    p = (
        ev.select(
            F.to_date("ts").alias("event_date"),
            (F.lit(32) + F.length("event_type") + F.length("props"))
            .cast("long").alias("row_bytes"),
        )
        .groupBy("event_date")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("row_bytes").cast("long").alias("est_bytes"),
        )
    )
    planned = F.expr(f"(est_bytes + {t - 1}) div {t}")
    return p.select(
        "event_date", "n_rows", "est_bytes",
        planned.cast("long").alias("planned_files"),
        F.expr(
            f"(n_rows + ((est_bytes + {t - 1}) div {t}) - 1) "
            f"div ((est_bytes + {t - 1}) div {t})"
        ).cast("long").alias("rows_per_file"),
    ).orderBy("event_date")


# ---------------------------------------------------------------------------
# b35 — range-clustered layout: single-key file skipping (liquid-lite)
# ---------------------------------------------------------------------------
#: Memoized range-clustered write per (app, sf_dir) — write-once artifact.
_RANGE_STAGED: dict[tuple[str, str], DataFrame] = {}

#: File count for the clustered copy (production: thousands; the
#: mechanism — disjoint per-file key ranges — is size-independent).
_RANGE_FILES = 16

#: The selective key slice b35 scans (~3 % of the orderkey domain).
_RANGE_LO, _RANGE_HI = 3000, 4500


def range_clustered_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem rewritten range-clustered on l_orderkey:
    ``repartitionByRange`` gives each output file a DISJOINT key range
    and the within-partition sort makes every parquet row group's
    min/max tight — so a key-range predicate prunes to the few files
    whose range intersects it (Delta OPTIMIZE / liquid clustering on
    one key, expressed with nothing but native Spark). The 1-D
    complement of b31's Morton layout: perfect skipping on THE sort
    key, none on others — which is exactly when b31 takes over.
    Disjointness + skipping are pinned by tests/test_layout_range.py."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _RANGE_STAGED.get(key)
    if cached is not None:
        return cached
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount",
    )
    base = staging_dir("sbp-rangeclust-") + "/lineitem"
    (
        li.repartitionByRange(_RANGE_FILES, F.col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(base)
    )
    out = spark.read.parquet(base)
    _RANGE_STAGED[key] = out
    return out


@query(
    "b35_range_clustered_scan",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
               AS total_qty,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_orderkey BETWEEN {_RANGE_LO} AND {_RANGE_HI}
    """,
)
def b35_range_clustered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-range aggregate over the range-clustered lineitem copy:
    identical answer to scanning the original table (the oracle — a
    layout must be value-invisible), but the scan reads only the files
    whose disjoint l_orderkey range intersects the queried slice — at
    100 TB this is the difference between a full scan and reading
    ~3 % of the files, the payoff OPTIMIZE-style compaction (b34
    plans it) buys for the table's primary access key."""
    z = range_clustered_lineitem(spark, sf_dir)
    return z.filter(
        F.col("l_orderkey").between(_RANGE_LO, _RANGE_HI)
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum("l_quantity", "total_qty"),
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
        ),
    )
