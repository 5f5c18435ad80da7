"""Window-spec helpers.

``panel_window`` exists for windows over provably ROW-BOUNDED panels
(a LIMIT-capped head, a per-source summary with tens of groups): the
computation legitimately fits one partition, but an EMPTY partition
spec is indistinguishable — in the logs and in plan greps — from the
unbounded single-partition window that melts a 1000-executor job.
These helpers partition by a constant-valued key instead, so execution
is identical (every row lands in the one bucket) while the choice is
explicit in the plan: Spark's "No Partition Defined for Window"
warning class stays grep-clean and any REMAINING empty spec in a plan
audit is a real finding.

The key must be constant-valued yet NOT statically foldable — Spark
4's ``EliminateWindowPartitions`` rule strips foldable partition
expressions (and arithmetic like ``col * 0`` is simplified away), so a
plain ``lit(0)`` reverts to the empty spec. ``pmod(crc32(anchor), 1)``
is 0 for every non-null anchor, survives optimization, and costs one
checksum per panel row.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def _const_key(anchor: Column | str) -> Column:
    # coalesce: a NULL anchor would make crc32 NULL and silently split
    # the supposed single bucket into two window partitions (NULL and 0),
    # corrupting ranks/running sums for callers with nullable anchors.
    col = F.col(anchor) if isinstance(anchor, str) else anchor
    return F.pmod(F.crc32(F.coalesce(col.cast("string"), F.lit(""))), F.lit(1))


def panel_window(anchor: Column | str, *order_cols: Column | str) -> WindowSpec:
    """A window spec for a metadata-sized panel: constant-valued
    partition key derived from ``anchor`` (single bucket, same result
    as an empty spec) + the given ordering. Use ONLY where the input is
    bounded by construction — cap or count the panel first (see b33's
    TakeOrdered panel / p06's ``_guarded_panel_broadcast``)."""
    return Window.partitionBy(_const_key(anchor)).orderBy(*order_cols)


def panel_window_all(anchor: Column | str) -> WindowSpec:
    """Whole-panel frame (unbounded preceding..following) over the same
    constant-valued partition key — for scalar-over-panel aggregates
    kept in-plan (e.g. p16's floor-total)."""
    return Window.partitionBy(_const_key(anchor)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
