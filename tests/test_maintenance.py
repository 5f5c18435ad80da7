"""Maintenance surface: versioned snapshots (time travel), vacuum,
compaction, and registry rebuild-from-disk."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from streamandbatchprocessing_spark.service.maintenance import (
    VersionedTable,
    compact,
    dir_stats,
    persist_record,
    rebuild_registry,
)
from streamandbatchprocessing_spark.service.registry import (
    BatchJobRecord,
    BatchStatus,
)
from streamandbatchprocessing_spark.sources.batch import load_table


@pytest.fixture()
def nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def test_versioned_write_and_current_read(spark, nation, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    assert t.write(nation.filter(F.col("n_nationkey") < 5)) == 0
    assert t.write(nation) == 1
    assert t.read(spark).count() == nation.count()


def test_time_travel_by_version(spark, nation, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(nation.filter(F.col("n_nationkey") < 5))
    t.write(nation)
    assert t.read(spark, version=0).count() == 5
    assert t.read(spark, version=1).count() == nation.count()
    with pytest.raises(ValueError):
        t.read(spark, version=7)


def test_time_travel_by_timestamp(spark, nation, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(nation.filter(F.col("n_nationkey") < 5))
    mid = time.time()
    time.sleep(0.01)
    t.write(nation)
    assert t.read(spark, as_of=mid).count() == 5
    assert t.read(spark, as_of=time.time()).count() == nation.count()
    with pytest.raises(ValueError):
        t.read(spark, as_of=1.0)  # before any commit


def test_vacuum_drops_old_versions(spark, nation, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    for k in (3, 5, 25):
        t.write(nation.filter(F.col("n_nationkey") < k))
    assert t.vacuum(keep=2) == [0]
    assert not os.path.exists(str(tmp_path / "tbl" / "v=0"))
    assert t.read(spark, version=1).count() == 5  # survivor intact
    with pytest.raises(ValueError):
        t.read(spark, version=0)


def test_compact_reduces_file_count(spark, sf_dir, tmp_path):
    path = str(tmp_path / "shattered")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    li.repartition(16).write.parquet(path)
    before, _ = dir_stats(path)
    assert before == 16
    stats = compact(spark, path)
    after, _ = dir_stats(path)
    assert stats["files_before"] == 16
    assert stats["files_after"] == after == 1  # tiny table → one file
    # data survives the directory swap byte-for-byte
    assert spark.read.parquet(path).count() == li.count()


def test_registry_rebuild_from_disk(tmp_path):
    base = str(tmp_path)
    done = BatchJobRecord(
        batch_id="batch-20260813-aaaaaaaa",
        analysis_type="revenue_by_category",
        start_date="2026-01-01",
        end_date="2026-02-01",
        status=BatchStatus.COMPLETED,
        row_count=42,
    )
    persist_record(base, done)
    # a crashed job: directory exists, no terminal meta.json
    os.makedirs(os.path.join(base, "batches", "batch-20260813-bbbbbbbb"))

    reg = rebuild_registry(base)
    rec = reg.get("batch-20260813-aaaaaaaa")
    assert rec is not None and rec.status is BatchStatus.COMPLETED
    assert rec.row_count == 42
    crashed = reg.get("batch-20260813-bbbbbbbb")
    assert crashed is not None and crashed.status is BatchStatus.FAILED
    assert "restart" in (crashed.error or "")


def test_rebuild_empty_dir(tmp_path):
    assert rebuild_registry(str(tmp_path)).list_all() == []


def test_merge_upsert_updates_and_inserts(spark, nation, tmp_path):
    from streamandbatchprocessing_spark.service.maintenance import merge_upsert

    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(nation)
    updates = spark.createDataFrame(
        [(0, "RENAMED_0", nation.collect()[0].n_regionkey),
         (990, "BRAND_NEW", 1)],
        nation.schema.names,
    )
    v = merge_upsert(spark, t, updates, keys=["n_nationkey"])
    assert v == 1
    merged = {r.n_nationkey: r.n_name for r in t.read(spark).collect()}
    assert merged[0] == "RENAMED_0"          # matched → replaced
    assert merged[990] == "BRAND_NEW"        # unmatched → inserted
    assert len(merged) == nation.count() + 1
    # old version untouched (snapshot isolation)
    old = {r.n_nationkey: r.n_name for r in t.read(spark, version=0).collect()}
    assert old[0] != "RENAMED_0" and 990 not in old


def test_merge_upsert_rejects_schema_drift(spark, nation, tmp_path):
    from streamandbatchprocessing_spark.service.maintenance import merge_upsert

    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(nation)
    bad = nation.withColumnRenamed("n_name", "name")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(spark, t, bad, keys=["n_nationkey"])


# -- Delta-parity extensions: append log, schema autoMerge, ISO as_of ------

def test_append_does_not_rewrite_existing_data(spark, nation, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(nation.filter(F.col("n_nationkey") < 5))
    files_v0, _ = dir_stats(str(tmp_path / "tbl" / "v=0"))
    mtimes = {
        f: os.path.getmtime(os.path.join(r, f))
        for r, _d, fs in os.walk(str(tmp_path / "tbl" / "v=0"))
        for f in fs
    }
    v = t.append(nation.filter(F.col("n_nationkey") >= 5))
    assert v == 1
    # v=0's files are untouched (append is O(increment), not O(table))
    files_after, _ = dir_stats(str(tmp_path / "tbl" / "v=0"))
    assert files_after == files_v0
    for r, _d, fs in os.walk(str(tmp_path / "tbl" / "v=0")):
        for f in fs:
            assert os.path.getmtime(os.path.join(r, f)) == mtimes[f]
    # the new version reads the union; the old version is unchanged
    assert t.read(spark).count() == nation.count()
    assert t.read(spark, version=0).count() == 5


def test_append_schema_merge_and_time_travel_schema(spark, nation, tmp_path):
    # Delta schema.autoMerge parity (SparkManager.scala:37): an appended
    # column surfaces with NULLs on old rows in the NEW version, while
    # time travel to the pre-append version still shows the old schema.
    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(nation.select("n_nationkey", "n_name"))
    t.append(
        nation.filter(F.col("n_nationkey") < 3)
        .select("n_nationkey", "n_name")
        .withColumn("review_score", F.lit(4.5))
    )
    cur = t.read(spark)
    assert "review_score" in cur.columns
    assert cur.filter(F.col("review_score").isNull()).count() == nation.count()
    assert cur.filter(F.col("review_score").isNotNull()).count() == 3
    assert "review_score" not in t.read(spark, version=0).columns


def test_time_travel_by_iso_timestamp(spark, nation, tmp_path):
    import datetime as dt

    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(nation.filter(F.col("n_nationkey") < 5))
    mid_iso = (
        dt.datetime.now(dt.timezone.utc).isoformat().replace("+00:00", "Z")
    )
    time.sleep(0.01)
    t.write(nation)
    assert t.read(spark, as_of=mid_iso).count() == 5
    with pytest.raises(ValueError):
        t.read(spark, as_of="1970-01-01T00:00:00Z")


def test_vacuum_keeps_dirs_shared_with_survivors(spark, nation, tmp_path):
    # v=1 (append) references v=0's dir; vacuuming version 0 must keep
    # the shared directory because version 1 still reaches it.
    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(nation.filter(F.col("n_nationkey") < 5))
    t.append(nation.filter(F.col("n_nationkey") >= 5))
    t.write(nation.limit(1))  # v=2: independent snapshot
    dropped = t.vacuum(keep=2)  # drops version 0 only
    assert dropped == [0]
    assert os.path.isdir(str(tmp_path / "tbl" / "v=0"))  # shared with v=1
    assert t.read(spark, version=1).count() == nation.count()
    dropped = t.vacuum(keep=1)  # drops version 1 → v=0 now unreachable
    assert dropped == [1]
    assert not os.path.isdir(str(tmp_path / "tbl" / "v=0"))
    assert t.read(spark).count() == 1


def test_merge_upsert_schema_merge(spark, nation, tmp_path):
    from streamandbatchprocessing_spark.service.maintenance import merge_upsert

    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(nation.select("n_nationkey", "n_name"))
    updates = (
        nation.filter(F.col("n_nationkey") < 2)
        .select("n_nationkey", "n_name")
        .withColumn("flagged", F.lit(True))
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(spark, t, updates, keys=["n_nationkey"])
    v = merge_upsert(
        spark, t, updates, keys=["n_nationkey"], allow_schema_merge=True
    )
    cur = t.read(spark, version=v)
    assert cur.count() == nation.count()
    assert cur.filter(F.col("flagged")).count() == 2
    assert cur.filter(F.col("flagged").isNull()).count() == nation.count() - 2


def test_history_records_operations(spark, nation, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(nation.filter(F.col("n_nationkey") < 5))
    t.append(nation.filter(F.col("n_nationkey") >= 5))
    t.restore(0)
    h = t.history()
    assert [e["version"] for e in h] == [2, 1, 0]  # newest first
    assert [e["operation"] for e in h] == ["RESTORE", "APPEND", "WRITE"]
    assert h[0]["params"] == {"restored_from": 0}
    assert all(e["committed_at"] > 0 for e in h)


def test_restore_is_metadata_only_rollback(spark, nation, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(nation.filter(F.col("n_nationkey") < 5))
    t.append(nation.filter(F.col("n_nationkey") >= 5))
    before = {d for d in os.listdir(t.root) if d.startswith("v=")}
    new_v = t.restore(0)
    # no new data directory: the restore commit re-points at v=0's dirs
    assert {d for d in os.listdir(t.root) if d.startswith("v=")} == before
    assert t.read(spark).count() == 5  # current == the restored snapshot
    assert t.read(spark, version=1).count() == nation.count()  # kept
    assert new_v == 2


def test_restore_unknown_version_raises(spark, nation, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(nation)
    with pytest.raises(ValueError, match="not available"):
        t.restore(7)


def test_optimize_preserves_time_travel(spark, nation, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(nation.filter(F.col("n_nationkey") < 5))
    for lo, hi in ((5, 10), (10, 15), (15, 25)):
        t.append(
            nation.filter((F.col("n_nationkey") >= lo) & (F.col("n_nationkey") < hi))
        )
    rows = t.read(spark).count()
    dirs_of_current = len(t.manifest()["versions"][-1]["dirs"])
    assert dirs_of_current == 4  # append chain: 4 referenced dirs
    v = t.optimize(spark)
    h = t.history()[0]
    assert h["operation"] == "OPTIMIZE"
    # compacted current: same rows, ONE referenced dir, balanced files
    cur = [e for e in t.manifest()["versions"] if e["version"] == v][0]
    assert len(cur["dirs"]) == 1
    assert t.read(spark).count() == rows
    # prior versions still resolve (un-compacted dirs retained)
    assert t.read(spark, version=0).count() == 5
    # vacuum reclaims the superseded append dirs, current survives
    t.vacuum(keep=1)
    assert t.read(spark).count() == rows


def test_optimize_preserves_partitioning(spark, nation, tmp_path):
    """OPTIMIZE on a partitioned table must keep the partition layout
    (Delta compacts WITHIN partitions, never flattens them) — the new
    version's data dir still has partition subdirectories and reads
    back identically."""
    import os

    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(nation, partition_by=["n_regionkey"])
    before = {
        (r["n_nationkey"], r["n_regionkey"])
        for r in t.read(spark).collect()
    }
    v = t.optimize(spark)
    cur = [e for e in t.manifest()["versions"] if e["version"] == v][0]
    assert cur.get("partition_by") == ["n_regionkey"]
    vdir = os.path.join(str(tmp_path / "tbl"), cur["dirs"][0])
    assert any(
        d.startswith("n_regionkey=") for d in os.listdir(vdir)
    ), os.listdir(vdir)
    after = {
        (r["n_nationkey"], r["n_regionkey"])
        for r in t.read(spark).collect()
    }
    assert after == before


def test_optimize_after_restore_uses_restored_layout(spark, nation, tmp_path):
    """Layout resolution follows LINEAGE, not recency: after RESTORE to
    a version partitioned by X, OPTIMIZE must compact within X — not
    within whatever layout an abandoned later commit recorded. The
    RESTORE entry itself records the resolved layout, so it also
    survives vacuuming its source version."""
    import os

    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(nation, partition_by=["n_regionkey"])           # v0: by region
    t.write(nation.limit(5), partition_by=["n_nationkey"])  # v1: by nation
    v2 = t.restore(0)                                       # back to v0
    entry = [e for e in t.manifest()["versions"] if e["version"] == v2][0]
    assert entry.get("partition_by") == ["n_regionkey"]
    before = {
        (r["n_nationkey"], r["n_regionkey"])
        for r in t.read(spark).collect()
    }
    v3 = t.optimize(spark)
    cur = [e for e in t.manifest()["versions"] if e["version"] == v3][0]
    assert cur.get("partition_by") == ["n_regionkey"]
    vdir = os.path.join(str(tmp_path / "tbl"), cur["dirs"][0])
    assert any(
        d.startswith("n_regionkey=") for d in os.listdir(vdir)
    ), os.listdir(vdir)
    after = {
        (r["n_nationkey"], r["n_regionkey"])
        for r in t.read(spark).collect()
    }
    assert after == before
