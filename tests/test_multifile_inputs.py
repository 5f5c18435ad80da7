"""Production tables are DIRECTORIES of many files, not single parquet
files — every reader must give identical results on a multi-file layout
(the 100 TB contract; the fixture's single-file-per-table shape is the
special case). The nanos-timestamp events path is the risky one: the
legacy nanosAsLong read must survive splitting too.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from streamandbatchprocessing_spark.queries import QUERIES


@pytest.fixture(scope="module")
def multifile_sf(tmp_path_factory, sf_dir):
    """A copy of the fixture dir where lineitem/orders/events are split
    into 4-file directories (same name, so load_table hits a dir) and
    the rest are symlinks."""
    root = tmp_path_factory.mktemp("sf_multi")
    split = {"lineitem", "orders", "events"}
    for fname in os.listdir(sf_dir):
        src = os.path.join(sf_dir, fname)
        name = fname.removesuffix(".parquet")
        if name in split:
            # pyarrow round-trips the physical schema (incl. the events
            # TIMESTAMP(NANOS) column with version>=2.6) — Spark can't
            # rewrite it without downcasting to micros.
            table = pq.read_table(src)
            out_dir = root / fname
            out_dir.mkdir()
            n = max(1, table.num_rows // 4)
            for i in range(4):
                chunk = table.slice(i * n, table.num_rows - 3 * n if i == 3 else n)
                pq.write_table(chunk, out_dir / f"part-{i:02d}.parquet",
                               version="2.6")
        else:
            os.symlink(src, root / fname)
    return str(root)


@pytest.mark.parametrize(
    "name",
    [
        "b01_pricing_summary",    # lineitem (split)
        "b02_top_unshipped_orders",  # lineitem + orders (split) + customer
        "a01_revenue_by_category",   # events (split, detected ts path)
        "a09_dashboard_windows",     # events windows
        "e10_pii_scrub",             # events regexp scrub (round 4)
    ],
)
def test_query_identical_on_multifile_layout(spark, sf_dir, multifile_sf, name):
    single = QUERIES[name](spark, sf_dir).collect()
    multi = QUERIES[name](spark, multifile_sf).collect()
    assert sorted(map(repr, single)) == sorted(map(repr, multi))


def test_events_ts_schema_survives_split(sf_dir, multifile_sf):
    # Guard the fixture split: the chunk files must carry the SAME
    # physical ts unit as the source (the driver has shipped both
    # nanos and micros fixtures across rounds; if pyarrow ever
    # re-cast on rewrite, the layout test above would silently stop
    # covering the detected path).
    src_type = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
    f = os.path.join(multifile_sf, "events.parquet", "part-00.parquet")
    ts_type = pq.read_schema(f).field("ts").type
    assert str(ts_type) == str(src_type)


def test_events_loader_handles_legacy_nanos(spark, sf_dir, tmp_path):
    # The nanos fixture shape from earlier rounds must keep working:
    # rewrite events.parquet with a TIMESTAMP(NANOS) ts and check the
    # loader yields the identical normalized rows.
    import pyarrow as pa

    from streamandbatchprocessing_spark.sources.batch import load_table

    table = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    ts_ns = table["ts"].cast(pa.timestamp("ns"))
    legacy = table.set_column(table.schema.get_field_index("ts"), "ts", ts_ns)
    legacy_dir = tmp_path / "legacy"
    legacy_dir.mkdir()
    pq.write_table(legacy, legacy_dir / "events.parquet", version="2.6")
    assert str(pq.read_schema(legacy_dir / "events.parquet").field("ts").type) == (
        "timestamp[ns]"
    )
    expect = load_table(spark, sf_dir, "events").orderBy("event_id").collect()
    got = load_table(spark, str(legacy_dir), "events").orderBy("event_id").collect()
    assert got == expect


def test_streaming_reader_on_multifile_layout(spark, sf_dir, multifile_sf):
    # The streaming file source must read a directory-shaped events
    # table (production layout) and produce the same rows as the
    # single-file fixture stream.
    from streamandbatchprocessing_spark.streaming.pipeline import (
        events_stream,
        run_to_memory,
    )

    def drain(src_dir):
        plan = events_stream(spark, src_dir).select("event_id", "ts", "user_id")
        return sorted(map(repr, run_to_memory(plan, output_mode="append",
                                              name_prefix="mf_ev").collect()))

    assert drain(multifile_sf) == drain(sf_dir)
