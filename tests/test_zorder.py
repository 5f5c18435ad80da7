"""Z-order layout (sources/zorder.py): Morton-code correctness and the
property that actually buys data skipping — every output file covers a
COMPACT rectangle of the 2-D key space, so file-level min/max stats
prune on either dimension. (b31's oracle separately proves the layout
is value-invisible.)"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from streamandbatchprocessing_spark.sources.batch import load_table
from streamandbatchprocessing_spark.sources.zorder import (
    morton2,
    quantize,
    write_zordered,
)


def test_morton_interleave_known_bits(spark):
    # x=0b101, y=0b011 → z = x0·1 + y0·2 + x1·4 + y1·8 + x2·16 + y2·32
    #                      = 1 + 2 + 0 + 8 + 16 + 0 = 27
    row = spark.range(1).select(
        morton2(F.lit(0b101).cast("long"), F.lit(0b011).cast("long"))
        .alias("z")
    ).first()
    assert row["z"] == 27


def test_quantize_is_exact_at_bounds(spark):
    df = spark.createDataFrame([(0,), (500,), (1000,)], "x long")
    got = [
        r["q"]
        for r in df.select(
            quantize(F.col("x"), 0, 1000, bits=12).alias("q")
        ).orderBy("q").collect()
    ]
    assert got[0] == 0
    assert got[-1] == (1 << 12) - 1  # hi maps exactly to the top cell
    assert 0 < got[1] < (1 << 12) - 1


def _file_boxes(spark, path, dim_a, dim_b):
    """Per-parquet-file (min,max) of both dims — what the reader's
    file-skipping sees."""
    boxes = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        r = spark.read.parquet(f).agg(
            F.min(dim_a), F.max(dim_a), F.min(dim_b), F.max(dim_b)
        ).first()
        boxes.append(tuple(r))
    return boxes


def test_zorder_files_cover_compact_rectangles(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey"
    )
    n_files = 16
    zpath = str(tmp_path / "z")
    write_zordered(li, "l_partkey", "l_orderkey", zpath, n_files=n_files)
    # Naive baseline: the same data round-robined into as many files —
    # every file spans ~the whole key space.
    npath = str(tmp_path / "naive")
    li.repartition(n_files).write.mode("overwrite").parquet(npath)

    glo = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_orderkey"), F.max("l_orderkey"),
    ).first()
    span_a = max(glo[1] - glo[0], 1)
    span_b = max(glo[3] - glo[2], 1)

    def total_area(path):
        return sum(
            ((amax - amin) / span_a) * ((bmax - bmin) / span_b)
            for amin, amax, bmin, bmax in _file_boxes(
                spark, path, "l_partkey", "l_orderkey"
            )
        )

    z_area, naive_area = total_area(zpath), total_area(npath)
    # Naive: every file ≈ the full rectangle (area ≈ n_files). Z-order:
    # files tile the space, so the summed area is several times smaller
    # — that ratio IS the expected file-skipping factor for box scans.
    assert z_area < naive_area / 3, (z_area, naive_area)


def test_zorder_box_scan_skips_files(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey"
    )
    zpath = str(tmp_path / "zskip")
    write_zordered(li, "l_partkey", "l_orderkey", zpath, n_files=16)
    boxes = _file_boxes(spark, zpath, "l_partkey", "l_orderkey")
    glo = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_orderkey"), F.max("l_orderkey"),
    ).first()
    # A centered box covering ~1/4 of each axis: with compact file
    # rectangles most files' min/max must fall wholly outside it.
    a_lo = glo[0] + (glo[1] - glo[0]) * 3 // 8
    a_hi = glo[0] + (glo[1] - glo[0]) * 5 // 8
    b_lo = glo[2] + (glo[3] - glo[2]) * 3 // 8
    b_hi = glo[2] + (glo[3] - glo[2]) * 5 // 8
    hit = [
        1
        for amin, amax, bmin, bmax in boxes
        if not (amax < a_lo or amin > a_hi or bmax < b_lo or bmin > b_hi)
    ]
    assert len(hit) < len(boxes), (len(hit), len(boxes))


def test_write_zordered_empty_input(spark, sf_dir, tmp_path):
    """An empty slice through the layout writer must yield a readable
    empty table with the input schema — not a TypeError from the
    min/max collect returning NULLs."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    ).filter(F.lit(False))
    out = write_zordered(li, "l_partkey", "l_orderkey",
                         str(tmp_path / "zempty"))
    assert out.count() == 0
    assert out.columns == ["l_orderkey", "l_partkey", "l_quantity"]
