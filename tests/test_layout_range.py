"""b35's range-clustered layout contract: per-file l_orderkey ranges
must be pairwise DISJOINT (repartitionByRange guarantees it; this is
what makes file-level min/max skipping exact on the cluster key), and
the selective scan's file pruning must actually engage."""

from pyspark.sql import functions as F

from streamandbatchprocessing_spark.queries.layout import (
    _RANGE_FILES,
    _RANGE_HI,
    _RANGE_LO,
    range_clustered_lineitem,
)


def test_range_files_have_disjoint_key_ranges(spark, sf_dir):
    z = range_clustered_lineitem(spark, sf_dir)
    per_file = (
        z.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi"))
        .collect()
    )
    assert 1 < len(per_file) <= _RANGE_FILES
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert lo1 <= hi1 < lo2, f"overlapping file ranges {spans}"


def test_range_scan_skips_files(spark, sf_dir):
    z = range_clustered_lineitem(spark, sf_dir)
    touched = (
        z.filter(F.col("l_orderkey").between(_RANGE_LO, _RANGE_HI))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    total = z.select(F.input_file_name().alias("f")).distinct().count()
    # a ~3% key slice of a disjoint-range layout must touch a strict
    # minority of the files
    assert touched < total, (touched, total)
    assert touched <= max(2, total // 4), (touched, total)
