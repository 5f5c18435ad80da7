"""Interchange-format roundtrips must be LOSSLESS: every supported
format carries the fixture tables through write→read with identical
schemas and identical values — timestamps at microsecond precision,
doubles bit-exact, nulls distinguished from empty strings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamandbatchprocessing_spark.sources.batch import load_table
from streamandbatchprocessing_spark.sources.formats import (
    INTERCHANGE_FORMATS,
    read_interchange,
    write_interchange,
)


def _roundtrip(spark, df, path, fmt):
    write_interchange(df, path, fmt)
    back = read_interchange(spark, path, fmt, df.schema)
    assert back.schema == df.schema, (fmt, back.schema, df.schema)
    a = sorted(map(repr, df.collect()))
    b = sorted(map(repr, back.collect()))
    assert a == b, f"{fmt}: roundtrip changed values"


@pytest.mark.parametrize("fmt", INTERCHANGE_FORMATS)
@pytest.mark.parametrize("table", ["events", "orders"])
def test_flat_tables_roundtrip_all_formats(spark, sf_dir, tmp_path, fmt, table):
    # events: TIMESTAMP_NTZ micros + doubles + strings; orders:
    # timestamps + doubles — the type surface text formats get wrong
    # without pinned options.
    df = load_table(spark, sf_dir, table)
    _roundtrip(spark, df, str(tmp_path / f"{table}_{fmt}"), fmt)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json"])
def test_nested_embeddings_roundtrip(spark, sf_dir, tmp_path, fmt):
    # array<float> column: legal everywhere except CSV.
    df = load_table(spark, sf_dir, "embeddings")
    _roundtrip(spark, df, str(tmp_path / f"emb_{fmt}"), fmt)


def test_csv_rejects_nested_columns(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="nested"):
        write_interchange(df, str(tmp_path / "emb_csv"), "csv")


def test_csv_roundtrips_nulls_and_empty_strings_distinctly(spark, tmp_path):
    # NULL and '' survive as distinct values (the nullValue token makes
    # the empty field unambiguous). A data value EQUAL to the null
    # token is inherently unrepresentable in CSV — the token must be
    # chosen outside the data domain, which is why it is \\N and not ''.
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")],
        schema="id long, s string",
    )
    _roundtrip(spark, df, str(tmp_path / "nulls_csv"), "csv")


def test_failfast_rejects_malformed_csv(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text("id,ts\n1,not-a-timestamp\n")
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
        ]
    )
    with pytest.raises(Exception):
        read_interchange(spark, str(p), "csv", schema).collect()
