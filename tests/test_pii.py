"""PII scrub: the email/phone/IPv4 classes the fixtures can't exercise
are pinned here on synthetic rows, cross-checked against the DuckDB
form of the same patterns (the oracle builders), and the class-masking
order is proven non-double-counting."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from streamandbatchprocessing_spark.functions.pii import (
    PII_PATTERNS,
    oracle_pii_count,
    oracle_scrub,
    pii_count,
    scrub,
)

ROWS = [
    ("reach me at jo.ann+spam@example.co.uk or +1 (303) 555-0142", 1, 1, 0, 0),
    ("server 10.0.255.3 answered; backup at 192.168.1.1", 0, 0, 2, 0),
    ("order 12345 shipped 2024 units to dock 7", 0, 0, 0, 2),
    ("a@b.io mailed 10.1.2.3 about +44 20 7946 0958 and invoice 99", 1, 1, 1, 1),
    ("no identifiers here at all", 0, 0, 0, 0),
    # the email's digits/dots must NOT leak into ipv4/number counts
    ("contact 123.456@corp.example.com today", 1, 0, 0, 0),
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(ROWS)], "id long, txt string"
    )


def test_counts_per_class(spark, pii_df):
    got = (
        pii_df.select(
            "id",
            pii_count(F.col("txt"), "email").alias("e"),
            pii_count(F.col("txt"), "phone").alias("p"),
            pii_count(F.col("txt"), "ipv4").alias("i"),
            pii_count(F.col("txt"), "number").alias("n"),
        )
        .orderBy("id")
        .collect()
    )
    for row, (_, e, p, i, n) in zip(got, ROWS):
        assert (row["e"], row["p"], row["i"], row["n"]) == (e, p, i, n), row


def test_scrub_redacts_every_class(spark, pii_df):
    got = pii_df.select("id", scrub(F.col("txt")).alias("s")).orderBy("id").collect()
    s = {r["id"]: r["s"] for r in got}
    assert s[0] == "reach me at <EMAIL> or <PHONE>"
    assert s[1] == "server <IP> answered; backup at <IP>"
    assert s[2] == "order <NUM> shipped <NUM> units to dock 7"
    assert s[3] == "<EMAIL> mailed <IP> about <PHONE> and invoice <NUM>"
    assert s[4] == "no identifiers here at all"
    assert s[5] == "contact <EMAIL> today"


def _duck_pii_rows(texts):
    """All PII oracle expressions over ``texts`` in ONE set-based DuckDB
    query (not a per-row loop); connection closed deterministically."""
    import pandas as pd

    sel = ", ".join(
        [oracle_pii_count("txt", n) + f" AS {n}" for n, _, _ in PII_PATTERNS]
        + [oracle_scrub("txt") + " AS s"]
    )
    rel = pd.DataFrame({"id": range(len(texts)), "txt": texts})
    con = duckdb.connect()
    try:
        con.register("pii_rows", rel)
        return con.execute(
            f"SELECT {sel} FROM pii_rows ORDER BY id"
        ).fetchall()
    finally:
        con.close()


def test_oracle_builders_match_spark(spark, pii_df):
    """The DuckDB expressions the e10 oracle is built from must compute
    the same counts and redactions as the Spark expressions — on text
    richer than the fixture's."""
    duck = _duck_pii_rows([t for t, *_ in ROWS])
    spark_rows = (
        pii_df.select(
            "id",
            *[pii_count(F.col("txt"), n).alias(n) for n, _, _ in PII_PATTERNS],
            scrub(F.col("txt")).alias("s"),
        )
        .orderBy("id")
        .collect()
    )
    for srow, drow in zip(spark_rows, duck):
        assert tuple(srow)[1:] == drow


def test_masking_order_prevents_double_count(spark):
    # A phone number contains digit runs; the number class must see the
    # placeholder, not the digits.
    df = spark.createDataFrame([("call +1 (303) 555-0142 now",)], "txt string")
    row = df.select(
        pii_count(F.col("txt"), "phone").alias("p"),
        pii_count(F.col("txt"), "number").alias("n"),
    ).first()
    assert row["p"] == 1
    assert row["n"] == 0


def _adversarial_corpus(n=200, seed=7):
    """Deterministic mixed corpus: words, emails, phones, IPs, numbers,
    and near-miss shapes (trailing dots, short digit runs, bare @)."""
    import random

    rng = random.Random(seed)
    words = ["alpha", "beta", "data", "x", "spark.", "a@b", "v2", "10.", "+",
             "end"]
    pieces = [
        lambda: rng.choice(words),
        lambda: f"{rng.choice(['jo', 'a.b', 'x_9'])}@{rng.choice(['ex.com', 'a.co.uk', 'm.io'])}",
        lambda: "+%d %d%d%d-%d" % (rng.randint(1, 99), rng.randint(10, 99),
                                   rng.randint(10, 99), rng.randint(10, 99),
                                   rng.randint(1000, 9999)),
        lambda: ".".join(str(rng.randint(0, 255)) for _ in range(4)),
        lambda: str(rng.randint(0, 10**rng.randint(1, 9))),
    ]
    out = []
    for _ in range(n):
        k = rng.randint(0, 8)
        out.append(" ".join(rng.choice(pieces)() for _ in range(k)))
    return out


def test_scrub_is_idempotent_and_complete(spark):
    """One scrub pass must leave NOTHING for a second pass: every class
    count on scrubbed text is zero (the placeholders contain no digits,
    dots-between-digits, or '@'), and scrub(scrub(x)) == scrub(x).
    This is the guarantee that lets a 100-TB pipeline run the scrub
    exactly once."""
    corpus = _adversarial_corpus()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "id long, txt string"
    )
    once = df.select("id", scrub(F.col("txt")).alias("s1"))
    twice = once.select(
        "id",
        "s1",
        scrub(F.col("s1")).alias("s2"),
        *[pii_count(F.col("s1"), n).alias(n) for n, _, _ in PII_PATTERNS],
    )
    bad = twice.filter(
        (F.col("s1") != F.col("s2"))
        | sum((F.col(n) != 0).cast("int") for n, _, _ in PII_PATTERNS).cast(
            "boolean"
        )
    ).collect()
    assert not bad, bad[:5]


def test_oracle_equivalence_on_adversarial_corpus(spark):
    """Spark and DuckDB must agree on counts AND redacted text across
    the generated corpus — the engine-parity pin for text the fixture
    never produces."""
    corpus = _adversarial_corpus()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "id long, txt string"
    )
    spark_rows = (
        df.select(
            "id",
            *[pii_count(F.col("txt"), n).alias(n) for n, _, _ in PII_PATTERNS],
            scrub(F.col("txt")).alias("s"),
        )
        .orderBy("id")
        .collect()
    )
    duck = _duck_pii_rows(corpus)
    for srow, drow, txt in zip(spark_rows, duck, corpus):
        assert tuple(srow)[1:] == drow, (txt, tuple(srow)[1:], drow)
