"""Round-10 hardening invariants: the enforced emission bounds on the
output-bound pair dumps (c18 blocked fuzzy match, c20 containment
pairs) — the production lever the round-9 verdict asked for (the c04
stop-shingle precedent: a tested cap, not a docstring note).

Each capped build is ALSO strict-oracle-compared at a non-default cap
(the lever itself is verified against SQL, not just the deployed
default, which tests/test_queries_oracle.py already covers)."""

from __future__ import annotations

from collections import defaultdict

from streamandbatchprocessing_spark.queries.dedup import (
    _C20_TOPN,
    _FUZZY_TOPN,
    _c18_frame,
    _c18_oracle,
    _c20_frame,
    _containment_oracle,
)
from tests.oracle_harness import compare


# ---------------------------------------------------------------------------
# c18 — blocked fuzzy match emission bound
# ---------------------------------------------------------------------------
def test_c18_cap_keeps_best_n_per_left_record(spark, sf_dir):
    """The capped build must emit, per part_a, exactly the top-N rows
    of the UNCAPPED build under (edit_dist asc, part_b asc) — the cap
    is a best-first emission bound, never a sampling of matches."""
    uncapped = _c18_frame(spark, sf_dir, 0).collect()
    assert uncapped, "fixture produced no fuzzy matches"
    by_a = defaultdict(list)
    for r in uncapped:
        by_a[r["part_a"]].append(r)
    n = 3  # far below the fixture's densest block, so the cap bites
    expect = {
        (r["part_a"], r["part_b"])
        for rows in by_a.values()
        for r in sorted(rows, key=lambda r: (r["edit_dist"], r["part_b"]))[:n]
    }
    got = _c18_frame(spark, sf_dir, n).collect()
    assert {(r["part_a"], r["part_b"]) for r in got} == expect
    counts = defaultdict(int)
    for r in got:
        counts[r["part_a"]] += 1
    assert max(counts.values()) <= n
    assert any(len(v) > n for v in by_a.values()), (
        "cap never bit — lower n so the test exercises the bound"
    )


def test_c18_capped_variant_matches_oracle(spark, sf_dir):
    """The lever itself is SQL-verified: a non-default cap must still
    strict-match the capped oracle (QUALIFY row_number mirror)."""
    compare(
        spark, sf_dir, "c18_cap3",
        lambda s, d: _c18_frame(s, d, 3), _c18_oracle(3),
    )


def test_c18_cap_zero_disables(spark, sf_dir):
    """cap=0 must reproduce the historical unbounded pair set (and
    stay oracle-exact), so setting $SBP_C18_TOPN=0 restores the
    pre-round-10 output bit-for-bit."""
    compare(
        spark, sf_dir, "c18_uncapped",
        lambda s, d: _c18_frame(s, d, 0), _c18_oracle(0),
    )


def test_c18_deployed_default_is_bounded(spark, sf_dir):
    assert _FUZZY_TOPN > 0, (
        "the deployed c18 default must ENFORCE a bound (the round-9 "
        "verdict item); opt out per deployment via $SBP_C18_TOPN=0"
    )


# ---------------------------------------------------------------------------
# c20 — containment pairs emission bound
# ---------------------------------------------------------------------------
def test_c20_cap_keeps_strongest_n_per_doc(spark, sf_dir):
    """Per doc_a the capped build must keep the top-N qualifying pairs
    by (max one-sided containment desc, doc_b asc) of the uncapped
    build."""
    uncapped = _c20_frame(spark, sf_dir, 0).collect()
    assert uncapped, "fixture produced no containment pairs"
    by_a = defaultdict(list)
    for r in uncapped:
        by_a[r["doc_a"]].append(r)
    n = 2  # the fixture's dense corpus has far deeper groups
    expect = {
        (r["doc_a"], r["doc_b"])
        for rows in by_a.values()
        for r in sorted(
            rows,
            key=lambda r: (
                -max(r["containment_ab"], r["containment_ba"]),
                r["doc_b"],
            ),
        )[:n]
    }
    got = _c20_frame(spark, sf_dir, n).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in got} == expect
    counts = defaultdict(int)
    for r in got:
        counts[r["doc_a"]] += 1
    assert max(counts.values()) <= n
    assert any(len(v) > n for v in by_a.values()), (
        "cap never bit — lower n so the test exercises the bound"
    )


def test_c20_capped_variant_matches_oracle(spark, sf_dir):
    compare(
        spark, sf_dir, "c20_cap2",
        lambda s, d: _c20_frame(s, d, 2), _containment_oracle(2),
    )


def test_c20_cap_zero_disables(spark, sf_dir):
    compare(
        spark, sf_dir, "c20_uncapped",
        lambda s, d: _c20_frame(s, d, 0), _containment_oracle(0),
    )


def test_c20_deployed_default_is_bounded(spark, sf_dir):
    assert _C20_TOPN > 0, (
        "the deployed c20 default must ENFORCE a bound (the round-9 "
        "verdict item); opt out per deployment via $SBP_C20_TOPN=0"
    )
