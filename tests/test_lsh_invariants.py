"""Property-based invariants for the LSH candidate generators.

The band/block-exclusivity join conditions (c02/c03/c07/c08) replace a
pair-level ``distinct`` shuffle; their correctness rests on two
properties that must hold for EVERY signature distribution:

  1. completeness — every ordered pair sharing at least one full band
     is emitted;
  2. exclusivity — no pair is emitted by two different bands (the union
     is disjoint, so UNION ALL needs no dedup).

Hypothesis explores adversarial signature distributions (heavy
duplication, near-misses) against a pure-Python evaluation of the same
conditions the SQL/Spark expressions encode.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from streamandbatchprocessing_spark.queries.dedup import (
    _BANDS,
    _ROWS_PER_BAND,
    _SIM_BLOCK_BITS,
    _SIM_BLOCK_MASK,
    _SIM_BLOCKS,
)

# Small value domain → lots of accidental band collisions.
_sig = st.lists(st.integers(0, 3), min_size=_BANDS * _ROWS_PER_BAND,
                max_size=_BANDS * _ROWS_PER_BAND)


def _band_eq(a, b, band):
    lo, hi = band * _ROWS_PER_BAND, (band + 1) * _ROWS_PER_BAND
    return a[lo:hi] == b[lo:hi]


def _emitted_by(a, b, band):
    """Python mirror of the band-b join condition built in _band_pairs."""
    if not _band_eq(a, b, band):
        return False
    return not any(_band_eq(a, b, k) for k in range(band))


@settings(max_examples=200)
@given(st.lists(_sig, min_size=2, max_size=8))
def test_band_exclusivity_complete_and_disjoint(sigs):
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            a, b = sigs[i], sigs[j]
            emitting = [band for band in range(_BANDS) if _emitted_by(a, b, band)]
            shares_a_band = any(_band_eq(a, b, k) for k in range(_BANDS))
            if shares_a_band:
                assert len(emitting) == 1, (a, b, emitting)
            else:
                assert emitting == []


def _block(v, j):
    return (v >> (j * _SIM_BLOCK_BITS)) & _SIM_BLOCK_MASK


def _sim_emitted_by(a, b, j):
    if _block(a, j) != _block(b, j):
        return False
    return not any(_block(a, k) == _block(b, k) for k in range(j))


@settings(max_examples=200)
@given(st.lists(st.integers(0, 2**32 - 1), min_size=2, max_size=10))
def test_simhash_block_exclusivity(fps):
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            a, b = fps[i], fps[j]
            emitting = [k for k in range(_SIM_BLOCKS) if _sim_emitted_by(a, b, k)]
            shares = any(_block(a, k) == _block(b, k) for k in range(_SIM_BLOCKS))
            assert len(emitting) == (1 if shares else 0), (a, b, emitting)


@settings(max_examples=200)
@given(st.integers(0, 2**32 - 1), st.integers(0, 6))
def test_hamming_le_block_count_minus_one_always_shares_a_block(fp, ham):
    """Pigeonhole guarantee: flipping ≤ _SIM_BLOCKS-1 bits cannot touch
    every block, so such pairs always share one (detection is exact for
    hamming ≤ 3 with 4 blocks)."""
    import random

    rng = random.Random(fp ^ ham)
    flipped = fp
    for _ in range(min(ham, _SIM_BLOCKS - 1)):
        flipped ^= 1 << rng.randrange(32)
    assert any(_block(fp, k) == _block(flipped, k) for k in range(_SIM_BLOCKS))


def test_token_hash_injective_on_fixture_vocab(spark, sf_dir):
    """shared_toksets stores xxhash64(token) instead of token strings —
    set SIZES (all the exact jaccard/containment measures read) are
    preserved iff the hash is injective on the corpus vocabulary. Pin
    that corpus-wide: distinct tokens == distinct token hashes. A
    collision would silently shrink an intersection; this test is the
    alarm (and the oracles intersect raw strings, so the driver's hash
    compare cross-checks every round at sf0.01 too)."""
    from pyspark.sql import functions as F

    from streamandbatchprocessing_spark.sources.batch import load_table

    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    row = tok.agg(
        F.countDistinct("tok").alias("n_tok"),
        F.countDistinct(F.xxhash64("tok")).alias("n_hash"),
    ).first()
    assert row.n_tok == row.n_hash, (row.n_tok, row.n_hash)


def test_tokset_injectivity_runtime_guard(spark, sf_dir, monkeypatch):
    """shared_toksets grows an OPT-IN runtime audit for corpora with no
    oracle cross-check (SBP_VERIFY_TOKEN_HASH_INJECTIVITY=1): the build
    runs countDistinct(token) == countDistinct(xxhash64(token)) once
    and raises on any collision. Pin both paths: the fixture vocabulary
    passes the audit, and a colliding mapping (forced by patching the
    hash to a constant) raises instead of silently shrinking set
    intersections."""
    import pytest
    from pyspark.sql import functions as F

    from streamandbatchprocessing_spark.queries import dedup
    from streamandbatchprocessing_spark.queries.registry import (
        release_session_artifacts,
    )

    monkeypatch.setenv("SBP_VERIFY_TOKEN_HASH_INJECTIVITY", "1")
    release_session_artifacts()
    try:
        assert dedup.shared_toksets(spark, sf_dir).count() > 0

        release_session_artifacts()
        monkeypatch.setattr(
            dedup.F, "xxhash64", lambda c: F.lit(1).cast("bigint")
        )
        with pytest.raises(RuntimeError, match="collided"):
            dedup.shared_toksets(spark, sf_dir)
    finally:
        release_session_artifacts()
