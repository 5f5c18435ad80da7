"""Round-7 operator tests: data-derived scale knobs (d10 bucket bits,
c18 composite blocking key) plus the new round-7 operators."""

from __future__ import annotations

import duckdb
import pytest

from streamandbatchprocessing_spark.functions.vectors import (
    sign_bits_for,
    sign_bits_sql,
)


def test_sign_bits_for_holds_cell_population_flat():
    """The derived width must be the smallest bits in [4, 16] with
    2^bits * target >= n — so average per-cell population never
    exceeds the target until the cap."""
    assert sign_bits_for(0) == 4
    assert sign_bits_for(1) == 4
    # Exactly at the boundary: 16 cells * 256 = 4096 fits in 4 bits.
    assert sign_bits_for(16 * 256) == 4
    assert sign_bits_for(16 * 256 + 1) == 5
    assert sign_bits_for(1_000_000) == 12
    # Cap: beyond 2^16 * 256 the width saturates at 16 bits.
    assert sign_bits_for(2 ** 16 * 256) == 16
    assert sign_bits_for(10 ** 12) == 16
    # Monotone non-decreasing in n.
    widths = [sign_bits_for(n) for n in range(0, 3_000_000, 97_651)]
    assert widths == sorted(widths)
    for n in (500, 2_000, 4_096, 4_097, 123_456):
        bits = sign_bits_for(n)
        if bits > 4:
            assert (1 << (bits - 1)) * 256 < n  # minimality
        if bits < 16:
            assert (1 << bits) * 256 >= n  # sufficiency


@pytest.mark.parametrize(
    "n", [0, 1, 500, 2_000, 4_096, 4_097, 1_000_000, 20_000_000]
)
def test_sign_bits_sql_twin_matches_python(n):
    """The DuckDB derivation must be integer-identical to the Python
    one for every corpus size — both engines bucket the same way."""
    expr = sign_bits_sql(f"(SELECT * FROM range({n}))")
    got = duckdb.sql(f"SELECT {expr}").fetchone()[0]
    assert got == sign_bits_for(n)


def test_staged_stream_rejects_single_sentinel(spark, sf_dir):
    """With maxFilesPerTrigger=2 the data file and first sentinel share
    batch 1, so n_sentinels=1 would leave no flush batch for expired
    state — the builder must refuse it loudly, not withhold rows."""
    from streamandbatchprocessing_spark.streaming.pipeline import (
        events_stream_staged,
    )

    with pytest.raises(ValueError, match="n_sentinels >= 2"):
        events_stream_staged(spark, sf_dir, n_sentinels=1)


def test_staged_stream_rejects_directory_fixture(spark, tmp_path):
    """The staged batch accounting assumes ONE data file; a multi-part
    events.parquet directory must be rejected with a pointer to the
    unstaged path."""
    from streamandbatchprocessing_spark.streaming.pipeline import (
        events_stream_staged,
    )

    (tmp_path / "events.parquet").mkdir()
    with pytest.raises(ValueError, match="not a plain file"):
        events_stream_staged(spark, str(tmp_path))
