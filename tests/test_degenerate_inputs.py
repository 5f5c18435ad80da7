"""Degenerate-input pins: zero-row and null-hostile fixtures.

At 100 TB, a query's input is routinely empty (partition pruning, a
selective predicate, a new tenant) and value columns carry NULL / ''
/ [] — regimes the non-degenerate sf fixtures never exercise. Round
12's sweep (scripts/degenerate_sweep.py) found 16 empty-input and 27
null-hostile defects across the registry; this module pins one
representative per ROOT CAUSE so none regresses silently. The full
212-query sweep on both fixtures is the gate-time check:

    python scripts/degenerate_sweep.py make
    python scripts/degenerate_sweep.py run empty
    python scripts/degenerate_sweep.py run hostile

Root causes pinned here (empty):
  * ANSI DIVIDE_BY_ZERO on zero-count denominators (try_divide)
  * Spark rollup/cube dropping ANSI's ()-grouping-set row
  * driver-collected artifacts (query panels, SQ scale, PQ codebook)
    assumed non-empty → IndexError / untypeable literal arrays
  * streaming sentinel staging int(None) on an empty source
  * partitioned write→read relying on schema inference over 0 files

Root causes pinned here (hostile):
  * NaN→astype(int64) garbage in pandas state functions (f04/f06)
  * sequence(a, b) DESCENDING when b < a (empty-text chunk/bigram)
  * ANSI element_at / CAST errors on short arrays & non-numeric text
  * Spark/DuckDB null-semantics divergences: concat vs concat_ws,
    least() null-skip, boolean-cast vs CASE, ASC null ordering,
    concat_ws('') erasing NULL-vs-empty, CASE NULL→ELSE in argmax
"""

from __future__ import annotations

import importlib.util
import os

import pytest

from .oracle_harness import compare

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "degenerate_sweep", os.path.join(REPO, "scripts", "degenerate_sweep.py")
)
_sweep = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_sweep)


@pytest.fixture(scope="session")
def degenerate_base(tmp_path_factory) -> str:
    base = str(tmp_path_factory.mktemp("degenerate"))
    _sweep.make_fixtures(base)
    return base


def _registry():
    import __spark_entry__ as entrymod

    return entrymod.queries(), entrymod.oracle_sql()


#: One representative query per empty-input root cause.
EMPTY_PINS = (
    "b07_priority_rollup",        # rollup () grouping set on empty
    "b16_returnflag_cube",        # cube () grouping set on empty
    "g35_purchase_frequency_curve",  # try_divide: zero buyer total
    "p11_column_profile",         # profile row-per-column contract
    "p19_dataset_card",           # try_divide: zero doc count
    "d03_topk_pandas_vectorized",  # empty collected query panel
    "d05_sq8_topk",               # empty per-dim scale stats
    "d06_pq_adc_topk",            # empty collected PQ codebook
    "d19_pq_code_utilization",    # grid survives empty corpus
    "f08_stream_left_outer_join",  # sentinel staging on empty source
    "b32_partition_pruned_scan",  # explicit-schema read of 0-file write
)

#: One representative query per null-hostile root cause.
HOSTILE_PINS = (
    "f04_stateful_user_totals",   # NaN→int64 state garbage; SUM skips NULL
    "f06_idle_key_eviction",      # sorted() over NULL types; distinct skips NULL
    "m02_payload_features_pandas",  # NULL binary payload in Arrow UDF
    "m10_chunk_dedup_profile",    # sequence(0,-1) descent on empty payload
    "e19_collocation_lift",       # toks[1] on single-token doc (ANSI)
    "c18_blocked_fuzzy_match",    # F.get blocking key on short names
    "c13_bloom_prefilter",        # NULL text must not hash-equal '' text
    "e06_language_id",            # NULL scores → 'und', not CASE→ELSE lang
    "e13_bigram_lm_scores",       # NULL token excluded from vocabulary
    "g08_part_name_features",     # concat_ws skip-NULL parity
    "g37_order_status_consistency",  # CASE→0, not NULL boolean cast
    "p04_stratified_sample",      # try_cast('') rate; when/otherwise sums
    "p13_curriculum_buckets",     # least() null-skip would fake phase 9
    "p16_budget_apportionment",   # ASC null ordering pinned NULLS FIRST
    "d22_nearest_centroid_confusion",  # argmin tie: non-null label wins
    "g17_time_weighted_value",    # zero-span integer DIV guard
)


@pytest.mark.parametrize("name", EMPTY_PINS)
def test_empty_input(spark, degenerate_base, name):
    queries, oracles = _registry()
    compare(
        spark, os.path.join(degenerate_base, "empty"),
        name, queries[name], oracles[name],
    )


#: Unicode-hostile pins: the two real divergences the sweep found,
#: plus the multibyte codepoint/byte-length paths worth watching.
UNICODE_PINS = (
    "g08_part_name_features",   # full-case ß→SS vs utf8proc ẞ (oracle pin)
    "c11_quantile_sketch",      # R-7 interpolation last-ulp (pround pin)
    "m01_binary_payload_stats",  # octet_length vs length on multibyte
    "m02_payload_features_pandas",  # UTF-8 byte features over 4-byte chars
    "e06_language_id",          # stopword argmax over CJK/RTL tokens
)


@pytest.mark.parametrize("name", UNICODE_PINS)
def test_unicode_input(spark, degenerate_base, name):
    queries, oracles = _registry()
    compare(
        spark, os.path.join(degenerate_base, "unicode"),
        name, queries[name], oracles[name],
    )


@pytest.mark.parametrize("name", HOSTILE_PINS)
def test_hostile_input(spark, degenerate_base, name):
    queries, oracles = _registry()
    compare(
        spark, os.path.join(degenerate_base, "hostile"),
        name, queries[name], oracles[name],
    )


def test_hostile_fixture_injects_nulls(degenerate_base):
    """The hostile fixture must actually be hostile: every non-key,
    non-structural column carries at least one NULL row (guards the
    generator against silently regressing into a copy of the head)."""
    import pyarrow.parquet as pq

    for t in _sweep.TABLES:
        tbl = pq.read_table(
            os.path.join(degenerate_base, "hostile", f"{t}.parquet")
        )
        for field in tbl.schema:
            if field.name in _sweep._KEY_COLS:
                assert tbl.column(field.name).null_count == 0, (
                    f"{t}.{field.name}: key/structural column must stay "
                    f"non-null (ingest contract)"
                )
            else:
                assert tbl.column(field.name).null_count > 0, (
                    f"{t}.{field.name}: hostile fixture lost its NULL "
                    f"injection"
                )


def test_empty_fixture_is_empty_and_schema_exact(degenerate_base):
    import pyarrow.parquet as pq

    for t in _sweep.TABLES:
        src = pq.read_schema(os.path.join(_sweep.SRC_SF, f"{t}.parquet"))
        got = pq.read_table(os.path.join(degenerate_base, "empty", f"{t}.parquet"))
        assert got.num_rows == 0
        assert got.schema.equals(src.remove_metadata()), f"{t}: schema drift"
