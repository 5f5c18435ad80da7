"""Correctness-query inventory.

Every operator the engine claims (SURVEY.md §2 + the LLM-data-pipeline
extensions) is registered here as a ``(spark, sf_dir) -> DataFrame``
callable plus — wherever SQL-expressible — an equivalent ANSI-SQL oracle
string that DuckDB runs on the same parquet. The driver's correctness
gate compares the two (row count + schema + order-insensitive value
hash), so every computed column is aliased identically on both sides.

Import side effects register queries into ``registry.QUERIES`` /
``registry.ORACLES``.
"""

from . import analyses  # noqa: F401
from . import relational_ext  # noqa: F401
from . import tpch  # noqa: F401
from . import tpch_sub  # noqa: F401
from . import dedup  # noqa: F401
from . import multimodal_q  # noqa: F401
from . import pipeline  # noqa: F401
from . import similarity  # noqa: F401
from . import textops  # noqa: F401
from . import streaming  # noqa: F401
from . import layout  # noqa: F401
from .registry import ORACLES, QUERIES

#: Explicit scoring order. The external driver scores the FIRST 50
#: entries of ``queries()`` in insertion order. Rounds 1–2 greened
#: a01–a09 + b01–b29 + g01–g12; round 4 greened the full c/d/e/f/m/p
#: families + b30 (48 hash + c06/m02 rows-only). Round 5's window
#: swaps in every query without a driver verdict: c11_quantile_sketch
#: (upgraded from rows-only to a quantile_disc/cont oracle, dedup.py)
#: and g13_value_correlation (added post-rotation in round 4), plus
#: this round's new operators — e11_dsir_importance,
#: f10_streaming_quantiles, f11_lambda_unified_totals,
#: g14_conversion_funnel, g15_cohort_retention,
#: p09_quality_percentile_gate, b31_zorder_box_scan, e12_passage_dedup,
#: d08_label_centroids, g16_range_click_attribution,
#: g17_time_weighted_value, p10_weighted_sample, g18_session_stats,
#: d07_mmr_diversified_topk, m06_payload_dedup. Seventeen already-green
#: r04 entries rotate out to make room (p04, p05, p07, p08, e04, e05,
#: m03, m04, d02, d03, c08, c01, e01, m01, d01, p03, e02 — every
#: family keeps stronger in-window siblings).
#: After this round every registered query has a driver verdict.
#: Rotated-out queries stay registered after slot 50: each carries a
#: green CORRECTNESS row and keeps its local strict-oracle test, which
#: is bit-exact with the driver's compare.
#:
#: Mid-round-5 update: twelve operators added this round (c12 CMS heavy
#: hitters, c13 Bloom pre-screen, e13 bigram-LM scoring, e14 token
#: entropy, f12 full-outer stream-stream join, p11 column profiling,
#: b32 partition-pruned layout, g19 gap-fill interpolation, g20 SCD2
#: history, d09 ANN recall eval, g21 rolling z-score anomaly, b33
#: dynamic partition pruning) swap in for twelve r04-greened entries
#: (c03-c06, d05, d06, e03, e06-e09, p06 — each family
#: keeps in-window siblings and every rotated-out query keeps its
#: local strict-oracle test; c06's rows-only verdict and e09's hash
#: verdict both stand from r04).
#: Round-6 rotation (final): the twenty never-scored round-6 operators
#: (g22-g24, c14-c18, p12-p16, d10, d11, m07-m09, f13, e16) swap in for
#: eighteen r05-greened entries (g16-g21, c11-c13, e11, e13, e14, d08,
#: d09, f04, f05, p09, p10, b31, b32 — every family keeps stronger
#: in-window siblings and every rotated-out query keeps its local
#: strict-oracle test). m06 stays in: its r05 row was a
#: driver-canonicalization ERROR, fixed this round, and needs a hash
#: verdict.
PRIORITY_ORDER: tuple[str, ...] = (
    # §2.10 parity flagship (events-based)
    "a01_revenue_by_category",
    # dedup + sketches (c01/c03-c06/c11/c12/c13 rotated out green;
    # c02+c07 keep MinHash-LSH and canonicalization driver-covered;
    # c14 calibration + c15/c17 keep-best canonicals + c16 spectrum new)
    "c02_minhash_lsh_pairs",
    "c07_dup_clusters", "c09_semantic_dedup",
    "c10_incremental_neardup",
    "c14_minhash_calibration", "c15_band_canonical_keep_best",
    "c16_shingle_df_spectrum", "c17_cluster_canonical_keep_best",
    "c18_blocked_fuzzy_match",
    # similarity search (d01-d03/d05/d06/d09 rotated out green; d04
    # covers IVF, m02 keeps the Arrow path driver-covered; d10 mutual
    # k-NN graph new)
    "d04_ivf_kmeans_ann",
    "d07_mmr_diversified_topk",
    "d10_mutual_knn_graph",
    "d11_nprobe_recall_curve",
    # text analysis (e01-e09/e11/e13/e14 rotated out green; e16 Zipf
    # head new)
    "e10_pii_scrub", "e12_passage_dedup",
    "e16_zipf_head_profile",
    # streaming extensions (f13 streaming CMS new this round; f04/f05
    # rotate out green — f06/f08/f12 keep stateful + join coverage)
    "f01_streaming_dashboard", "f02_streaming_dedup", "f03_session_windows",
    "f06_idle_key_eviction", "f07_stream_static_enrichment",
    "f08_stream_left_outer_join", "f09_streaming_pii_scrub",
    "f10_streaming_quantiles", "f11_lambda_unified_totals",
    "f12_stream_full_outer_join", "f13_streaming_heavy_hitters",
    # multimodal (m01/m03/m04 rotated out green; m06 re-greens after
    # its round-5 canonicalization error; m07 audio chunking new)
    "m02_payload_features_pandas",
    "m05_crossmodal_join", "m06_payload_dedup", "m07_audio_chunk_plan",
    "m08_image_tile_plan", "m09_modality_manifest",
    # composed pipelines (p03/p04/p05/p07/p08 rotated out green;
    # p12 approx-profile twin, p13 curriculum, p14 skew report new)
    "p01_training_mix", "p02_streaming_ingest_funnel",
    "p11_column_profile", "p12_column_profile_at_scale",
    "p13_curriculum_buckets", "p14_skew_report",
    "p15_source_mix_drift", "p16_budget_apportionment",
    # physical layout (b31/b32 rotated out green; b30 bucketed + b33
    # DPP keep the layout family driver-covered)
    "b30_bucketed_colocated_join", "b33_dynamic_partition_prune",
    # cross-series analytics (g16-g21 rotated out green; g22 Markov
    # transitions + g23 snapshot diff new)
    "g13_value_correlation", "g14_conversion_funnel",
    "g15_cohort_retention",
    "g22_event_transitions", "g23_snapshot_diff",
    "g24_interval_coalesce",
)


def _reorder() -> None:
    """Rebuild the registry dicts IN PLACE (consumers hold references):
    priority names first, everything else in original insertion order."""
    missing = [n for n in PRIORITY_ORDER if n not in QUERIES]
    if missing:
        raise RuntimeError(f"PRIORITY_ORDER names not registered: {missing}")
    rest = [n for n in QUERIES if n not in PRIORITY_ORDER]
    ordered = [*PRIORITY_ORDER, *rest]
    for registry_dict in (QUERIES, ORACLES):
        snapshot = dict(registry_dict)
        registry_dict.clear()
        registry_dict.update(
            (n, snapshot[n]) for n in ordered if n in snapshot
        )


_reorder()

__all__ = ["QUERIES", "ORACLES", "PRIORITY_ORDER"]
