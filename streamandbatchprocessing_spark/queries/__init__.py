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
#: entries of ``queries()`` in insertion order, so the window must hold
#: every query family: the §2.10 parity analyses (a01–a09), the full
#: LLM-data-pipeline surface (c/d/e/f/m/p), and 13 b/g representatives
#: that keep each remaining §2 operator class in-window (scan-agg, star
#: join, as-of, salting, cube, semi/anti, pagination, percentiles,
#: lag/lead, grouping sets, JSON, SQL interface). The rotated-out b/g
#: queries stay registered after slot 50 — they were driver-verified
#: green in rounds 1–2 and keep their local oracle tests.
PRIORITY_ORDER: tuple[str, ...] = (
    # §2.10 parity analyses
    "a01_revenue_by_category", "a02_type_category_grid", "a03_type_share",
    "a04_user_segmentation", "a05_anomaly_hotspots", "a06_hourly_trends",
    "a07_type_performance", "a08_user_velocity", "a09_dashboard_windows",
    # dedup family
    "c01_exact_dedup", "c02_minhash_lsh_pairs", "c03_simhash_neighbors",
    "c04_ngram_jaccard_pairs", "c05_embedding_neardup", "c06_hll_user_sketch",
    "c07_dup_clusters", "c08_candidate_verify",
    # similarity search
    "d01_topk_bruteforce", "d02_ivf_bucket_ann",
    "d03_topk_pandas_vectorized", "d04_ivf_kmeans_ann",
    # text analysis
    "e01_token_stats", "e02_quality_score", "e03_corpus_stats",
    "e04_fingerprints", "e05_bpe_token_counts", "e06_language_id",
    # streaming extensions
    "f01_streaming_dashboard", "f02_streaming_dedup", "f03_session_windows",
    "f04_stateful_user_totals", "f05_stream_stream_join",
    # multimodal + composed pipeline
    "m01_binary_payload_stats", "m02_payload_features_pandas",
    "m03_frame_sample_plan", "m04_resize_plan", "p01_training_mix",
    # b/g operator representatives (13 → window totals exactly 50)
    "b01_pricing_summary", "b03_regional_supplier_volume",
    "b09_order_page", "b11_asof_last_click", "b12_salted_segment_stats",
    "b16_returnflag_cube", "b21_large_volume_orders",
    "b22_idle_rich_customers", "g02_price_percentiles", "g04_order_gaps",
    "g09_multigrain_time_rollup", "g10_json_extraction", "g12_sql_interface",
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
