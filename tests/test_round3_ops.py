"""Cross-query invariants for the round-3 operators (e07, p03, p04,
c09, d05, f07) — properties the oracle compare cannot express because
they RELATE independent queries or columns (recall vs the exact
baseline, conservation laws, partition completeness).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamandbatchprocessing_spark.queries import QUERIES


def test_d05_quantized_topk_recall_vs_exact(spark, sf_dir):
    """SQ8's top-10 must substantially agree with the exact d01 top-10 —
    the measured recall cost of 8-bit quantization. Bound is
    deliberately conservative: the point is a regression tripwire (a
    broken quantizer scores ~1/corpus overlap), not a tight recall SLA."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["d01_topk_bruteforce"](spark, sf_dir).collect()
    }
    sq8 = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["d05_sq8_topk"](spark, sf_dir).collect()
    }
    assert len(sq8) == len(exact)
    recall = len(exact & sq8) / len(exact)
    assert recall >= 0.5, f"SQ8 recall collapsed: {recall:.2f}"


def test_c09_clusters_partition_the_corpus(spark, sf_dir):
    """Every vector lands in exactly one cluster and is either kept or
    dropped: Σ n_vecs = |embeddings| and n_kept + n_dropped = n_vecs."""
    from streamandbatchprocessing_spark.sources.batch import load_table

    rows = QUERIES["c09_semantic_dedup"](spark, sf_dir).collect()
    corpus = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == corpus
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_vecs"]
        assert r["n_kept"] >= 1  # min-id survivor: a cluster never empties


def test_p03_packing_conserves_tokens(spark, sf_dir):
    """Packing is a partition of the corpus: per source, sequence ids
    are contiguous from 0, and sequence token sums add up to the
    corpus's total token count (no doc lost, none double-packed)."""
    from streamandbatchprocessing_spark.sources.batch import load_table

    packed = QUERIES["p03_sequence_packing"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    totals = {
        r["source"]: (r["n"], r["toks"])
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size(F.split("text", " "))).alias("toks"),
        )
        .collect()
    }
    by_source: dict[str, list] = {}
    for r in packed:
        by_source.setdefault(r["source"], []).append(r)
    assert set(by_source) == set(totals)
    for source, rows in by_source.items():
        seq_ids = sorted(r["seq_id"] for r in rows)
        assert seq_ids == list(range(len(seq_ids)))  # contiguous from 0
        n_docs, n_tokens = totals[source]
        assert sum(r["n_docs"] for r in rows) == n_docs
        assert sum(r["seq_tokens"] for r in rows) == n_tokens


def test_p04_sample_rates_realized(spark, sf_dir):
    """Per-stratum realized rates must track the configured per-mille
    rate (loose tolerance — strata are small at test SFs) and sampled
    counts can never exceed totals."""
    rows = QUERIES["p04_stratified_sample"](spark, sf_dir).collect()
    assert rows, "no strata"
    for r in rows:
        assert 0 <= r["n_sampled"] <= r["n_total"]
        expected = r["rate_permille"] / 1000.0
        # binomial noise bound: generous 4σ + small-n slack
        n = r["n_total"]
        slack = 4 * (expected * (1 - expected) / n) ** 0.5 + 2.0 / n
        assert abs(r["realized_rate"] - expected) <= slack, (
            r["source"], r["realized_rate"], expected, slack)


def test_e07_bigram_count_identity(spark, sf_dir):
    """n_bigrams must equal n_tokens - 1 row by row (the two columns are
    computed by independent paths: a size() projection vs the exploded
    groupBy's SUM), and the flag must agree with its defining columns."""
    from streamandbatchprocessing_spark.queries.textops import (
        _DUP_TOKEN_MAX_FRAC,
        _TOP_BIGRAM_MAX_FRAC,
    )

    for r in QUERIES["e07_repetition_metrics"](spark, sf_dir).collect():
        assert r["n_bigrams"] == r["n_tokens"] - 1
        assert 1 <= r["top_bigram_n"] <= r["n_bigrams"]
        should_flag = (
            r["top_bigram_n"] / r["n_bigrams"] > _TOP_BIGRAM_MAX_FRAC
            or r["dup_token_frac"] > _DUP_TOKEN_MAX_FRAC
        )
        assert r["repetitive"] == should_flag


def test_e07_flags_repetitive_corpus_subset(spark, sf_dir):
    """The fixture's duplicate-heavy word-salad corpus must produce BOTH
    flagged and unflagged documents — a filter that flags everything (or
    nothing) is a broken quality gate."""
    flags = [
        r["repetitive"]
        for r in QUERIES["e07_repetition_metrics"](spark, sf_dir).collect()
    ]
    assert any(flags) and not all(flags)


def test_p06_contamination_bounds_and_panel(spark, sf_dir):
    """One row per eval-panel doc; hit counts bounded by gram counts;
    frac in [0, 1] and 0 exactly when nothing hit."""
    from streamandbatchprocessing_spark.queries.pipeline import _EVAL_N

    rows = QUERIES["p06_contamination_check"](spark, sf_dir).collect()
    assert len(rows) == _EVAL_N
    assert [r["eval_doc"] for r in rows] == sorted(r["eval_doc"] for r in rows)
    for r in rows:
        assert 0 <= r["n_hit_grams"] <= r["n_grams"]
        assert 0.0 <= r["contamination_frac"] <= 1.0
        if r["n_hit_grams"] == 0:
            assert r["contamination_frac"] == 0.0 and r["n_train_docs"] == 0
        else:
            assert r["n_train_docs"] >= 1


def test_e08_tfidf_topk_shape(spark, sf_dir):
    """Exactly TOPN ranked rows per source, rank dense from 1, scores
    non-increasing within a source (ties broken by term ascending)."""
    from streamandbatchprocessing_spark.queries.textops import _TFIDF_TOPN

    rows = QUERIES["e08_tfidf_terms"](spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        assert [r["rank"] for r in rs] == list(range(1, _TFIDF_TOPN + 1)), src
        for a, b in zip(rs, rs[1:]):
            assert a["score"] > b["score"] or (
                a["score"] == b["score"] and a["term"] < b["term"]
            ), src


def test_f08_outer_rows_complete_the_purchase_set(spark, sf_dir):
    """The left-outer stream join must emit EVERY purchase exactly once
    per qualifying click (or once with a null click): its purchase_id
    multiset equals the inner join's (f05) plus one null row for each
    purchase f05 left unmatched — proving the watermark flush released
    the entire withheld tail."""
    outer = QUERIES["f08_stream_left_outer_join"](spark, sf_dir).collect()
    inner = QUERIES["f05_stream_stream_join"](spark, sf_dir).collect()
    from streamandbatchprocessing_spark.sources.batch import load_table

    purchases = {
        r["event_id"]
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id")
        .collect()
    }
    assert {r["purchase_id"] for r in outer} == purchases
    matched_outer = [r for r in outer if r["click_id"] is not None]
    null_outer = [r for r in outer if r["click_id"] is None]
    inner_pairs = {(r["purchase_id"], r["click_id"]) for r in inner}
    assert {(r["purchase_id"], r["click_id"]) for r in matched_outer} == inner_pairs
    assert {r["purchase_id"] for r in null_outer} == purchases - {
        p for p, _ in inner_pairs
    }


def test_d06_pq_recall_vs_exact(spark, sf_dir):
    """PQ+ADC top-10 must overlap the exact d01 top-10 well above the
    random floor — regression tripwire for the encode/LUT pipeline (a
    scrambled codebook or off-by-one LUT index scores ~10/corpus)."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["d01_topk_bruteforce"](spark, sf_dir).collect()
    }
    pq = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["d06_pq_adc_topk"](spark, sf_dir).collect()
    }
    assert len(pq) == len(exact)
    recall = len(exact & pq) / len(exact)
    assert recall >= 0.2, f"PQ recall collapsed: {recall:.2f}"
