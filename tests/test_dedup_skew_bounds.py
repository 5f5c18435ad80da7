"""Scale-skew guards for the dedup family (round-2 verdict items).

c04: a high-document-frequency "stop shingle" (boilerplate text) must
not expand into k²/2 candidate pairs — postings above ``_MAX_SHINGLE_DF``
are pruned on BOTH engines, trading bounded recall for bounded cost.

c05: the near-dup bucket key must come from the VECTOR (sign-hyperplane
bands), never a data column — a dominant ``label`` must not recreate the
per-bucket quadratic the way round 2's label-bucketing did.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from streamandbatchprocessing_spark.queries.dedup import (
    _MAX_SHINGLE_DF,
    c04_ngram_jaccard_pairs,
    c05_embedding_neardup,
)


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def _write_embeddings(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    pdf["label"] = pdf["label"].astype("int32")
    pdf.to_parquet(tmp_path / "embeddings.parquet", index=False)
    return str(tmp_path)


def test_c04_stop_shingle_posting_is_pruned(spark, tmp_path):
    # 80 docs all containing the same boilerplate phrase (> _MAX_SHINGLE_DF
    # postings) but otherwise disjoint vocabulary. Uncapped, the two
    # boilerplate shingles alone would emit 2 × 80·79/2 pair expansions
    # and every pair would clear the 0.01 jaccard floor. Capped: zero.
    assert _MAX_SHINGLE_DF < 80
    boiler = "terms of service apply"
    rows = [
        (i, f"u{i}x u{i}y u{i}z u{i}w {boiler}", "en", "web", 40)
        for i in range(80)
    ]
    # Plus one genuinely-near-dup pair sharing many RARE shingles — must
    # survive pruning (their shared shingles have DF = 2).
    rare = "quantum lattice harmonic resonance cascade filter prism vector"
    rows += [
        (200, rare + " left", "en", "web", 60),
        (201, rare + " right", "en", "web", 60),
    ]
    sf = _write_docs(tmp_path, rows)
    got = c04_ngram_jaccard_pairs(spark, sf).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    assert (200, 201) in pairs, "rare-shingle near-dup lost to pruning"
    boiler_pairs = [p for p in pairs if p[0] < 80 and p[1] < 80]
    assert boiler_pairs == [], (
        f"stop-shingle posting expanded into {len(boiler_pairs)} pairs"
    )


def test_c05_dominant_label_does_not_go_quadratic(spark, tmp_path):
    # Every vector shares ONE label (the dominant-bucket worst case for
    # label-bucketing) but sign patterns on dims 1–8 are spread across
    # cells, so sign-band bucketing materializes far fewer than n²/2
    # candidates. Verified through the output: only same-cell pairs can
    # appear, and the planted near-identical pair must be found.
    rng = np.random.default_rng(7)
    rows = []
    for i in range(60):
        v = rng.normal(size=16).astype("float32")
        # force a diverse sign pattern on the banded dims
        for d in range(8):
            v[d] = abs(v[d]) * (1.0 if (i >> (d % 6)) & 1 else -1.0)
        rows.append((i, v.tolist(), 0))
    base = rng.normal(size=16).astype("float32")
    rows.append((100, base.tolist(), 0))
    rows.append((101, (base * 1.01).astype("float32").tolist(), 0))
    sf = _write_embeddings(tmp_path, rows)
    got = c05_embedding_neardup(spark, sf).collect()
    pairs = {(r["vec_a"], r["vec_b"]) for r in got}
    assert (100, 101) in pairs, "near-identical pair missed by sign bands"
    # With 62 vectors in ONE label, label-bucketing would have scored all
    # 62·61/2 = 1891 pairs; sign-banding must score only same-cell ones.
    n = len(pairs)
    assert n < 400, f"pair volume looks quadratic despite sign bands: {n}"
    # label survives as an output column
    assert all(r["label"] == 0 for r in got)
