"""Multimodal plumbing tests: binary payload columns through
mapInPandas feature extraction, metadata-only resize planning, and
frame-sample explosion — all deterministic, no codec libs needed."""

from __future__ import annotations

import hashlib
import struct

import pytest

from streamandbatchprocessing_spark.operators.multimodal import (
    _MAGIC,
    _decode_payload,
    extract_features,
    resize_metadata,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synthesize_media(spark, 120)
    df.cache().count()
    yield df
    df.unpersist()


def test_synthesize_schema_and_determinism(spark, media):
    assert media.count() == 120
    again = synthesize_media(spark, 120)
    a = {r.media_id: bytes(r.payload) for r in media.collect()}
    b = {r.media_id: bytes(r.payload) for r in again.collect()}
    assert a == b


def test_extract_features_matches_local_compute(media):
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert len(feats) == 120
    for row in media.collect():
        payload = bytes(row.payload)
        got = feats[row.media_id]
        assert got.n_bytes == len(payload)
        assert got.sha256_head == hashlib.sha256(payload).hexdigest()[:16]
        assert got.byte_mean == pytest.approx(sum(payload) / len(payload))
        # header decodes through the stub
        width, height, _ = struct.unpack("<iii", payload[4:16])
        assert got.decoded_width == width
        assert got.decoded_height == height


def test_decode_stub_rejects_unknown_format():
    with pytest.raises(NotImplementedError, match="Pillow/ffmpeg"):
        _decode_payload(b"\x89PNG-but-not-really" + b"\x00" * 32)
    assert _decode_payload(_MAGIC + struct.pack("<iii", 10, 20, 0)) == (10, 20)


def test_resize_preserves_aspect_ratio(media):
    resized = {r.media_id: r for r in resize_metadata(media, max_dim=128).collect()}
    for row in media.collect():
        got = resized[row.media_id]
        if row.width is None:
            assert got.target_width is None
            continue
        assert max(got.target_width, got.target_height) <= 128
        if max(row.width, row.height) <= 128:
            assert (got.target_width, got.target_height) == (row.width, row.height)
        else:  # ceil keeps within one pixel of exact aspect
            ratio = row.width / row.height
            new_ratio = got.target_width / got.target_height
            assert abs(ratio - new_ratio) < 0.1


def test_sample_frames_counts(media):
    frames = sample_frames(media, every_ms=1000)
    rows = frames.collect()
    assert all(r.frame_ts_ms % 1000 == 0 for r in rows)
    per_media = {}
    for r in rows:
        per_media.setdefault(r.media_id, []).append(r)
    for row in media.filter("kind = 'video'").collect():
        expected = row.duration_ms // 1000 + 1
        assert len(per_media[row.media_id]) == expected


def test_payload_pruned_for_metadata_only_plan(spark, media, tmp_path):
    # resize_metadata never references payload — confirm the physical
    # parquet scan prunes the binary column (ReadSchema excludes it).
    path = str(tmp_path / "media.parquet")
    media.write.parquet(path)
    on_disk = spark.read.parquet(path)
    plan = (
        resize_metadata(on_disk)._jdf.queryExecution().executedPlan().toString()
    )
    read_schema = [
        ln.split("ReadSchema:", 1)[1] for ln in plan.splitlines() if "ReadSchema:" in ln
    ]
    assert read_schema, plan
    assert "payload" not in read_schema[0]
    assert "width" in read_schema[0]
