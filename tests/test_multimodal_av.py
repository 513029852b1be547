"""Video frame-sampling and audio feature-extraction kernels: codec
round-trips (pure numpy) plus the Spark plumbing (schema, batching,
determinism across partition counts)."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_service_spark.kernels.media import (
    decode_saud,
    decode_svid,
    encode_saud,
    encode_svid,
)


def test_svid_roundtrip():
    frames = np.arange(2 * 4 * 5, dtype=np.uint8).reshape(2, 4, 5)
    blob = encode_svid({"n_frames": 2, "h": 4, "w": 5, "fps": 4}, frames)
    meta, out = decode_svid(blob)
    assert meta["fps"] == 4
    assert np.array_equal(out, frames)


def test_saud_roundtrip():
    s = (np.sin(np.linspace(0, 6, 100)) * 1000).astype(np.int16)
    blob = encode_saud({"sr": 8000, "n": 100}, s)
    meta, out = decode_saud(blob)
    assert meta["sr"] == 8000
    assert np.array_equal(out, s)


def test_decode_rejects_wrong_magic():
    with pytest.raises(ValueError):
        decode_svid(b"nope")
    with pytest.raises(ValueError):
        decode_saud(b"nope")


@pytest.fixture(scope="module")
def spark():
    from ocr_service_spark.session import get_spark

    return get_spark(app_name="test-av", master="local[4]")


def test_video_frame_sample_spark(spark):
    from ocr_service_spark.ops.multimodal import (
        FRAME_STRIDE,
        synthetic_videos,
        video_frame_sample,
    )

    vids = synthetic_videos(spark, n=12)
    frames = video_frame_sample(vids).collect()
    n_frames = {r["media_ref"]: r["n_frames"] for r in vids.collect()}
    assert len(n_frames) == 12
    by_ref: dict[str, list] = {}
    for r in frames:
        by_ref.setdefault(r["media_ref"], []).append(r)
    for ref, rows in by_ref.items():
        expected = list(range(0, n_frames[ref], FRAME_STRIDE))
        assert sorted(r["frame_idx"] for r in rows) == expected
        assert all(r["frame_md5"] and r["mean_brightness"] is not None for r in rows)


def test_audio_features_spark(spark):
    from ocr_service_spark.ops.multimodal import audio_features, synthetic_audio

    feats = audio_features(synthetic_audio(spark, n=16)).collect()
    assert len(feats) == 16
    for r in feats:
        assert 0.05 < r["duration_sec"] <= 3.0
        assert 0.2 < r["rms"] < 0.5  # 0.5-amplitude sine → rms ≈ 0.35
        assert 0.0 < r["zero_crossing_rate"] < 0.5


def test_av_determinism_across_parallelism(spark):
    """Same synthetic ids → identical feature rows regardless of partition
    count (the SURVEY §5.5 property, applied to the AV path)."""
    from ocr_service_spark.ops.multimodal import audio_features, synthetic_audio

    a = sorted(map(tuple, audio_features(synthetic_audio(spark, n=8)).collect()))
    b = sorted(
        map(
            tuple,
            audio_features(synthetic_audio(spark, n=8).repartition(7)).collect(),
        )
    )
    assert a == b


def test_phash_dedup_finds_planted_duplicates(spark):
    """Exact duplicate images share the full dHash (all 4 bands); a
    near-duplicate differing by a small local edit still lands in most
    bands; an unrelated image stays isolated."""
    from ocr_service_spark.kernels.media import encode_simg
    from ocr_service_spark.ops.multimodal import dhash_pixels, media_phash_dedup

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(32, 40), dtype=np.uint8)
    near = base.copy()
    near[4, 5] = 255 - near[4, 5]  # one-pixel edit
    other = rng.integers(0, 256, size=(32, 40), dtype=np.uint8)
    blobs = [
        ("mem://p/a", encode_simg({"w": 40, "h": 32, "quad": None, "lines": [], "conf": {}}, base)),
        ("mem://p/b", encode_simg({"w": 40, "h": 32, "quad": None, "lines": [], "conf": {}}, base)),
        ("mem://p/c", encode_simg({"w": 40, "h": 32, "quad": None, "lines": [], "conf": {}}, near)),
        ("mem://p/d", encode_simg({"w": 40, "h": 32, "quad": None, "lines": [], "conf": {}}, other)),
    ]
    media = spark.createDataFrame(blobs, "media_ref string, content binary")
    rows = {r["media_ref"]: r for r in media_phash_dedup(media).collect()}
    # exact dup: identical hash, each sees the other in all 4 bands
    assert rows["mem://p/a"]["dhash"] == rows["mem://p/b"]["dhash"] == dhash_pixels(base)
    assert rows["mem://p/a"]["n_band_neighbors"] >= 4
    # near dup: a one-pixel edit can flip at most a couple of bands, so
    # it still shares bands with the originals
    assert rows["mem://p/c"]["n_band_neighbors"] >= 2
    # unrelated random image matches nothing
    assert rows["mem://p/d"]["n_band_neighbors"] == 0
