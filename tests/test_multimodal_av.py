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
