"""Multimodal column plumbing (decode is a documented stub; the Spark
schema/partitioning/Arrow paths are real)."""

from __future__ import annotations

import pytest

from churn_model_evaluation_platform_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    resize_stub,
    sample_frames,
)


@pytest.fixture
def media(spark):
    rows = [
        (1, "image", bytes([0, 32, 64, 96, 128, 160, 192, 224]), 8, 8, None, "png"),
        (2, "audio", b"\x00" * 100, None, None, 2000, "wav"),
        (3, "video", b"\xff" * 50, 640, 480, 10000, "mp4"),
        (4, "image", None, None, None, None, "png"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_shapes(media):
    out = extract_features(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 8
    # one byte in each of the 8 buckets → uniform histogram
    assert rows[1]["features"] == pytest.approx([0.125] * 8)
    assert rows[2]["byte_entropy"] == 0.0  # constant bytes
    assert rows[1]["byte_entropy"] == pytest.approx(3.0)  # 8 distinct bytes
    assert rows[4]["n_bytes"] == 0 and rows[4]["features"] == []


def test_resize_stub_restamps_metadata(media):
    out = resize_stub(media, 32, 32)
    assert out.schema == media.schema
    for r in out.collect():
        assert (r["width"], r["height"]) == (32, 32)


def test_sample_frames(media):
    frames = sample_frames(media, every_ms=2500).collect()
    # only the video row explodes: 10000ms / 2500ms → 4 frames
    assert len(frames) == 4
    assert [r["ts_ms"] for r in frames] == [0, 2500, 5000, 7500]
    assert {r["media_id"] for r in frames} == {3}
