"""Multimodal plumbing tests: schemas, batch shapes, fan-out, stub gating.

The decode bodies are stubs (no codec libs in this image) — what these
tests pin is the REAL part: mapInPandas signatures, output schemas,
partition sizing, and that production mode fails loudly instead of faking.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_caterer_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synthesize_media_df(spark, n=90).cache()


def test_media_schema(media):
    assert media.schema == M.MEDIA_SCHEMA or [f.name for f in media.schema] == [
        "media_id", "kind", "mime", "n_bytes", "payload",
    ]
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_image_features_schema_and_rows(media):
    feats = M.decode_image_features(media)
    assert feats.columns == ["media_id", "width", "height", "channels", "mean_luma"]
    rows = feats.collect()
    assert len(rows) == media.where("kind = 'image'").count()
    for r in rows:
        assert r["width"] >= 16 and r["height"] >= 16
        assert 0.0 <= r["mean_luma"] <= 1.0


def test_image_features_deterministic(media):
    a = sorted(map(tuple, M.decode_image_features(media).collect()))
    b = sorted(map(tuple, M.decode_image_features(media).collect()))
    assert a == b


def test_audio_features(media):
    feats = M.decode_audio_features(media).collect()
    assert len(feats) == media.where("kind = 'audio'").count()
    for r in feats:
        assert r["duration_s"] == pytest.approx(r["n_samples"] / r["sample_rate"])


def test_video_frame_fanout(media):
    frames = M.sample_video_frames(media, every_n=30, max_frames=8)
    pdf = frames.toPandas()
    n_videos = media.where("kind = 'video'").count()
    assert pdf["media_id"].nunique() == n_videos
    per = pdf.groupby("media_id").size()
    assert (per >= 1).all() and (per <= 8).all()
    assert (pdf["frame_idx"] % 30 == 0).all()
    assert all(isinstance(b, (bytes, bytearray)) for b in pdf["frame_png"])


def test_raise_mode_fails_loudly(media):
    with pytest.raises(Exception) as ei:
        M.decode_image_features(media, mode=M.STUB_MODE_RAISE).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_media_repartition_targets_bytes(media):
    out = M.media_repartition(media, target_bytes_per_partition=16 * 1024)
    total = media.agg(F.sum("n_bytes")).first()[0]
    want = total // (16 * 1024) + 1
    assert out.rdd.getNumPartitions() == want
