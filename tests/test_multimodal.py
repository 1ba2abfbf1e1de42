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


# --------------------------------------------------------------------------
# REAL codecs (operators/mediacodec.py): pure-numpy decode, no stub
# --------------------------------------------------------------------------

import numpy as np

from data_caterer_spark.operators import mediacodec as C


@pytest.fixture(scope="module")
def real_media(spark):
    return M.synthesize_real_media_df(spark, n=60).cache()


def test_codec_roundtrips():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (19, 27, 3)).astype(np.uint8)
    assert np.array_equal(C.decode_pnm(C.encode_ppm(img)), img)
    gray = img[:, :, 1]
    assert np.array_equal(C.decode_pnm(C.encode_ppm(gray)), gray)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img)), img)
    sr, pcm = C.decode_wav(C.encode_wav(np.sin(np.arange(500) / 9.0), 8000))
    assert sr == 8000 and pcm.shape == (500,)
    frames = [rng.randint(0, 256, (10, 14)).astype(np.uint8) for _ in range(4)]
    w, h, fps, out = C.decode_y4m(C.encode_y4m(frames, fps_num=25))
    assert (w, h, fps, len(out)) == (14, 10, 25, 4)
    assert all(np.array_equal(a, b) for a, b in zip(frames, out))


def test_codec_rejects_garbage():
    with pytest.raises(ValueError):
        C.decode_image(b"\x89PNG not supported")
    with pytest.raises(ValueError):
        C.decode_y4m(b"RIFF nope")


def test_real_image_decode_matches_sequential(real_media):
    rows = {
        r["media_id"]: r
        for r in M.decode_image_features(real_media, mode=M.MODE_REAL).collect()
    }
    checked = 0
    for media_id in range(0, 60, 3):
        kind, _, payload = C.synth_real_payload(media_id, 42)
        assert kind == "image"
        w, h, ch, luma = C.image_features(payload)
        r = rows[media_id]
        assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
        assert abs(r["mean_luma"] - luma) < 1e-12
        checked += 1
    assert checked == len(rows) == 20


def test_real_audio_decode_matches_sequential(real_media):
    rows = {
        r["media_id"]: r
        for r in M.decode_audio_features(real_media, mode=M.MODE_REAL).collect()
    }
    assert len(rows) == 20
    for media_id, r in rows.items():
        sr, ns, dur, rms = C.audio_features(
            C.synth_real_payload(media_id, 42)[2]
        )
        assert (r["sample_rate"], r["n_samples"]) == (sr, ns)
        assert abs(r["rms"] - rms) < 1e-12


def test_real_video_frame_sampling(real_media):
    frames = M.sample_video_frames(
        real_media, every_n=2, max_frames=4, mode=M.MODE_REAL
    ).collect()
    assert frames
    for r in frames:
        # sampled frames are REAL decodable PGM payloads
        img = C.decode_pnm(bytes(r["frame_png"]))
        assert img.ndim == 2 and img.size > 0
        assert r["frame_idx"] % 2 == 0
    stats = M.video_frame_stats(real_media, every_n=2, max_frames=4).collect()
    assert {(r["media_id"], r["frame_idx"]) for r in stats} == {
        (r["media_id"], r["frame_idx"]) for r in frames
    }


def test_resize_images_payloads(real_media):
    out = M.resize_images(real_media, out_w=8, out_h=6).collect()
    assert len(out) == 20
    for r in out:
        img = C.decode_pnm(bytes(r["payload"]))
        assert img.shape == (6, 8, 3)
        assert r["n_bytes"] == len(bytes(r["payload"]))


def test_resize_preserves_constant_image():
    flat = np.full((20, 30, 3), 77, dtype=np.uint8)
    resized = C.resize_nearest(flat, 9, 5)
    assert resized.shape == (5, 9, 3) and np.all(resized == 77)
    assert abs(C.mean_luma(flat) - 77 / 255.0) < 1e-12
