"""Multimodal column plumbing: image/audio/video as opaque ``binary``.

Decode is REAL for the codec-less public formats — PPM/PGM/BMP images,
PCM WAV audio, Y4M video — via the pure-numpy codecs in
:mod:`.mediacodec` (``mode='real'``); feature extraction, resize, and
frame sampling operate on actual pixels/samples.  Only entropy-coded
formats (JPEG/MP3/H.264) remain behind the clearly-marked
``NotImplementedError`` production hook (``mode='raise'``: swap in
PIL/ffmpeg there) or the deterministic fake (``mode='fake'``).  The
Spark side — schemas, Arrow batch shapes, ``mapInPandas`` signatures,
bytes-budget partitioning — is identical across all three modes.

Design rules for 100 TB of media:
* media rows are WIDE — ``maxRecordsPerBatch`` and
  ``files.maxPartitionBytes`` must be sized by bytes, not rows;
  :func:`media_repartition` targets a bytes-per-partition budget using
  the metadata length (no need to touch payloads to plan the shuffle).
* decode/extract runs in ``mapInPandas`` so one Python worker streams
  Arrow batches — per-batch vectorized work, never per-row Spark UDF calls.
* payload columns are dropped as early as the plan allows; features travel
  onward as compact typed columns.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as ST

MEDIA_SCHEMA = ST.StructType(
    [
        ST.StructField("media_id", ST.LongType(), False),
        ST.StructField("kind", ST.StringType(), False),  # image|audio|video
        ST.StructField("mime", ST.StringType(), True),
        ST.StructField("n_bytes", ST.LongType(), True),
        ST.StructField("payload", ST.BinaryType(), True),
    ]
)

IMAGE_FEATURES_DDL = (
    "media_id long, width int, height int, channels int, mean_luma double"
)
AUDIO_FEATURES_DDL = (
    "media_id long, sample_rate int, n_samples long, duration_s double, rms double"
)
FRAME_SAMPLE_DDL = "media_id long, frame_idx int, frame_png binary"

STUB_MODE_FAKE = "fake"  # deterministic fake features derived from bytes
STUB_MODE_RAISE = "raise"  # NotImplementedError: swap in a real codec here
MODE_REAL = "real"  # REAL decode via operators/mediacodec.py (PPM/WAV/Y4M/BMP)

VIDEO_FRAME_STATS_DDL = "media_id long, frame_idx int, frame_luma double"


def synthesize_media_df(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table — payload bytes are seeded noise with
    the right column types; used by tests and the bench."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    size = (F.pmod(F.xxhash64(F.col("id") + F.lit(seed)), F.lit(4096)) + 64).cast(
        "long"
    )
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            kinds.alias("kind"),
            F.concat(F.lit("application/x-fake-"), kinds).alias("mime"),
            size.alias("n_bytes"),
            # payload: repeat of the id hash bytes up to n_bytes (deterministic)
            F.substring(
                F.repeat(F.sha2(F.col("id").cast("string"), 256), 64), 1, 128
            )
            .cast("binary")
            .alias("payload"),
        )
    )


def synthesize_real_media_df(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Media table whose payloads are REAL encoded bytes (PPM / WAV / Y4M
    via :mod:`.mediacodec`), generated distributed: ``mapInPandas`` over
    ``spark.range`` — each payload is a pure function of (media_id, seed),
    so generation shards freely across executors and the golden-oracle
    replay rebuilds identical bytes with no data movement."""
    from . import mediacodec as C

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [C.synth_real_payload(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["id"].astype("int64"),
                    "kind": [r[0] for r in rows],
                    "mime": [r[1] for r in rows],
                    "n_bytes": pd.Series(
                        [len(r[2]) for r in rows], dtype="int64"
                    ),
                    "payload": [r[2] for r in rows],
                }
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def media_repartition(
    df: DataFrame,
    target_bytes_per_partition: int = 256 * 1024 * 1024,
    bytes_col: str = "n_bytes",
) -> DataFrame:
    """Repartition a media table so each partition holds ~target bytes.

    Uses the *metadata* byte count (cheap aggregate over a long column;
    the payload is untouched until the decode stage).  At cluster scale
    replace the single count with Iceberg file-level stats.
    """
    row = df.agg(
        F.sum(bytes_col).alias("total"), F.count(F.lit(1)).alias("rows")
    ).first()
    total = row["total"] or 0
    n_parts = max(1, int(total // target_bytes_per_partition) + 1)
    return df.repartition(n_parts)


def _fake_image_features(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in: derive pseudo-dimensions from payload bytes."""
    h = pdf["payload"].map(
        lambda b: int.from_bytes(bytes(b)[:8], "big", signed=False)
        if b is not None
        else 0
    )
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "width": (h % 1920 + 16).astype("int32"),
            "height": (h // 1920 % 1080 + 16).astype("int32"),
            "channels": np.full(len(pdf), 3, dtype="int32"),
            "mean_luma": ((h % 255) / 255.0).astype("float64"),
        }
    )


def decode_image_features(
    df: DataFrame, mode: str = STUB_MODE_FAKE, batch_rows: int = 64
) -> DataFrame:
    """image payload -> (width, height, channels, mean_luma).

    ``mapInPandas`` so a 100-image Arrow batch is one Python call.
    ``mode=MODE_REAL`` runs a REAL decode (PPM/PGM/BMP via
    :mod:`.mediacodec`); ``fake`` keeps the deterministic stand-in;
    ``raise`` is the production hook for compressed codecs (JPEG needs
    PIL/cv2 — swap in there, the Spark plumbing is unchanged).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == MODE_REAL:
            from . import mediacodec as C
        for pdf in batches:
            if mode == STUB_MODE_RAISE:
                raise NotImplementedError(
                    "compressed-image decode requires a codec library "
                    "(PIL/cv2); swap in here — PPM/PGM/BMP decode "
                    "natively via mode='real'"
                )
            if mode == MODE_REAL:
                feats = [C.image_features(b) for b in pdf["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"].astype("int64"),
                        "width": pd.Series(
                            [f[0] for f in feats], dtype="int32"
                        ),
                        "height": pd.Series(
                            [f[1] for f in feats], dtype="int32"
                        ),
                        "channels": pd.Series(
                            [f[2] for f in feats], dtype="int32"
                        ),
                        "mean_luma": pd.Series(
                            [f[3] for f in feats], dtype="float64"
                        ),
                    }
                )
                continue
            yield _fake_image_features(pdf)

    return (
        df.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema=IMAGE_FEATURES_DDL)
    )


def decode_audio_features(
    df: DataFrame, mode: str = STUB_MODE_FAKE
) -> DataFrame:
    """audio payload -> (sample_rate, n_samples, duration_s, rms).

    ``mode=MODE_REAL`` decodes PCM WAV for real (:mod:`.mediacodec`);
    compressed audio (MP3/AAC) routes to the ``raise`` production hook."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == MODE_REAL:
            from . import mediacodec as C
        for pdf in batches:
            if mode == STUB_MODE_RAISE:
                raise NotImplementedError(
                    "compressed-audio decode requires a codec "
                    "(soundfile/librosa); swap in here — PCM WAV decodes "
                    "natively via mode='real'"
                )
            if mode == MODE_REAL:
                feats = [C.audio_features(b) for b in pdf["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"].astype("int64"),
                        "sample_rate": pd.Series(
                            [f[0] for f in feats], dtype="int32"
                        ),
                        "n_samples": pd.Series(
                            [f[1] for f in feats], dtype="int64"
                        ),
                        "duration_s": pd.Series(
                            [f[2] for f in feats], dtype="float64"
                        ),
                        "rms": pd.Series(
                            [f[3] for f in feats], dtype="float64"
                        ),
                    }
                )
                continue
            h = pdf["payload"].map(
                lambda b: int.from_bytes(bytes(b)[:8], "big", signed=False)
                if b is not None
                else 0
            )
            sr = np.full(len(pdf), 16000, dtype="int32")
            n = (h % 480000 + 16000).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": sr,
                    "n_samples": n,
                    "duration_s": (n / sr).astype("float64"),
                    "rms": ((h % 1000) / 1000.0).astype("float64"),
                }
            )

    return (
        df.where(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(run, schema=AUDIO_FEATURES_DDL)
    )


def sample_video_frames(
    df: DataFrame, every_n: int = 30, max_frames: int = 8, mode: str = STUB_MODE_FAKE
) -> DataFrame:
    """video payload -> sampled frames (media_id, frame_idx, frame_png).

    One input row fans out to <=max_frames output rows — mapInPandas is a
    flat-map over Arrow batches, so the fan-out happens Python-side without
    an explode of the binary payload through a shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == MODE_REAL:
            from . import mediacodec as C
        for pdf in batches:
            if mode == STUB_MODE_RAISE:
                raise NotImplementedError(
                    "compressed-video decode requires pyav/ffmpeg; swap in "
                    "here — Y4M decodes natively via mode='real'"
                )
            if mode == MODE_REAL:
                out_id, out_idx, out_png = [], [], []
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    _, _, _, frames = C.decode_y4m(payload)
                    for k, idx in enumerate(range(0, len(frames), every_n)):
                        if k >= max_frames:
                            break
                        out_id.append(mid)
                        out_idx.append(idx)
                        # sampled luma plane re-encoded as PGM — a real
                        # image payload downstream stages can decode
                        out_png.append(C.encode_ppm(frames[idx]))
                yield pd.DataFrame(
                    {
                        "media_id": pd.Series(out_id, dtype="int64"),
                        "frame_idx": pd.Series(out_idx, dtype="int32"),
                        "frame_png": pd.Series(out_png, dtype=object),
                    }
                )
                continue
            out_id, out_idx, out_png = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = (
                    int.from_bytes(bytes(payload)[:4], "big") % max_frames + 1
                    if payload is not None
                    else 0
                )
                for f in range(n_frames):
                    out_id.append(mid)
                    out_idx.append(f * every_n)
                    out_png.append(bytes(payload)[:16] + f.to_bytes(4, "big"))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_id, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_png": pd.Series(out_png, dtype=object),
                }
            )

    return (
        df.where(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, schema=FRAME_SAMPLE_DDL)
    )


def video_frame_stats(
    df: DataFrame, every_n: int = 2, max_frames: int = 8
) -> DataFrame:
    """REAL video decode -> numeric per-frame features.

    One Y4M payload fans out to <= ``max_frames`` rows of
    (media_id, frame_idx, frame_luma) — all-numeric output, so the
    distributed run is value-hash comparable against the sequential
    golden replay of the same kernel (``mediacodec.video_frame_features``).
    """
    from . import mediacodec as C

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_luma = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for idx, luma in C.video_frame_features(
                    payload, every_n=every_n, max_frames=max_frames
                ):
                    out_id.append(mid)
                    out_idx.append(idx)
                    out_luma.append(round(luma, 6))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_id, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_luma": pd.Series(out_luma, dtype="float64"),
                }
            )

    return (
        df.where(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, schema=VIDEO_FRAME_STATS_DDL)
    )


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL image resize: decode -> nearest-neighbor resample -> re-encode
    PPM/PGM.  Payload-in/payload-out, so resize stages compose with the
    decode/feature stages (and with ``media_repartition``'s bytes-budget
    planning — the output ``n_bytes`` is recomputed)."""
    from . import mediacodec as C

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                C.encode_ppm(C.resize_nearest(C.decode_image(b), out_w, out_h))
                for b in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": pd.Series(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                    "payload": payloads,
                }
            )

    return (
        df.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema="media_id long, n_bytes long, payload binary")
    )
