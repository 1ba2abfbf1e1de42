"""Real media codecs in pure numpy/stdlib — no PIL/ffmpeg needed.

The round-1 multimodal layer shipped the Spark plumbing (schemas, Arrow
batching, bytes-budget partitioning) with the decode kernel stubbed,
because the sandbox has no codec libraries.  This module closes that gap
with REAL decoders for the codec-less public container formats —
formats whose byte layout is fully specified and parseable with numpy
alone:

* **PPM (P6) / PGM (P5)** — Netpbm binary images (RGB / grayscale).
* **BMP** — Windows bitmap, uncompressed 24-bit BI_RGB.
* **WAV** — RIFF PCM 16-bit audio (stdlib ``wave`` + numpy).
* **Y4M** — YUV4MPEG2 uncompressed video (C420), the interchange format
  ffmpeg itself uses for raw pipes.

Compressed formats (JPEG/MP3/H.264) still route to the production hook
in ``multimodal.py`` (``STUB_MODE_RAISE``) — entropy decoding belongs to
a codec library, not to a Spark engine.  But everything here is a real
decode: bytes in, pixels/samples out, features computed from the actual
signal.

Everything is a pure function of ``bytes`` so the same kernels run (a)
inside ``mapInPandas`` workers over Arrow batches and (b) in the
single-process golden-oracle replay (``golden.py``) that the driver
hash-compares against — the distributed plan is verified against a
sequential run of the *same* arithmetic.

Reference parity note: data-caterer has no media layer at all (its
binary type is random bytes, ``RandomDataGenerator.scala:253-255``);
this module is part of the beyond-reference LLM-pipeline surface the
build brief asks for (decode / feature-extract / resize / frame-sample).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# --------------------------------------------------------------------------
# PPM / PGM (Netpbm binary)
# --------------------------------------------------------------------------


def _pnm_header(buf: bytes) -> tuple[str, int, int, int, int]:
    """Parse a binary PNM header; returns (magic, w, h, maxval, offset)."""
    magic = buf[:2].decode("ascii")
    if magic not in ("P5", "P6"):
        raise ValueError(f"not a binary PNM payload (magic={magic!r})")
    # tokens separated by whitespace; '#' comments run to end of line
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(buf[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    w, h, maxval = tokens
    return magic, w, h, maxval, pos


def decode_pnm(buf: bytes) -> np.ndarray:
    """PPM(P6) -> (h, w, 3) uint8; PGM(P5) -> (h, w) uint8."""
    magic, w, h, maxval, pos = _pnm_header(bytes(buf))
    if maxval != 255:
        raise ValueError(f"only 8-bit PNM supported (maxval={maxval})")
    ch = 3 if magic == "P6" else 1
    raster = np.frombuffer(buf, dtype=np.uint8, count=w * h * ch, offset=pos)
    return raster.reshape(h, w, 3) if ch == 3 else raster.reshape(h, w)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM; (h, w) uint8 -> binary PGM."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    elif img.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode("ascii") + img.tobytes()


# --------------------------------------------------------------------------
# BMP (uncompressed 24-bit BI_RGB, BITMAPINFOHEADER)
# --------------------------------------------------------------------------


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (h, w, 3) uint8 RGB (rows top-down)."""
    buf = bytes(buf)
    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit bottom-up BMP."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    pixel_bytes = raster.tobytes()
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_bytes), 0, 0, 54)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + pixel_bytes


# --------------------------------------------------------------------------
# WAV (RIFF PCM 16-bit)
# --------------------------------------------------------------------------


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV -> (sample_rate, float64 samples in [-1, 1]); multi-channel
    payloads are averaged down to mono."""
    with wave.open(io.BytesIO(bytes(buf)), "rb") as wf:
        sr = wf.getframerate()
        n_ch = wf.getnchannels()
        width = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if width != 2:
        raise ValueError(f"only 16-bit PCM supported (width={width})")
    pcm = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    if n_ch > 1:
        pcm = pcm.reshape(-1, n_ch).mean(axis=1)
    return sr, pcm


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """float samples in [-1, 1] -> mono 16-bit PCM WAV."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = np.round(pcm * 32767.0).astype("<i2")
    out = io.BytesIO()
    with wave.open(out, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm16.tobytes())
    return out.getvalue()


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2, C420)
# --------------------------------------------------------------------------


def decode_y4m(buf: bytes) -> tuple[int, int, int, list[np.ndarray]]:
    """YUV4MPEG2 C420 -> (w, h, fps_num, [luma planes (h, w) uint8]).

    Only the Y (luma) plane is materialized per frame — chroma is skipped
    by offset arithmetic, which is exactly what a luma-feature pipeline
    wants (no wasted copies)."""
    buf = bytes(buf)
    nl = buf.index(0x0A)
    header = buf[:nl].decode("ascii")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a Y4M payload")
    w = h = 0
    fps_num = 30
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fps_num = int(tok[1:].split(":")[0])
        elif tok[0] == "C" and not tok[1:].startswith("420"):
            raise ValueError(f"only C420 supported (got {tok})")
    if w <= 0 or h <= 0 or w % 2 or h % 2:
        raise ValueError(f"bad Y4M dimensions {w}x{h}")
    y_size, frame_size = w * h, w * h * 3 // 2
    pos, frames = nl + 1, []
    while pos < len(buf):
        f_nl = buf.index(0x0A, pos)
        if not buf[pos:f_nl].startswith(b"FRAME"):
            raise ValueError("corrupt Y4M frame marker")
        pos = f_nl + 1
        frames.append(
            np.frombuffer(buf, dtype=np.uint8, count=y_size, offset=pos)
            .reshape(h, w)
        )
        pos += frame_size
    return w, h, fps_num, frames


def encode_y4m(frames: list[np.ndarray], fps_num: int = 30) -> bytes:
    """luma planes (h, w) uint8 -> Y4M C420 (chroma = neutral 128)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    chroma = np.full((h // 2) * (w // 2) * 2, 128, dtype=np.uint8).tobytes()
    parts = [f"YUV4MPEG2 W{w} H{h} F{fps_num}:1 Ip A1:1 C420jpeg\n".encode()]
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share one shape")
        parts.append(b"FRAME\n")
        parts.append(np.ascontiguousarray(f, dtype=np.uint8).tobytes())
        parts.append(chroma)
    return b"".join(parts)


# --------------------------------------------------------------------------
# transforms / features (shared by Spark workers and the golden replay)
# --------------------------------------------------------------------------

#: BT.601 luma weights — the standard the reference formats themselves use.
_LUMA = np.array([0.299, 0.587, 0.114])


def mean_luma(img: np.ndarray) -> float:
    """Mean luma in [0, 1]; RGB via BT.601, grayscale as-is."""
    arr = img.astype(np.float64)
    y = arr @ _LUMA if arr.ndim == 3 else arr
    return float(y.mean() / 255.0)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure index arithmetic, any channel count)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[rows][:, cols]


def decode_image(buf: bytes) -> np.ndarray:
    """Dispatch on magic bytes: PPM/PGM or BMP -> uint8 array."""
    head = bytes(buf[:2])
    if head in (b"P5", b"P6"):
        return decode_pnm(buf)
    if head == b"BM":
        return decode_bmp(buf)
    raise ValueError(f"unrecognized image magic {head!r}")


def image_features(buf: bytes) -> tuple[int, int, int, float]:
    """(width, height, channels, mean_luma) from a real decode."""
    img = decode_image(buf)
    h, w = img.shape[:2]
    ch = img.shape[2] if img.ndim == 3 else 1
    return w, h, ch, mean_luma(img)


def audio_features(buf: bytes) -> tuple[int, int, float, float]:
    """(sample_rate, n_samples, duration_s, rms) from a real decode."""
    sr, pcm = decode_wav(buf)
    n = int(pcm.shape[0])
    rms = float(np.sqrt(np.mean(pcm * pcm))) if n else 0.0
    return sr, n, n / sr, rms


def video_frame_features(
    buf: bytes, every_n: int = 2, max_frames: int = 8
) -> list[tuple[int, float]]:
    """Sample every ``every_n``-th frame (≤ ``max_frames``); per sampled
    frame: (frame_idx, mean_luma)."""
    _, _, _, frames = decode_y4m(buf)
    out = []
    for idx in range(0, len(frames), every_n):
        if len(out) >= max_frames:
            break
        out.append((idx, float(frames[idx].astype(np.float64).mean() / 255.0)))
    return out


# --------------------------------------------------------------------------
# deterministic synthesis — a pure function of (media_id, seed), so the
# Spark generator (mapInPandas over spark.range) and the golden-oracle
# replay produce byte-identical payloads with no data exchange
# --------------------------------------------------------------------------


def synth_real_payload(media_id: int, seed: int = 42) -> tuple[str, str, bytes]:
    """(kind, mime, payload) with REAL encoded bytes.

    media_id % 3: 0 -> PPM image, 1 -> WAV audio, 2 -> Y4M video.  Sizes
    are kept small (tests/bench) but arbitrary — the decoders are
    dimension-agnostic."""
    rng = np.random.RandomState((seed * 1_000_003 + media_id * 7919) % (2**31))
    kind_ix = media_id % 3
    if kind_ix == 0:
        w = int(rng.randint(8, 33)) * 2
        h = int(rng.randint(8, 33)) * 2
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        return "image", "image/x-portable-pixmap", encode_ppm(img)
    if kind_ix == 1:
        sr = int(rng.choice([8000, 16000, 22050]))
        n = int(rng.randint(sr // 8, sr // 2))
        t = np.arange(n) / sr
        freq = float(rng.uniform(100.0, 2000.0))
        sig = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.randn(n)
        return "audio", "audio/wav", encode_wav(sig, sr)
    w = int(rng.randint(4, 13)) * 2
    h = int(rng.randint(4, 13)) * 2
    n_frames = int(rng.randint(2, 13))
    frames = [
        rng.randint(0, 256, size=(h, w)).astype(np.uint8) for _ in range(n_frames)
    ]
    return "video", "video/x-yuv4mpeg", encode_y4m(frames, fps_num=30)
