"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery is real and tested — schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partition sizing. Codec depth
varies by format, honestly marked: WAV metadata (full RIFF chunk walk),
PNG decode/resize/encode (``functions/png.py``, stdlib zlib + numpy,
all five scanline filters) and baseline-sequential JPEG decode/encode
(``functions/jpeg.py``: Huffman entropy decode, dequant, numpy IDCT,
chroma upsampling, 4:4:4/4:2:0 encode, restart intervals) are REAL —
resize and pixel features run on actual pixels for both dominant web
image formats. Video frame sampling is REAL for MJPEG-in-AVI
(``functions/avi.py`` RIFF demux → per-frame JPEG decode); GIF remains
a header-only parse and inter-frame video codecs (H.264/VP9) the
deterministic-fake seam — swapping in Pillow / torchaudio / pyav
changes ONE function body each; the distributed plumbing stays
identical.

Scale shape: binary payloads never shuffle — all multimodal transforms
are map-only (``mapInPandas``), so the plan is scan → transform → sink
with partition sizing controlled by ``spark.sql.files.maxPartitionBytes``.
Metadata-only outputs project the binary away as early as possible.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, mime string, width int, height int"
)

IMAGE_META_SCHEMA = (
    "media_id long, mime string, width int, height int, n_bytes long, sha256 string"
)


def decode_image_meta(content: bytes | None) -> tuple[str | None, int | None, int | None]:
    """Header-only decode: (mime, width, height) for PNG/JPEG/GIF/WebP
    bytes.

    Real decode seam — replace with Pillow for full decoding. Header
    parsing is deterministic and dependency-free.
    """
    if not content:
        return (None, None, None)
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        from ..functions.webp import webp_meta

        wh = webp_meta(content)
        if wh is not None:
            return ("image/webp", wh[0], wh[1])
        return ("image/webp", None, None)
    if content[:8] == b"\x89PNG\r\n\x1a\n" and len(content) >= 24:
        w, h = struct.unpack(">II", content[16:24])
        return ("image/png", int(w), int(h))
    if content[:3] == b"GIF" and len(content) >= 10:
        w, h = struct.unpack("<HH", content[6:10])
        return ("image/gif", int(w), int(h))
    if content[:2] == b"\xff\xd8":  # JPEG: scan for SOF0/SOF2 frame header
        i = 2
        while i + 9 < len(content):
            if content[i] != 0xFF:
                break
            marker = content[i + 1]
            seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC2):
                h, w = struct.unpack(">HH", content[i + 5 : i + 9])
                return ("image/jpeg", int(w), int(h))
            i += 2 + seg_len
        return ("image/jpeg", None, None)
    return ("application/octet-stream", None, None)


def image_metadata(df: DataFrame, content_col: str = "content", id_col: str = "media_id") -> DataFrame:
    """Map-only metadata extraction over a binary column via mapInPandas.

    The binary column is consumed inside the batch iterator and never
    leaves the stage — output is metadata-only.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode_image_meta(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "mime": [m[0] for m in metas],
                    "width": pd.array([m[1] for m in metas], dtype="Int32"),
                    "height": pd.array([m[2] for m in metas], dtype="Int32"),
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf[content_col]],
                    "sha256": [
                        hashlib.sha256(c).hexdigest() if c is not None else None
                        for c in pdf[content_col]
                    ],
                }
            )

    return df.mapInPandas(_batches, schema=IMAGE_META_SCHEMA)


AUDIO_META_SCHEMA = (
    "media_id long, mime string, sample_rate int, n_channels int, "
    "bits_per_sample int, duration_sec double, n_bytes long"
)


def decode_wav_meta(
    content: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None, float | None]:
    """RIFF/WAVE header parse: (mime, sample_rate, n_channels,
    bits_per_sample, duration_sec). Pure stdlib — a REAL audio decode
    path, not a stub: the fmt and data chunks are walked per spec."""
    if not content or len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return (None, None, None, None, None)
    pos = 12
    rate = channels = bits = None
    data_len = None
    while pos + 8 <= len(content):
        chunk_id = content[pos : pos + 4]
        (chunk_len,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + chunk_len]
        if chunk_id == b"fmt " and len(body) >= 16:
            _fmt, channels, rate, _byte_rate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif chunk_id == b"data":
            data_len = chunk_len
        pos += 8 + chunk_len + (chunk_len & 1)  # chunks are word-aligned
    duration = None
    # bits < 8 would make (bits // 8) == 0 — a malformed fmt chunk must
    # yield a None duration, not a ZeroDivisionError that kills the task
    if data_len is not None and rate and channels and bits and bits >= 8:
        duration = data_len / (rate * channels * (bits // 8))
    return ("audio/wav", rate, channels, bits, duration)


def audio_metadata(df: DataFrame, content_col: str = "content", id_col: str = "media_id") -> DataFrame:
    """Map-only audio metadata over a binary column (mapInPandas; binary
    never leaves the stage)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode_wav_meta(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "mime": [m[0] for m in metas],
                    "sample_rate": pd.array([m[1] for m in metas], dtype="Int32"),
                    "n_channels": pd.array([m[2] for m in metas], dtype="Int32"),
                    "bits_per_sample": pd.array([m[3] for m in metas], dtype="Int32"),
                    "duration_sec": pd.array([m[4] for m in metas], dtype="Float64"),
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf[content_col]],
                }
            )

    return df.mapInPandas(_batches, schema=AUDIO_META_SCHEMA)


def make_wav_bytes(seconds: float = 1.0, rate: int = 16000, channels: int = 1,
                   bits: int = 16, fill: int = 0) -> bytes:
    """Minimal valid RIFF/WAVE file (silence payload) for tests."""
    n_samples = int(seconds * rate)
    data = bytes([fill % 256]) * (n_samples * channels * (bits // 8))
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * (bits // 8), channels * (bits // 8), bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


FEATURE_DIM = 16


def _features_from_pixels(img: np.ndarray) -> list[float]:
    """16-float feature vector from a decoded HxWxC pixel array:
    per-channel mean/std (padded to 4 channels) + an 8-bin luminance
    histogram."""
    f = img.reshape(-1, img.shape[2]).astype(np.float64) / 255.0
    means = f.mean(axis=0)
    stds = f.std(axis=0)
    lum = f.mean(axis=1)
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 1.0))
    hist = hist / max(len(lum), 1)
    out = np.zeros(FEATURE_DIM, dtype=np.float64)
    out[: len(means)] = means[:4]
    out[4 : 4 + len(stds)] = stds[:4]
    out[8:16] = hist
    return out.tolist()


def _decode_pixels(content: bytes) -> np.ndarray | None:
    """Decode PNG, baseline JPEG, or lossless-WebP bytes to pixels;
    None for anything else."""
    from ..functions.jpeg import decode_jpeg
    from ..functions.png import decode_png
    from ..functions.webp import decode_webp

    if content[:8] == b"\x89PNG\r\n\x1a\n":
        try:
            return decode_png(content)
        except Exception:
            return None
    if content[:2] == b"\xff\xd8":
        try:
            return decode_jpeg(content)
        except Exception:
            return None
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        try:
            return decode_webp(content)
        except Exception:
            return None
    return None


def _png_pixel_features(content: bytes) -> list[float] | None:
    """REAL 16-float feature vector from decoded PNG or JPEG pixels;
    None when the content is not decodable by the stdlib codecs."""
    img = _decode_pixels(content)
    if img is None:
        return None
    return _features_from_pixels(img)


def extract_features(df: DataFrame, content_col: str = "content", id_col: str = "media_id") -> DataFrame:
    """Feature extraction, map-only. REAL for decodable PNGs, baseline
    JPEGs, and lossless WebPs (per-channel mean/std + luminance
    histogram from actual pixels); every other format falls back to the deterministic
    digest-derived fake — the honest seam for a vision/audio encoder
    (model weights would be broadcast; batches sized by Arrow limits)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for c in pdf[content_col]:
                if c is None:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                real = _png_pixel_features(bytes(c))
                if real is not None:
                    feats.append(real)
                    continue
                digest = hashlib.sha256(c).digest()
                arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
                feats.append((arr.astype(np.float64) / 65535.0).tolist())
            yield pd.DataFrame({"media_id": pdf[id_col].values, "features": feats})

    return df.mapInPandas(_batches, schema="media_id long, features array<double>")


def resize_image(df: DataFrame, width: int, height: int,
                 content_col: str = "content", id_col: str = "media_id") -> DataFrame:
    """Image resize, map-only. REAL for PNG (pure-stdlib codec in
    ``functions/png.py``: zlib inflate, all five scanline unfilters,
    nearest-neighbor resample, re-encode) AND baseline JPEG
    (``functions/jpeg.py``: full entropy decode → resample → re-encode,
    format preserved) AND lossless WebP (``functions/webp.py``: VP8L
    decode → resample → VP8L re-encode); other formats yield a NULL content with the
    reason in ``error`` — a malformed or unsupported file must never
    kill the task (quality-evaluator contract), and a codec library
    (Pillow) widens format support by replacing one function body."""
    from ..functions.jpeg import JpegFormatError, resize_jpeg
    from ..functions.png import PngFormatError, resize_png
    from ..functions.webp import WebpFormatError, decode_webp, encode_webp
    from ..functions.png import resize_nearest

    def _resize_one(c: bytes) -> bytes:
        if c[:2] == b"\xff\xd8":
            return resize_jpeg(c, width, height)
        if c[:4] == b"RIFF" and c[8:12] == b"WEBP":
            return encode_webp(resize_nearest(decode_webp(c), width, height))
        return resize_png(c, width, height)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_bytes: list[bytes | None] = []
            errors: list[str | None] = []
            for c in pdf[content_col]:
                if c is None:
                    out_bytes.append(None)
                    errors.append("null content")
                    continue
                try:
                    out_bytes.append(_resize_one(bytes(c)))
                    errors.append(None)
                except (PngFormatError, JpegFormatError, WebpFormatError) as ex:
                    out_bytes.append(None)
                    errors.append(str(ex))
                except Exception as ex:  # malformed beyond recognition
                    out_bytes.append(None)
                    errors.append(f"decode failed: {ex}")
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "content": out_bytes,
                    "error": errors,
                }
            )

    return df.mapInPandas(
        _batches, schema="media_id long, content binary, error string"
    )


FRAME_SCHEMA = (
    "media_id long, frame_idx int, frame_bytes binary, frame_sha string, "
    "is_real boolean"
)


def sample_frames(df: DataFrame, every_n: int = 30,
                  content_col: str = "content", id_col: str = "media_id") -> DataFrame:
    """Video frame sampling, map-only. REAL for MJPEG-in-AVI (the RIFF
    container walk in ``functions/avi.py`` yields every Nth frame's
    actual JPEG bytes, decodable by ``functions/jpeg.py``) and for
    uncompressed AVI (BI_RGB / I420 — decoded pixels re-emitted as
    lossless PNG via ``functions/png.py``), both ``is_real=True``;
    inter-frame codecs (H.264/VP9/...) fall through to the deterministic
    digest fake (``is_real=False``, NULL bytes) — the honest pyav/ffmpeg
    seam, one function body to swap."""
    from ..functions.avi import (
        AviFormatError,
        avi_codec,
        demux_mjpeg_frames,
        demux_raw_frames,
    )
    from ..functions.png import encode_png

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "frame_bytes": [],
                    "frame_sha": [], "is_real": []}
            for mid, c in zip(pdf[id_col], pdf[content_col]):
                c = bytes(c) if c is not None else None
                if c is not None and c[:4] == b"RIFF":
                    try:
                        codec = avi_codec(c)
                        if codec in ("RGB", "I420"):
                            frames = (
                                (k, encode_png(px))
                                for k, px in demux_raw_frames(c)
                            )
                        else:  # MJPG (and any '..dc' JPEG payloads)
                            frames = demux_mjpeg_frames(c)
                        for k, img in frames:
                            if k % every_n:
                                continue
                            rows["media_id"].append(mid)
                            rows["frame_idx"].append(k)
                            rows["frame_bytes"].append(img)
                            rows["frame_sha"].append(
                                hashlib.sha256(img).hexdigest()
                            )
                            rows["is_real"].append(True)
                        continue
                    except AviFormatError:
                        pass  # malformed RIFF → digest fake, never a crash
                n_fake_frames = (len(c) // 1000 if c is not None else 0) + 1
                for k in range(0, n_fake_frames, every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(k)
                    rows["frame_bytes"].append(None)
                    h = hashlib.sha256((c or b"") + str(k).encode()).hexdigest()
                    rows["frame_sha"].append(h)
                    rows["is_real"].append(False)
            yield pd.DataFrame(rows)

    return df.mapInPandas(_batches, schema=FRAME_SCHEMA)


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table: tiny valid PNG/GIF headers +
    opaque payloads (for tests; no codec needed)."""
    rows = []
    for i in range(n):
        if i % 4 == 0:
            # a REAL decodable PNG (deterministic gradient) so metadata,
            # resize and pixel features all exercise the actual codec
            from ..functions.png import encode_png

            w, h = 16 + i, 9 + i
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(xx * 7 + i) % 256, (yy * 11 + i) % 256, (xx + yy + i) % 256],
                axis=2,
            ).astype(np.uint8)
            rows.append((i, "image", encode_png(img), "image/png", w, h))
        elif i % 4 == 1:
            w, h = 32 + i, 18 + i
            if i % 8 == 1:
                # a REAL decodable baseline JPEG (4:2:0 on odd multiples
                # to exercise subsampled decode in the Spark e2e tests)
                from ..functions.jpeg import encode_jpeg

                yy, xx = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [(xx * 5 + i) % 256, (yy * 3 + i) % 256, (xx * yy + i) % 256],
                    axis=2,
                ).astype(np.uint8)
                sub = "420" if (i // 8) % 2 else "444"
                content = encode_jpeg(img, quality=90, subsampling=sub)
                rows.append((i, "image", content, "image/jpeg", w, h))
            else:
                content = b"GIF89a" + struct.pack("<HH", w, h) + bytes([i % 251]) * 50
                rows.append((i, "image", content, "image/gif", w, h))
        elif i % 4 == 2:
            content = make_wav_bytes(seconds=0.1 + (i % 5) * 0.1, rate=8000 + 1000 * (i % 3), fill=i)
            rows.append((i, "audio", content, "audio/wav", None, None))
        else:
            if i % 8 == 3:
                # a REAL MJPEG AVI: JPEG frames in a RIFF container, so
                # sample_frames exercises the genuine demux+decode path
                from ..functions.avi import mux_mjpeg_avi
                from ..functions.jpeg import encode_jpeg

                w, h = 24, 16
                frames = []
                for k in range(i % 5 + 3):
                    yy, xx = np.mgrid[0:h, 0:w]
                    img = np.stack(
                        [(xx * 9 + k * 17) % 256, (yy * 5 + k) % 256,
                         (xx + yy + k * 31) % 256],
                        axis=2,
                    ).astype(np.uint8)
                    frames.append(encode_jpeg(img, quality=88))
                content = mux_mjpeg_avi(frames, w, h, fps=5)
                rows.append((i, "video", content, "video/x-msvideo", w, h))
            elif i % 16 == 7:
                # a REAL uncompressed AVI (BI_RGB / I420 alternating) so
                # sample_frames exercises the raw-frame decode path
                from ..functions.avi import mux_raw_avi

                w, h = 24, 16
                frames = []
                for k in range(i % 5 + 3):
                    yy, xx = np.mgrid[0:h, 0:w]
                    img = np.stack(
                        [(xx * 13 + k * 7) % 256, (yy * 3 + k) % 256,
                         (xx * 2 + yy + k * 19) % 256],
                        axis=2,
                    ).astype(np.uint8)
                    frames.append(img)
                codec = "rgb" if (i // 16) % 2 == 0 else "i420"
                content = mux_raw_avi(frames, fps=5, codec=codec)
                rows.append((i, "video", content, "video/x-msvideo", w, h))
            else:
                rows.append((i, "video", bytes([i % 251]) * (1000 * (i % 5 + 1)), "video/fake", None, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
