"""Baseline JPEG codec (functions/jpeg.py): encode→decode round trips
across qualities × subsampling × restart intervals, grayscale, resize,
pixel features through the Spark path, and honest rejection of
unsupported/progressive/truncated input."""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_automated_evaluator_spark.functions.jpeg import (
    JpegFormatError,
    decode_jpeg,
    encode_jpeg,
    resize_jpeg,
)


def _gradient(w: int, h: int, seed: int = 0) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 7 + seed) % 256, (yy * 11 + seed) % 256, (xx + yy + seed) % 256],
        axis=2,
    ).astype(np.uint8)


@pytest.mark.parametrize("quality", [95, 85, 50])
@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("restart", [0, 2])
def test_round_trip(quality, subsampling, restart):
    img = _gradient(37, 23)  # non-multiple-of-8 dims exercise edge padding
    data = encode_jpeg(
        img, quality=quality, subsampling=subsampling, restart_interval=restart
    )
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    dec = decode_jpeg(data)
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int)).mean()
    # 4:2:0 box-averages chroma; higher quality must not be worse
    limit = 4.5 if subsampling == "420" else 3.0
    assert err < limit, (quality, subsampling, restart, err)


def test_quality_monotonic():
    img = _gradient(48, 32)
    errs = []
    for q in (95, 70, 30):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(np.abs(dec.astype(int) - img.astype(int)).mean())
    assert errs[0] <= errs[1] <= errs[2] + 0.5  # lower quality, more error


def test_flat_image_lossless_dc():
    flat = np.full((16, 24, 3), 128, np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, 95)) == 128).all()


def test_grayscale_round_trip():
    g = ((np.arange(23)[:, None] * np.arange(37)[None, :]) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=92))
    assert dec.shape == (23, 37, 3)
    # gray replicates to 3 identical channels
    assert (dec[:, :, 0] == dec[:, :, 1]).all() and (dec[:, :, 1] == dec[:, :, 2]).all()
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 3.0


def test_restart_markers_present_and_equivalent():
    img = _gradient(64, 48, seed=3)
    plain = encode_jpeg(img, quality=88)
    rst = encode_jpeg(img, quality=88, restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain  # DRI written
    # byte-identical pixels: restarts change the container, not the math
    assert (decode_jpeg(rst) == decode_jpeg(plain)).all()


def test_resize_jpeg():
    img = _gradient(40, 24)
    out = resize_jpeg(encode_jpeg(img, 90), 10, 6)
    dec = decode_jpeg(out)
    assert dec.shape == (6, 10, 3)


def test_rejections():
    with pytest.raises(JpegFormatError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")
    # progressive (SOF2) is declared out of scope, not mis-decoded
    img = _gradient(16, 16)
    data = bytearray(encode_jpeg(img, 90))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2
    with pytest.raises(JpegFormatError, match="baseline"):
        decode_jpeg(bytes(data))
    # truncated entropy stream must raise, not return garbage silently
    with pytest.raises(Exception):
        decode_jpeg(encode_jpeg(img, 90)[:40])


def test_pixel_features_real_for_jpeg():
    """extract_features' decode path yields pixel-derived (not
    digest-fake) features for JPEG content: a dark and a bright image
    must order by luminance mean."""
    from data_quality_automated_evaluator_spark.operators.multimodal import (
        _png_pixel_features,
    )

    dark = encode_jpeg(np.full((16, 16, 3), 20, np.uint8), 90)
    bright = encode_jpeg(np.full((16, 16, 3), 235, np.uint8), 90)
    fd = _png_pixel_features(dark)
    fb = _png_pixel_features(bright)
    assert fd is not None and fb is not None
    assert fd[0] < 0.2 < 0.8 < fb[0]  # channel-0 means reflect pixels


def test_avi_mjpeg_round_trip():
    """MJPEG/AVI mux → demux returns every frame byte-identical, and the
    avih header carries the declared geometry."""
    from data_quality_automated_evaluator_spark.functions.avi import (
        AviFormatError,
        avi_meta,
        demux_mjpeg_frames,
        mux_mjpeg_avi,
    )

    frames = [encode_jpeg(_gradient(24, 16, seed=k), 88) for k in range(5)]
    avi = mux_mjpeg_avi(frames, 24, 16, fps=5)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    meta = avi_meta(avi)
    assert meta == {"n_frames": 5, "width": 24, "height": 16, "fps": 5}
    got = list(demux_mjpeg_frames(avi))
    assert [i for i, _ in got] == [0, 1, 2, 3, 4]
    assert all(g == f for (_, g), f in zip(got, frames))  # byte-identical
    # every demuxed frame decodes
    for _, jpg in got:
        assert decode_jpeg(jpg).shape == (16, 24, 3)

    with pytest.raises(AviFormatError):
        avi_meta(b"RIFF\x00\x00\x00\x00WAVE")  # a RIFF, not an AVI
    with pytest.raises(AviFormatError):
        mux_mjpeg_avi([], 8, 8)
