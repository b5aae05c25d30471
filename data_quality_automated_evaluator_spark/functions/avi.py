"""Minimal AVI container mux/demux (MJPEG + uncompressed) — stdlib/numpy.

Motion-JPEG inside a RIFF/AVI container is a real, widely-supported
video format (every frame is an independent baseline JPEG): the
demuxer walks the RIFF chunk tree to the ``movi`` list and yields the
``..dc``/``..db`` frame payloads; each payload decodes with
:mod:`.jpeg`. Uncompressed AVI is also fully decodable here —
``BI_RGB`` (bottom-up BGR rows, 4-byte stride alignment, per the
public BITMAPINFOHEADER spec) and planar ``I420`` (YUV 4:2:0, the
full-range BT.601 math shared with :mod:`.jpeg`). This closes the
video seam in :mod:`..operators.multimodal` honestly — MJPEG and
RGB/I420 frame sampling are REAL (container walk + decode), while
inter-frame codecs (H.264/VP9/AV1) remain the documented pyav/ffmpeg
seam.

Format layout (public RIFF/AVI spec):

    RIFF <sz> 'AVI '
      LIST <sz> 'hdrl'
        'avih' <56>  main header (µs/frame, total frames, w, h, ...)
        LIST <sz> 'strl'  { 'strh' <56> vids/MJPG, 'strf' <40> BITMAPINFOHEADER }
      LIST <sz> 'movi'
        '00dc' <n> <jpeg bytes> (word-aligned)  × frames
"""

from __future__ import annotations

import struct

__all__ = [
    "AviFormatError",
    "mux_mjpeg_avi",
    "demux_mjpeg_frames",
    "avi_meta",
    "avi_codec",
    "mux_raw_avi",
    "demux_raw_frames",
]


class AviFormatError(ValueError):
    pass


def mux_mjpeg_avi(frames: list[bytes], width: int, height: int,
                  fps: int = 10) -> bytes:
    """Build a minimal valid MJPEG AVI from per-frame JPEG bytes."""
    if not frames:
        raise AviFormatError("need at least one frame")
    movi_body = bytearray(b"movi")
    for f in frames:
        movi_body += b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) & 1:
            movi_body += b"\x00"  # RIFF chunks are word-aligned
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1,
                                            fps, 0, len(frames), 0, 0xFFFF, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)
    strl = bytearray(b"strl")
    strl += b"strh" + struct.pack("<I", len(strh)) + strh
    strl += b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl = bytearray(b"hdrl")
    hdrl += b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl += b"LIST" + struct.pack("<I", len(strl)) + strl
    body = bytearray(b"AVI ")
    body += b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    body += b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    return bytes(b"RIFF" + struct.pack("<I", len(body)) + body)


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, list_type_or_None, body_start, body_len)."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (clen,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = pos + 8
        if cid in (b"LIST", b"RIFF"):
            yield cid, buf[body : body + 4], body + 4, clen - 4
        else:
            yield cid, None, body, clen
        pos = body + clen + (clen & 1)


def _require_avi(data: bytes) -> None:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviFormatError("not a RIFF/AVI file")


def avi_meta(data: bytes) -> dict:
    """(n_frames, width, height, fps) from the avih main header."""
    _require_avi(data)
    for cid, ltype, start, length in _walk_chunks(data, 12, len(data)):
        if cid == b"LIST" and ltype == b"hdrl":
            for cid2, _lt, s2, l2 in _walk_chunks(data, start, start + length):
                if cid2 == b"avih" and l2 >= 40:
                    us_pf, _, _, _, total, _, _, _, w, h = struct.unpack(
                        "<10I", data[s2 : s2 + 40]
                    )
                    return {
                        "n_frames": total,
                        "width": w,
                        "height": h,
                        "fps": round(1_000_000 / us_pf) if us_pf else None,
                    }
    raise AviFormatError("no avih header")


def demux_mjpeg_frames(data: bytes):
    """Yield (frame_idx, jpeg_bytes) for every video frame chunk."""
    _require_avi(data)
    idx = 0
    for cid, ltype, start, length in _walk_chunks(data, 12, len(data)):
        if cid == b"LIST" and ltype == b"movi":
            for cid2, _lt, s2, l2 in _walk_chunks(data, start, start + length):
                # '..dc' compressed / '..db' uncompressed video chunks
                if cid2[2:4] in (b"dc", b"db"):
                    yield idx, data[s2 : s2 + l2]
                    idx += 1


# ---------------------------------------------------------------------------
# uncompressed AVI: BI_RGB (bottom-up BGR, 4-byte row stride) and
# planar I420 (YUV 4:2:0, full-range BT.601 — the same color math as
# functions/jpeg.py JFIF decode)
# ---------------------------------------------------------------------------


def avi_codec(data: bytes) -> str | None:
    """Video codec from the strf BITMAPINFOHEADER: ``'MJPG'``, ``'RGB'``
    (BI_RGB, biCompression==0), ``'I420'``, or the raw fourcc text for
    anything else; None when no strf is present."""
    _require_avi(data)
    for cid, ltype, start, length in _walk_chunks(data, 12, len(data)):
        if cid == b"LIST" and ltype == b"hdrl":
            for cid2, lt2, s2, l2 in _walk_chunks(data, start, start + length):
                if cid2 == b"LIST" and lt2 == b"strl":
                    for cid3, _lt, s3, l3 in _walk_chunks(data, s2, s2 + l2):
                        if cid3 == b"strf" and l3 >= 20:
                            comp = data[s3 + 16 : s3 + 20]
                            if comp == b"\x00\x00\x00\x00":
                                # BI_RGB covers 16/24/32 bpp; the raw
                                # decoder only speaks 24 — a 16/32 bpp
                                # file passes the stride*h length check
                                # and would silently decode to garbage,
                                # so tag the depth and let
                                # demux_raw_frames reject it cleanly
                                bits = struct.unpack(
                                    "<H", data[s3 + 14 : s3 + 16]
                                )[0]
                                return "RGB" if bits == 24 else f"RGB{bits}"
                            return comp.decode("ascii", "replace")
    return None


def _bgr_stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # BMP rows pad to 4 bytes


def mux_raw_avi(frames: list, fps: int = 10, codec: str = "rgb") -> bytes:
    """Build an uncompressed AVI from HxWx3 uint8 RGB numpy frames.

    ``codec='rgb'``: BI_RGB '00db' chunks — bottom-up BGR rows padded to
    a 4-byte stride (lossless round-trip). ``codec='i420'``: planar YUV
    4:2:0 (even dims required; 2x2 chroma averaging, full-range BT.601).
    """
    import numpy as np

    if not frames:
        raise AviFormatError("need at least one frame")
    h, w = frames[0].shape[:2]
    if codec == "i420" and (w % 2 or h % 2):
        raise AviFormatError("I420 needs even width and height")
    movi_body = bytearray(b"movi")
    for f in frames:
        if f.shape[:2] != (h, w):
            raise AviFormatError("all frames must share one size")
        f = np.asarray(f, dtype=np.uint8)
        if codec == "rgb":
            stride = _bgr_stride(w)
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
            payload = rows.tobytes()
        elif codec == "i420":
            r, g, b = (f[:, :, i].astype(np.float64) for i in range(3))
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = (b - y) / 1.772 + 128.0
            cr = (r - y) / 1.402 + 128.0
            # 2x2 chroma average
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            to_u8 = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)  # noqa: E731
            payload = (
                to_u8(y).tobytes() + to_u8(cb).tobytes() + to_u8(cr).tobytes()
            )
        else:
            raise AviFormatError(f"unsupported raw codec {codec!r}")
        movi_body += b"00db" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            movi_body += b"\x00"
    if codec == "rgb":
        comp, bits, handler = 0, 24, b"DIB "
        img_size = _bgr_stride(w) * h
    else:
        comp, bits, handler = int.from_bytes(b"I420", "little"), 12, b"I420"
        img_size = w * h * 3 // 2
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0,
        w, h, 0, 0, 0, 0,
    )
    strh = (b"vids" + handler + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1,
                                            fps, 0, len(frames), 0, 0xFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bits, comp,
                       img_size, 0, 0, 0, 0)
    strl = bytearray(b"strl")
    strl += b"strh" + struct.pack("<I", len(strh)) + strh
    strl += b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl = bytearray(b"hdrl")
    hdrl += b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl += b"LIST" + struct.pack("<I", len(strl)) + strl
    body = bytearray(b"AVI ")
    body += b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    body += b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    return bytes(b"RIFF" + struct.pack("<I", len(body)) + body)


def demux_raw_frames(data: bytes):
    """Yield (frame_idx, HxWx3 uint8 RGB array) for BI_RGB / I420 AVIs."""
    import numpy as np

    codec = avi_codec(data)
    if codec not in ("RGB", "I420"):
        raise AviFormatError(f"not an uncompressed AVI (codec={codec!r})")
    meta = avi_meta(data)
    w, h = meta["width"], meta["height"]
    for idx, payload in demux_mjpeg_frames(data):  # same chunk walk
        if codec == "RGB":
            stride = _bgr_stride(w)
            if len(payload) < stride * h:
                raise AviFormatError("truncated BI_RGB frame")
            rows = np.frombuffer(payload[: stride * h], dtype=np.uint8)
            rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
            yield idx, rows[::-1, :, ::-1].copy()  # bottom-up BGR → RGB
        else:
            n_y, n_c = w * h, (w // 2) * (h // 2)
            if len(payload) < n_y + 2 * n_c:
                raise AviFormatError("truncated I420 frame")
            y = np.frombuffer(payload[:n_y], dtype=np.uint8).reshape(h, w)
            cb = np.frombuffer(payload[n_y : n_y + n_c], dtype=np.uint8)
            cr = np.frombuffer(payload[n_y + n_c : n_y + 2 * n_c], dtype=np.uint8)
            cb = cb.reshape(h // 2, w // 2).repeat(2, 0).repeat(2, 1).astype(np.float64) - 128.0
            cr = cr.reshape(h // 2, w // 2).repeat(2, 0).repeat(2, 1).astype(np.float64) - 128.0
            yf = y.astype(np.float64)
            rgb = np.stack(
                [yf + 1.402 * cr,
                 yf - 0.344136 * cb - 0.714136 * cr,
                 yf + 1.772 * cb],
                axis=2,
            )
            yield idx, np.clip(np.round(rgb), 0, 255).astype(np.uint8)
