"""Minimal MJPEG-in-AVI container mux/demux — pure stdlib.

Motion-JPEG inside a RIFF/AVI container is a real, widely-supported
video format (every frame is an independent baseline JPEG), and the
only one this dependency-free container can decode END TO END: the
demuxer walks the RIFF chunk tree to the ``movi`` list and yields the
``..dc``/``..db`` frame payloads; each payload decodes with
:mod:`.jpeg`. This closes the video seam in
:mod:`..operators.multimodal` honestly — MJPEG/AVI frame sampling is
REAL (container walk + JPEG decode), while inter-frame codecs
(H.264/VP9/AV1) remain the documented pyav/ffmpeg seam.

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

__all__ = ["AviFormatError", "mux_mjpeg_avi", "demux_mjpeg_frames", "avi_meta"]


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
