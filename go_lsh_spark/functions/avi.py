"""Minimal AVI (RIFF) container: MJPEG video demux + a writer for tests.

Public-spec sources only: the RIFF/AVI container layout (Microsoft "AVI RIFF
File Reference": RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
LIST('movi' 00dc...) idx1), BITMAPINFOHEADER) and ITU-T T.81 for the JPEG
frames themselves, decoded by the sibling baseline codec
(go_lsh_spark/functions/jpeg.py). Motion-JPEG is the one mainstream video
codec expressible without an entropy/inter-frame engine: every frame is an
independent baseline JPEG, so container demux + the existing still decoder
IS the video decoder.

Scope: single 'vids' stream, MJPG fourcc, grayscale-or-color frames (color
reduced to Rec.601 luma by the caller); no audio streams, no OpenDML
extensions (AVIX), no B/P frames (MJPEG has none). On a real cluster this
module is replaced by an ffmpeg-backed demuxer behind the same
decode_video_frames signature (functions/multimodal.py) -- the Spark-side
plumbing (schema, partitioning, Arrow batching) is identical either way.

The reference repo has no multimodal surface; this extends the driver's
multimodal mandate (BASELINE.json graft axes) like functions/jpeg.py does.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """RIFF chunk: fourcc + u32le size + payload, padded to even length."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: np.ndarray, quality: int = 90, fps: int = 25
) -> bytes:
    """(n, h, w) uint8 grayscale frames -> MJPEG-in-AVI bytes.

    Test-fixture writer (the decoder is the production-shaped path): each
    frame is encoded with the baseline JPEG encoder and wrapped in '00dc'
    chunks under LIST('movi'), with a standard idx1 keyframe index."""
    from go_lsh_spark.functions.jpeg import encode_jpeg_gray  # noqa: PLC0415

    if frames.ndim != 3:
        raise ValueError("frames must be (n, h, w) uint8")
    n, h, w = frames.shape
    jpegs = [encode_jpeg_gray(f, quality=quality) for f in frames]
    max_size = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,      # dwMicroSecPerFrame
        max_size * fps,        # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        0x10,                  # dwFlags: AVIF_HASINDEX
        n,                     # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        max_size,              # dwSuggestedBufferSize
        w, h,                  # dwWidth, dwHeight
        0, 0, 0, 0,            # dwReserved
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIii4H",
            0, 0, 0,           # dwFlags, wPriority, wLanguage
            0,                 # dwInitialFrames
            1, fps,            # dwScale, dwRate -> rate/scale = fps
            0, n,              # dwStart, dwLength (frames)
            max_size,          # dwSuggestedBufferSize
            -1, 0,             # dwQuality, dwSampleSize
            0, 0, w, h,        # rcFrame
        )
    )
    # BITMAPINFOHEADER with biCompression = 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)

    # idx1: one AVIINDEXENTRY per frame; offsets are relative to the start
    # of the 'movi' list type fourcc (the common convention)
    idx_entries, off = [], 4
    for j in jpegs:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking a chunk range."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = pos + 8
        if payload + size > end:
            raise ValueError("truncated AVI chunk")
        yield fourcc, payload, size
        pos = payload + size + (size % 2)


def decode_avi_mjpeg(raw: bytes) -> np.ndarray:
    """MJPEG-in-AVI bytes -> (n, h, w) uint8 grayscale frames.

    Walks the RIFF tree: avih supplies (width, height, total frames); every
    '00dc'/'00db' chunk under LIST('movi') is an independent baseline JPEG
    decoded by functions/jpeg.py (color frames reduce to Rec.601 luma).
    idx1, if present, is cross-checked against the frames actually found."""
    from go_lsh_spark.functions.jpeg import decode_jpeg  # noqa: PLC0415
    from go_lsh_spark.functions.multimodal import to_gray  # noqa: PLC0415

    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF) stream")
    (riff_size,) = struct.unpack_from("<I", raw, 4)
    end = min(8 + riff_size, len(raw))
    if 8 + riff_size > len(raw):
        raise ValueError("truncated AVI stream")

    meta = None
    frames: list[np.ndarray] = []
    n_index = None
    for fourcc, p, size in _iter_chunks(raw, 12, end):
        if fourcc == b"LIST":
            ltype = raw[p : p + 4]
            if ltype == b"hdrl":
                for f2, p2, s2 in _iter_chunks(raw, p + 4, p + size):
                    if f2 == b"avih":
                        if s2 < 40:
                            raise ValueError("truncated AVI avih header")
                        vals = struct.unpack_from("<10I", raw, p2)
                        meta = {"n": vals[4], "w": vals[8], "h": vals[9]}
            elif ltype == b"movi":
                for f2, p2, s2 in _iter_chunks(raw, p + 4, p + size):
                    if f2[2:4] in (b"dc", b"db"):
                        frames.append(to_gray(decode_jpeg(raw[p2 : p2 + s2])))
        elif fourcc == b"idx1":
            n_index = size // 16
    if meta is None:
        raise ValueError("AVI missing avih header")
    if not frames:
        raise ValueError("AVI has no video frames")
    if meta["n"] and len(frames) != meta["n"]:
        raise ValueError(
            f"AVI frame count mismatch: header {meta['n']}, movi {len(frames)}"
        )
    if n_index is not None and n_index != len(frames):
        raise ValueError(
            f"AVI idx1 mismatch: index {n_index} entries, movi {len(frames)}"
        )
    for f in frames:
        if f.shape != (meta["h"], meta["w"]):
            raise ValueError(
                f"AVI frame size mismatch: {f.shape} != {meta['h']}x{meta['w']}"
            )
    return np.stack(frames)
