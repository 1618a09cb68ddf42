"""From-scratch RIFF/AVI container with Motion-JPEG frames — the video
half of the multimodal decode seam.

MJPEG-in-AVI is a real public format (RIFF 'AVI ' container, 'vids'
stream with 'MJPG' handler, one baseline JPEG per '00dc' chunk); frames
ride through kernel/jpeg.py, so the whole video path — container parse,
frame sampling, pixel decode — is dependency-free and deterministic.
The writer emits a spec-shaped hdrl (avih + strl/strh/strf) so files
carry honest dimensions/fps/frame-count metadata; the reader walks
arbitrary chunk layouts and applies the shared containment contract
(ValueError for malformed streams, caps on hostile counts)."""

from __future__ import annotations

import struct

import numpy as np

from gmft_spark.kernel.jpeg import decode_jpeg, encode_jpeg

__all__ = ["encode_avi", "decode_avi_frames", "probe_avi"]

_MAX_FRAMES = 1 << 16


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi(
    frames: list[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """Encode uint8 frames (all same shape, (H, W) or (H, W, 3)) as an
    MJPEG AVI."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[0], frames[0].shape[1]
    jpegs = []
    for f in frames:
        if f.shape[0] != h or f.shape[1] != w:
            raise ValueError("all frames must share one shape")
        jpegs.append(encode_jpeg(f, quality=quality))
    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        1_000_000 // max(1, fps),  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags: no AVIF_HASINDEX — this writer emits no idx1
        len(jpegs),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # priority / language
            0,  # dwInitialFrames
            1,  # dwScale
            max(1, fps),  # dwRate
            0,  # dwStart
            len(jpegs),  # dwLength
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0: variable)
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def _walk(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body_start = pos + 8
        if body_start + size > end:
            raise ValueError(f"truncated {cid!r} chunk")
        yield cid, body_start, size
        pos = body_start + size + (size % 2)


def _require_avi(data: bytes) -> None:
    if (
        len(data) < 12
        or data[:4] != b"RIFF"
        or data[8:12] != b"AVI "
    ):
        raise ValueError("not an AVI (bad RIFF header)")


def probe_avi(data: bytes) -> dict:
    """Header-only metadata from avih: dims / fps / frame count."""
    _require_avi(data)
    for cid, start, size in _walk(data, 12, len(data)):
        if cid == b"LIST" and data[start : start + 4] == b"hdrl":
            for c2, s2, z2 in _walk(data, start + 4, start + size):
                if c2 == b"avih":
                    if z2 < 56:
                        raise ValueError("truncated avih")
                    vals = struct.unpack("<14I", data[s2 : s2 + 56])
                    usec = vals[0]
                    return {
                        "width": int(vals[8]),
                        "height": int(vals[9]),
                        "n_frames": int(vals[4]),
                        "fps": (
                            round(1_000_000.0 / usec, 3) if usec else 0.0
                        ),
                        "duration_ms": int(
                            round(vals[4] * usec / 1000.0)
                        ),
                    }
    raise ValueError("missing avih header")


def decode_avi_frames(
    data: bytes, frame_stride: int = 1
) -> list[np.ndarray]:
    """Decode every ``frame_stride``-th video frame (uint8 arrays).
    Frame sampling happens BEFORE pixel decode — skipped frames cost
    only the container walk, which is the point of stride sampling at
    corpus scale."""
    _require_avi(data)
    if frame_stride < 1:
        raise ValueError("frame_stride must be >= 1")
    out: list[np.ndarray] = []
    n_seen = 0
    found_movi = False
    for cid, start, size in _walk(data, 12, len(data)):
        if cid != b"LIST" or data[start : start + 4] != b"movi":
            continue
        found_movi = True

        def _movi_chunks(lo: int, hi: int):
            """Yield stream-00 video chunks, recursing into 'LIST rec '
            groups (the standard VfW interleaving layout — without the
            recursion such files decode to ZERO frames silently)."""
            for c2, s2, z2 in _walk(data, lo, hi):
                if c2 == b"LIST" and data[s2 : s2 + 4] == b"rec ":
                    yield from _movi_chunks(s2 + 4, s2 + z2)
                elif c2[:2] == b"00" and c2[2:4] in (b"dc", b"db"):
                    # only the FIRST video stream: a second stream's
                    # '01dc' chunks must not interleave into this one
                    yield s2, z2
        for s2, z2 in _movi_chunks(start + 4, start + size):
            if n_seen >= _MAX_FRAMES:
                raise ValueError("hostile frame count")
            if n_seen % frame_stride == 0:
                out.append(decode_jpeg(data[s2 : s2 + z2]))
            n_seen += 1
    if not found_movi:
        raise ValueError("missing movi list")
    return out
