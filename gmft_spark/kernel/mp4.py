"""From-scratch ISO BMFF (MP4) container with Motion-JPEG samples — the
last video container seam.

MJPEG-in-MP4 is a real public format (ISO/IEC 14496-12 box structure,
a ``vide`` track whose sample description is the ``jpeg`` visual sample
entry, one baseline JPEG per sample): frames ride through
kernel/jpeg.py, so the whole path — box walk, sample-table resolution
(stsd/stts/stsc/stsz/stco|co64), stride sampling, pixel decode — is
dependency-free and deterministic. The writer emits a spec-shaped
ftyp + mdat + moov tree with honest dimensions/timescale metadata; the
reader resolves arbitrary chunk layouts through the sample tables and
applies the shared containment contract (ValueError for malformed
streams, caps on hostile counts, NotImplementedError only for genuinely
foreign codecs like avc1/hevc where ffmpeg would plug in)."""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from gmft_spark.kernel.jpeg import decode_jpeg, encode_jpeg

__all__ = ["encode_mp4", "decode_mp4_frames", "probe_mp4"]

_MAX_SAMPLES = 1 << 16
_MAX_DEPTH = 8
_MJPEG_CODECS = (b"jpeg", b"mjpa", b"mjpb")


# ── box building ─────────────────────────────────────────────────────


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + body)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def encode_mp4(
    frames: List[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """Encode uint8 frames (all same shape, (H, W) or (H, W, 3)) as an
    MJPEG MP4: ftyp + mdat (concatenated JPEG samples) + moov whose
    sample tables describe one chunk holding every sample."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[0], frames[0].shape[1]
    jpegs = []
    for f in frames:
        if f.shape[0] != h or f.shape[1] != w:
            raise ValueError("all frames must share one shape")
        jpegs.append(encode_jpeg(f, quality=quality))
    fps = max(1, fps)
    n = len(jpegs)
    timescale = fps * 1000
    duration = n * 1000

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(jpegs))
    chunk_offset = len(ftyp) + 8  # mdat payload start in the final file

    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iHH", 0x00010000, 0x0100, 0)
        + b"\0" * 8
        + _UNITY_MATRIX
        + b"\0" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd",
        0,
        3,  # enabled + in-movie
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\0" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0, b"\0" * 4 + b"vide" + b"\0" * 12 + b"MJPEG\0"
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(
        b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")
    )
    dinf = _box(b"dinf", dref)
    sample_entry = _box(
        b"jpeg",
        b"\0" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\0" * 16  # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\0" * 4
        + struct.pack(">H", 1)  # frame_count per sample
        + b"\x05MJPEG" + b"\0" * 26  # compressorname (pascal, 32 B)
        + struct.pack(">Hh", 24, -1),
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1000))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n)
        + struct.pack(f">{n}I", *(len(j) for j in jpegs)),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ── box walking ──────────────────────────────────────────────────────


def _walk(data: bytes, pos: int, end: int) -> Iterator[Tuple[bytes, int, int]]:
    """Yield (type, body_start, body_size) for the boxes in [pos, end)."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError("truncated 64-bit box header")
            (size,) = struct.unpack_from(">Q", data, body)
            body += 8
            size -= 16
        elif size == 0:  # to end of enclosing scope
            size = end - pos - 8
        else:
            size -= 8
        if size < 0 or body + size > end:
            raise ValueError(f"truncated {btype!r} box")
        yield btype, body, size
        pos = body + size


def _find(
    data: bytes, pos: int, end: int, path: Tuple[bytes, ...], depth: int = 0
) -> Optional[Tuple[int, int]]:
    if depth > _MAX_DEPTH:
        raise ValueError("box tree too deep")
    for btype, body, size in _walk(data, pos, end):
        if btype == path[0]:
            if len(path) == 1:
                return body, size
            hit = _find(data, body, body + size, path[1:], depth + 1)
            if hit is not None:
                return hit
    return None


def _require_mp4(data: bytes) -> None:
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 (missing ftyp)")


def _video_sample_tables(data: bytes) -> Dict[str, object]:
    """Resolve the first ``vide`` track's sample tables into absolute
    per-sample (offset, size) plus codec + dimensions + timing."""
    moov = _find(data, 0, len(data), (b"moov",))
    if moov is None:
        raise ValueError("missing moov")
    m0, msz = moov
    for btype, body, size in _walk(data, m0, m0 + msz):
        if btype != b"trak":
            continue
        hdlr = _find(data, body, body + size, (b"mdia", b"hdlr"))
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        stbl = _find(
            data, body, body + size, (b"mdia", b"minf", b"stbl")
        )
        mdhd = _find(data, body, body + size, (b"mdia", b"mdhd"))
        if stbl is None or mdhd is None:
            raise ValueError("video track lacks stbl/mdhd")
        boxes: Dict[bytes, Tuple[int, int]] = {}
        for bt, bb, bs in _walk(data, stbl[0], stbl[0] + stbl[1]):
            boxes[bt] = (bb, bs)
        for need in (b"stsd", b"stsz", b"stsc"):
            if need not in boxes:
                raise ValueError(f"missing {need.decode()} table")
        if b"stco" not in boxes and b"co64" not in boxes:
            raise ValueError("missing chunk-offset table")
        # stsd → codec fourcc + dims (bounds-checked: a truncated box
        # must raise ValueError, not leak struct.error)
        sb, ss = boxes[b"stsd"]
        entry = sb + 8
        if sb + 8 > len(data) or entry + 36 > len(data) or ss < 8 + 36:
            raise ValueError("truncated stsd")
        (n_desc,) = struct.unpack_from(">I", data, sb + 4)
        if n_desc < 1:
            raise ValueError("empty stsd")
        codec = data[entry + 4 : entry + 8]
        width, height = struct.unpack_from(">HH", data, entry + 32)
        # stsz
        zb, zs = boxes[b"stsz"]
        fixed, n_samples = struct.unpack_from(">II", data, zb + 4)
        if n_samples > _MAX_SAMPLES:
            raise ValueError("hostile sample count")
        if fixed:
            sizes = [fixed] * n_samples
        else:
            if zb + 12 + 4 * n_samples > zb + zs:
                raise ValueError("truncated stsz")
            sizes = list(
                struct.unpack_from(f">{n_samples}I", data, zb + 12)
            )
        # chunk offsets
        if b"stco" in boxes:
            cb, cs = boxes[b"stco"]
            (n_chunks,) = struct.unpack_from(">I", data, cb + 4)
            if cb + 8 + 4 * n_chunks > cb + cs:
                raise ValueError("truncated stco")
            chunk_offs = list(
                struct.unpack_from(f">{n_chunks}I", data, cb + 8)
            )
        else:
            cb, cs = boxes[b"co64"]
            (n_chunks,) = struct.unpack_from(">I", data, cb + 4)
            if cb + 8 + 8 * n_chunks > cb + cs:
                raise ValueError("truncated co64")
            chunk_offs = list(
                struct.unpack_from(f">{n_chunks}Q", data, cb + 8)
            )
        # stsc runs → samples per chunk
        kb, ks = boxes[b"stsc"]
        (n_runs,) = struct.unpack_from(">I", data, kb + 4)
        if kb + 8 + 12 * n_runs > kb + ks:
            raise ValueError("truncated stsc")
        runs = [
            struct.unpack_from(">III", data, kb + 8 + 12 * i)
            for i in range(n_runs)
        ]
        # resolve absolute sample offsets
        offsets: List[int] = []
        si = 0
        for ri, (first, per_chunk, _desc) in enumerate(runs):
            last = (
                runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(chunk_offs)
            )
            if first < 1:
                # first_chunk is 1-based; 0 would index chunk_offs[-1]
                raise ValueError("bad stsc first_chunk 0")
            for ci in range(first - 1, last):
                if ci >= len(chunk_offs):
                    break
                pos = chunk_offs[ci]
                for _ in range(per_chunk):
                    if si >= n_samples:
                        break
                    offsets.append(pos)
                    pos += sizes[si]
                    si += 1
        if si < n_samples:
            raise ValueError("sample tables resolve too few samples")
        # mdhd: version 1 carries 64-bit times, shifting
        # timescale/duration to offsets 20/24 (duration 64-bit)
        if mdhd[0] + 4 > len(data):
            raise ValueError("truncated mdhd")
        version = data[mdhd[0]]
        if version == 1:
            if mdhd[0] + 32 > len(data):
                raise ValueError("truncated mdhd v1")
            (timescale,) = struct.unpack_from(">I", data, mdhd[0] + 20)
            (duration,) = struct.unpack_from(">Q", data, mdhd[0] + 24)
        else:
            if mdhd[0] + 20 > len(data):
                raise ValueError("truncated mdhd")
            timescale, duration = struct.unpack_from(
                ">II", data, mdhd[0] + 12
            )
        return {
            "codec": codec,
            "width": int(width),
            "height": int(height),
            "sizes": sizes,
            "offsets": offsets,
            "timescale": int(timescale),
            "duration": int(duration),
        }
    raise ValueError("no video track")


def probe_mp4(data: bytes) -> dict:
    """Sample-table metadata without decoding any frame."""
    _require_mp4(data)
    t = _video_sample_tables(data)
    ts = t["timescale"] or 1
    return {
        "codec": t["codec"].decode("latin-1"),
        "width": t["width"],
        "height": t["height"],
        "n_frames": len(t["sizes"]),
        "duration_ms": int(round(1000.0 * t["duration"] / ts)),
    }


def decode_mp4_frames(
    data: bytes, frame_stride: int = 1
) -> list[np.ndarray]:
    """Decode every ``frame_stride``-th sample of the first video track
    (sampling happens BEFORE pixel decode — skipped samples cost
    nothing). MJPEG tracks decode natively through kernel/jpeg.py;
    foreign codecs (avc1/hev1/vp09...) are the documented ffmpeg seam."""
    _require_mp4(data)
    if frame_stride < 1:
        raise ValueError("frame_stride must be >= 1")
    t = _video_sample_tables(data)
    if t["codec"] not in _MJPEG_CODECS:
        raise NotImplementedError(
            f"codec {t['codec']!r} needs ffmpeg on executors; "
            "install and implement here"
        )
    frames = []
    for i in range(0, len(t["sizes"]), frame_stride):
        off, size = t["offsets"][i], t["sizes"][i]
        if off + size > len(data):
            raise ValueError("sample outruns file")
        frames.append(decode_jpeg(data[off : off + size]))
    return frames
