"""From-scratch GIF87a/89a codec — the web-corpus image/animation
format.

GIF is a real public format (logical screen descriptor + palettes +
LZW-compressed index streams in 255-byte sub-blocks): the decoder
handles global/local color tables, interlaced frames, transparency,
frame rects composited onto the logical screen (draw-over and
restore-background disposal), and the 89a extension blocks; the
encoder twin writes grayscale or paletted frames (optionally animated)
so every path is covered by exact roundtrips — GIF is lossless.

GIF LZW differs from the TIFF/PDF variant (kernel/tiff.py): LSB-first
bit packing, a variable minimum code size, a clear code of
``1 << mcs``, and NO early width change — the two coders are kept
separate on purpose.

Untrusted-input containment contract: ValueError for malformed
streams, caps on hostile dimensions/frame counts."""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

__all__ = [
    "encode_gif",
    "decode_gif_frames",
    "probe_gif",
    "gif_lzw_encode",
    "gif_lzw_decode",
]

_MAX_FRAMES = 1 << 12
_MAX_PIXELS = 64_000_000

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ── GIF-variant LZW ──────────────────────────────────────────────────


def gif_lzw_decode(data: bytes, mcs: int, expected: int) -> bytes:
    """LSB-first LZW with minimum code size ``mcs`` → exactly
    ``expected`` index bytes (GIF appendix F)."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad LZW minimum code size {mcs}")
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    table: List[Optional[bytes]] = []

    def reset() -> int:
        table.clear()
        table.extend(bytes([i]) for i in range(clear))
        table.append(None)  # clear
        table.append(None)  # end
        return mcs + 1

    width = reset()
    acc = 0
    nbits = 0
    prev: Optional[bytes] = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                width = reset()
                prev = None
                continue
            if code == end:
                if len(out) < expected:
                    raise ValueError(
                        f"short GIF LZW stream: {len(out)}/{expected}"
                    )
                return bytes(out[:expected])
            if prev is None:
                if code >= clear:
                    raise ValueError("bad first GIF LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if entry is None:
                    raise ValueError("bad GIF LZW code")
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and code < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("GIF LZW code out of range")
            out += entry
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    if len(out) < expected:
        raise ValueError(f"short GIF LZW stream: {len(out)}/{expected}")
    return bytes(out[:expected])


def gif_lzw_encode(data: bytes, mcs: int) -> bytes:
    """Mirror of :func:`gif_lzw_decode`: the width grows when the
    DECODER's table reaches ``1 << width`` (its table lags the
    encoder's by one entry until the next code arrives), and a clear
    is emitted when the table fills."""
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = mcs + 1
    emit(clear, width)
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    dec_len = end + 1
    first = True
    w = b""

    def after_emit() -> None:
        nonlocal dec_len, first, width
        if first:
            first = False
        elif dec_len < 4096:
            dec_len += 1
        if dec_len >= (1 << width) and width < 12:
            width += 1

    for byte in data:
        c = bytes([byte])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        after_emit()
        table[wc] = next_code
        next_code += 1
        w = c
        if next_code >= 4094:
            emit(clear, width)
            width = mcs + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            dec_len = end + 1
            first = True
    if w:
        emit(table[w], width)
        after_emit()
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ── container ────────────────────────────────────────────────────────


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(payload):
        chunk = payload[pos : pos + 255]
        out.append(len(chunk))
        out += chunk
        pos += 255
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> Tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("unterminated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("truncated sub-block")
        out += data[pos : pos + n]
        pos += n


_GRAY_PALETTE = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)


def encode_gif(
    frames: List[np.ndarray],
    palette: Optional[np.ndarray] = None,
    delay_cs: int = 10,
    interlace: bool = False,
) -> bytes:
    """Write a GIF89a. ``frames``: (h, w) uint8 index planes, all the
    same shape. ``palette``: (256, 3) uint8 (defaults to the identity
    gray ramp, making index == luminance). Multi-frame input writes an
    animation with per-frame graphic-control blocks."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    pal = _GRAY_PALETTE if palette is None else np.asarray(palette)
    if pal.shape != (256, 3):
        raise ValueError("palette must be (256, 3) uint8")
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, 8 bits/channel
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += pal.astype(np.uint8).tobytes()
    if len(frames) > 1:
        # NETSCAPE2.0 loop-forever application extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share one shape")
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + struct.pack(
                "<BHBB", 0x04, delay_cs, 0, 0
            )  # disposal 1 (draw over), no transparency
        flags = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, flags)
        idx = f.astype(np.uint8)
        if interlace:
            order = np.concatenate(
                [np.arange(s, h, step) for s, step in _INTERLACE_PASSES]
            )
            idx = idx[order]
        out.append(8)  # LZW minimum code size
        out += _sub_blocks(gif_lzw_encode(idx.tobytes(), 8))
    out += b"\x3b"
    return bytes(out)


def _parse_screen(data: bytes) -> Tuple[int, int, Optional[np.ndarray], int]:
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (
        b"7a",
        b"9a",
    ):
        raise ValueError("not a GIF (bad signature)")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        if pos + 3 * n > len(data):
            raise ValueError("truncated global color table")
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    return w, h, gct, pos


def probe_gif(data: bytes) -> dict:
    """Frame count + dims without decompressing any pixel data."""
    w, h, _gct, pos = _parse_screen(data)
    n_frames = 0
    delay_cs = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated extension")
            label = data[pos]
            body, pos = _read_sub_blocks(data, pos + 1)
            if label == 0xF9 and len(body) >= 4:
                delay_cs += struct.unpack_from("<H", body, 1)[0]
        elif b == 0x2C:  # image descriptor
            if pos + 9 > len(data):
                raise ValueError("truncated image descriptor")
            flags = data[pos + 8]
            pos += 9
            if flags & 0x80:
                pos += 3 * (2 << (flags & 7))
            pos += 1  # LZW mcs
            _blocks, pos = _read_sub_blocks(data, pos)
            n_frames += 1
            if n_frames > _MAX_FRAMES:
                raise ValueError("hostile frame count")
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    return {
        "width": int(w),
        "height": int(h),
        "n_frames": n_frames,
        "duration_ms": delay_cs * 10,
    }


def decode_gif_frames(
    data: bytes, frame_stride: int = 1
) -> List[np.ndarray]:
    """Decode every ``frame_stride``-th composited frame → (h, w, 3)
    uint8 RGB over the logical screen. Frame rects, local palettes,
    interlace, transparency and disposal 0/1/2 are honored; the
    composition runs over ALL frames (draw-over state is cumulative),
    only the pixel output is strided."""
    if frame_stride < 1:
        raise ValueError("frame_stride must be >= 1")
    w, h, gct, pos = _parse_screen(data)
    if w * h > _MAX_PIXELS or w <= 0 or h <= 0:
        raise ValueError("bad GIF dimensions")
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    frames: List[np.ndarray] = []
    k = 0
    transparent: Optional[int] = None
    disposal = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:
            if pos >= len(data):
                raise ValueError("truncated extension")
            label = data[pos]
            body, pos = _read_sub_blocks(data, pos + 1)
            if label == 0xF9 and len(body) >= 4:
                gflags = body[0]
                disposal = (gflags >> 2) & 7
                transparent = body[3] if gflags & 1 else None
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        fx, fy, fw, fh, flags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if fx + fw > w or fy + fh > h or fw <= 0 or fh <= 0:
            raise ValueError("frame rect outside logical screen")
        pal = gct
        if flags & 0x80:
            n = 2 << (flags & 7)
            if pos + 3 * n > len(data):
                raise ValueError("truncated local color table")
            pal = np.frombuffer(
                data[pos : pos + 3 * n], np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("frame without any color table")
        mcs = data[pos]
        pos += 1
        blocks, pos = _read_sub_blocks(data, pos)
        idx = np.frombuffer(
            gif_lzw_decode(blocks, mcs, fw * fh), np.uint8
        ).reshape(fh, fw)
        if flags & 0x40:  # interlaced: invert the pass permutation
            order = np.concatenate(
                [np.arange(s, fh, step) for s, step in _INTERLACE_PASSES]
            )
            de = np.empty_like(idx)
            de[order] = idx
            idx = de
        if idx.max(initial=0) >= len(pal):
            raise ValueError("palette index out of range")
        prev = canvas.copy() if disposal == 3 else None
        rgb = pal[idx]
        region = canvas[fy : fy + fh, fx : fx + fw]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        if k % frame_stride == 0:
            frames.append(canvas.copy())
        k += 1
        if k > _MAX_FRAMES:
            raise ValueError("hostile frame count")
        if disposal == 2:  # restore region to background
            canvas[fy : fy + fh, fx : fx + fw] = 0
        elif disposal == 3 and prev is not None:  # restore previous
            canvas = prev
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("GIF carries no image data")
    return frames
