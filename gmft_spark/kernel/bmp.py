"""From-scratch Windows BMP (DIB) codec — reader + writer twin.

Pure-spec implementation of the public BITMAPFILEHEADER +
BITMAPINFOHEADER format: 1/4/8-bit palette, 24-bit BGR and 32-bit BGRx
pixels, BI_RGB, BI_RLE8 and BI_RLE4 compressions (RLE4's encoded runs
alternate the two nibbles of the value byte; absolute mode packs
nibbles high-first and pads to a word boundary), bottom-up (positive
height) and top-down (negative height) row orders, 4-byte row stride
padding.
Later header revisions (V4/V5) parse through the same first-40-byte
layout; the OS/2 BITMAPCOREHEADER (12 bytes, u16 dimensions, BGR
triple palettes) decodes too. The writer is the roundtrip-test twin
(tests/test_bmp.py):
every supported encoding is lossless, so decode(encode(x)) is
bit-exact.

Output convention matches the other image codecs (kernel/raster,
kernel/jpeg, kernel/tiff): ``decode_bmp`` returns (h, w, 3) uint8 RGB
(the multimodal luma collapse recognizes R==G==B gray). Malformed
input raises ``ValueError``.

Scale note: payloads decode inside mapInPandas narrow maps
(operators/multimodal.py) — bytes never leave their scan partition.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

__all__ = ["decode_bmp", "encode_bmp", "bmp_info"]

_MAX_PIXELS = 64_000_000


def _read_headers(data: bytes):
    if len(data) < 26 or data[:2] != b"BM":
        raise ValueError("not a BMP (bad magic or too short)")
    (data_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size == 12:  # OS/2 BITMAPCOREHEADER: u16 dims, RGB triples
        (w, h, planes, bits) = struct.unpack_from("<HHHH", data, 18)
        comp = 0
        clr_used = 0
        top_down = False
        core = True
    elif hdr_size < 40:
        raise NotImplementedError(f"unknown {hdr_size}-byte BMP header")
    else:
        if len(data) < 54:
            raise ValueError("truncated BMP info header")
        (w, h, planes, bits, comp, _simg, _xp, _yp, clr_used, _ci) = (
            struct.unpack_from("<iiHHIIiiII", data, 18)
        )
        top_down = h < 0
        h = abs(h)
        core = False
    if planes != 1:
        raise ValueError(f"bad plane count {planes}")
    if w <= 0 or h <= 0:
        raise ValueError("missing/invalid image dimensions")
    if w * h > _MAX_PIXELS:
        raise ValueError("BMP dimensions exceed decoder cap")
    pal_off = 14 + hdr_size
    return data_off, w, h, bits, comp, clr_used, top_down, pal_off, core


def bmp_info(data: bytes) -> dict:
    """Header-only probe (metadata queries stay cheap)."""
    (_off, w, h, bits, comp, clr_used, top_down, _p, _core) = (
        _read_headers(data)
    )
    return {
        "width": w,
        "height": h,
        "bits": bits,
        "compression": comp,
        "colors_used": clr_used,
        "top_down": top_down,
    }


def _read_palette(
    data: bytes, pal_off: int, bits: int, clr_used: int, core: bool = False
) -> np.ndarray:
    n = clr_used if clr_used else (1 << bits)
    if n > 256:
        raise ValueError("hostile palette size")
    per = 3 if core else 4  # OS/2 core palettes are BGR triples
    end = pal_off + per * n
    if end > len(data):
        raise ValueError("palette outruns file")
    quads = np.frombuffer(data[pal_off:end], dtype=np.uint8).reshape(n, per)
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[:n] = quads[:, [2, 1, 0]]  # BGR(A) → RGB
    return pal


def _decode_rle8(
    data: bytes, off: int, w: int, h: int
) -> np.ndarray:
    """BI_RLE8 → (h, w) uint8 index plane in BOTTOM-UP storage order
    (caller flips). Escapes: 0=EOL, 1=EOB, 2=delta, n>=3 literal run
    padded to a word boundary."""
    idx = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i = off
    n = len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            run = min(cnt, w - x)
            idx[y, x : x + run] = val
            x += run
            continue
        if val == 0:  # end of line
            x, y = 0, y + 1
            if y >= h:
                break
        elif val == 1:  # end of bitmap
            return idx
        elif val == 2:  # delta
            if i + 1 >= n:
                raise ValueError("RLE8 delta missing offsets")
            x = min(w, x + data[i])
            y += data[i + 1]
            if y >= h:
                raise ValueError("RLE8 delta leaves bitmap")
            i += 2
        else:  # literal run of `val` bytes, word-aligned
            j = i + val
            if j > n:
                raise ValueError("RLE8 literal overruns input")
            run = min(val, w - x)
            idx[y, x : x + run] = np.frombuffer(
                data[i : i + run], dtype=np.uint8
            )
            x += val
            x = min(x, w)
            i = j + (val & 1)
    return idx


def _decode_rle4(data: bytes, off: int, w: int, h: int) -> np.ndarray:
    """BI_RLE4 → (h, w) uint8 index plane in BOTTOM-UP storage order
    (caller flips). Encoded runs alternate the value byte's high and
    low nibbles; absolute runs (escape n>=3) carry n nibbles packed
    high-first, padded to a 16-bit boundary. Escapes 0/1/2 are
    EOL/EOB/delta, as in RLE8."""
    idx = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i = off
    n = len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run: nibbles alternate hi, lo, hi, ...
            run = min(cnt, w - x)
            pat = np.tile(
                np.array([val >> 4, val & 0xF], dtype=np.uint8),
                (run + 1) // 2 + 1,
            )
            idx[y, x : x + run] = pat[:run]
            x += run
            continue
        if val == 0:  # end of line
            x, y = 0, y + 1
            if y >= h:
                break
        elif val == 1:  # end of bitmap
            return idx
        elif val == 2:  # delta
            if i + 1 >= n:
                raise ValueError("RLE4 delta missing offsets")
            x = min(w, x + data[i])
            y += data[i + 1]
            if y >= h:
                raise ValueError("RLE4 delta leaves bitmap")
            i += 2
        else:  # absolute run of `val` nibbles, word-aligned
            nbytes = (val + 1) // 2
            if i + nbytes > n:
                raise ValueError("RLE4 absolute run overruns input")
            byts = np.frombuffer(data[i : i + nbytes], dtype=np.uint8)
            nibs = np.empty(2 * nbytes, dtype=np.uint8)
            nibs[0::2] = byts >> 4
            nibs[1::2] = byts & 0xF
            run = min(val, w - x)
            idx[y, x : x + run] = nibs[:run]
            x = min(x + val, w)
            i += nbytes + (nbytes & 1)
    return idx


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode BMP bytes → (h, w, 3) uint8 RGB."""
    (data_off, w, h, bits, comp, clr_used, top_down, pal_off, core) = (
        _read_headers(data)
    )
    if comp == 1:  # BI_RLE8
        if bits != 8:
            raise ValueError("BI_RLE8 requires 8-bit pixels")
        pal = _read_palette(data, pal_off, bits, clr_used)
        idx = _decode_rle8(data, data_off, w, h)
        if not top_down:
            idx = idx[::-1]
        return np.ascontiguousarray(pal[idx])
    if comp == 2:  # BI_RLE4
        if bits != 4:
            raise ValueError("BI_RLE4 requires 4-bit pixels")
        pal = _read_palette(data, pal_off, bits, clr_used)
        idx = _decode_rle4(data, data_off, w, h)
        if not top_down:
            idx = idx[::-1]
        return np.ascontiguousarray(pal[idx])
    if comp not in (0, 3):
        raise ValueError(f"unsupported BMP compression {comp}")
    if comp == 3 and bits not in (16, 32):
        raise ValueError("BI_BITFIELDS requires 16/32-bit pixels")
    if comp == 3:
        # masks live right after the info header; only the canonical
        # 8-8-8 layout (the one every writer emits for 32-bit) decodes
        masks = struct.unpack_from("<III", data, pal_off)
        if bits != 32 or masks != (0xFF0000, 0xFF00, 0xFF):
            raise NotImplementedError("non-canonical BI_BITFIELDS masks")
    if bits not in (1, 4, 8, 24, 32):
        raise NotImplementedError(f"{bits}-bit BMP pixels")
    stride = ((w * bits + 31) // 32) * 4
    need = data_off + stride * h
    if need > len(data):
        raise ValueError("pixel data outruns file")
    raw = np.frombuffer(
        data[data_off : data_off + stride * h], dtype=np.uint8
    ).reshape(h, stride)
    if not top_down:
        raw = raw[::-1]
    if bits == 24:
        px = raw[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
        return np.ascontiguousarray(px)
    if bits == 32:
        px = raw[:, : 4 * w].reshape(h, w, 4)[:, :, [2, 1, 0]]
        return np.ascontiguousarray(px)
    pal = _read_palette(data, pal_off, bits, clr_used, core)
    if bits == 8:
        idx = raw[:, :w]
    elif bits == 4:
        nib = np.empty((h, 2 * stride), dtype=np.uint8)
        nib[:, 0::2] = raw >> 4
        nib[:, 1::2] = raw & 0xF
        idx = nib[:, :w]
    else:  # 1-bit, MSB first
        idx = np.unpackbits(raw, axis=1)[:, :w]
    return np.ascontiguousarray(pal[idx])


def _p2run(line: np.ndarray, x: int, w: int) -> int:
    """Length of the period-2 nibble run at ``x`` (capped at 255): the
    longest stretch where pixel x+k equals pixel x+(k%2) — the pattern
    one RLE4 encoded pair (cnt, hi|lo) reproduces."""
    cap = min(w - x, 255)
    run = min(2, cap)
    while run < cap and line[x + run] == line[x + (run & 1)]:
        run += 1
    return run


def _encode_rle4(rows: np.ndarray, h: int, w: int) -> bytes:
    """BI_RLE4 writer: period-2 encoded runs where they pay (>= 3 px),
    absolute-mode nibble stretches (>= 3 px, word-padded) elsewhere,
    encoded 1-2 px stragglers, EOL per row, EOB at the end."""
    body = bytearray()
    for y in range(h):
        line = rows[y]
        x = 0
        while x < w:
            run = _p2run(line, x, w)
            if run >= 3:
                hi = int(line[x])
                lo = int(line[x + 1])
                body += bytes([run, (hi << 4) | lo])
                x += run
                continue
            # literal stretch until a paying period-2 run begins
            j = x
            while j < w and (j - x) < 255 and _p2run(line, j, w) < 4:
                j += 1
            lit = j - x
            if lit >= 3:
                nibs = line[x:j]
                packed = bytearray()
                for k in range(0, lit, 2):
                    hi = int(nibs[k])
                    lo = int(nibs[k + 1]) if k + 1 < lit else 0
                    packed.append((hi << 4) | lo)
                if len(packed) & 1:
                    packed.append(0)
                body += bytes([0, lit]) + bytes(packed)
                x = j
            else:  # 1-2 stragglers: encoded pairs
                take = max(lit, 1)
                hi = int(line[x])
                lo = int(line[x + 1]) if take == 2 else 0
                body += bytes([take, (hi << 4) | lo])
                x += take
        body += b"\x00\x00"  # EOL
    body += b"\x00\x01"  # EOB
    return bytes(body)


def _gray_palette() -> np.ndarray:
    g = np.arange(256, dtype=np.uint8)
    return np.stack([g, g, g], axis=1)


def encode_bmp(
    arr: np.ndarray,
    bits: int = 24,
    rle: bool = False,
    top_down: bool = False,
    palette: Optional[np.ndarray] = None,
) -> bytes:
    """Write a BMP. ``arr``: (h, w, 3) uint8 RGB for ``bits`` 24/32;
    (h, w) uint8 index/gray plane for ``bits`` 8 (``palette`` (n, 3)
    RGB, default identity gray), values < 16 for ``bits`` 4, {0, 1}
    for ``bits`` 1 (palette rows 0/1 default black/white). ``rle``
    writes BI_RLE8 (``bits`` 8) or BI_RLE4 (``bits`` 4; period-2
    encoded runs where they pay, absolute-mode nibble stretches
    elsewhere — both decoder paths exercised by roundtrips)."""
    arr = np.asarray(arr)
    if bits in (24, 32):
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise ValueError("24/32-bit BMP needs (h, w, 3) RGB")
        h, w = arr.shape[:2]
    else:
        if arr.ndim != 2:
            raise ValueError("palette BMP needs a 2-D index plane")
        h, w = arr.shape
        if arr.max(initial=0) >= (1 << bits):
            raise ValueError(f"index plane overflows {bits}-bit palette")
    if bits not in (1, 4, 8, 24, 32):
        raise ValueError("bits must be 1, 4, 8, 24 or 32")
    if rle and bits not in (4, 8):
        raise ValueError("RLE is written for 4/8-bit planes only")

    pal_bytes = b""
    n_colors = 0
    if bits <= 8:
        if palette is None:
            pal = (
                _gray_palette()[: 1 << bits]
                if bits > 1
                else np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
            )
        else:
            pal = np.asarray(palette, dtype=np.uint8)
            if pal.ndim != 2 or pal.shape[1] != 3 or pal.shape[0] > 256:
                raise ValueError("palette must be (n<=256, 3) RGB")
        n_colors = pal.shape[0]
        quads = np.zeros((n_colors, 4), dtype=np.uint8)
        quads[:, :3] = pal[:, ::-1]  # RGB → BGRA quads
        pal_bytes = quads.tobytes()

    rows = arr if top_down else arr[::-1]
    if rle and bits == 8:
        body = bytearray()
        for y in range(h):
            line = rows[y]
            x = 0
            while x < w:
                run = 1
                while (
                    x + run < w and line[x + run] == line[x] and run < 255
                ):
                    run += 1
                body += bytes([run, int(line[x])])
                x += run
            body += b"\x00\x00"  # EOL
        body += b"\x00\x01"  # EOB
        pixel = bytes(body)
        comp = 1
    elif rle:  # bits == 4
        pixel = _encode_rle4(rows, h, w)
        comp = 2
    else:
        stride = ((w * bits + 31) // 32) * 4
        if bits == 24:
            line = rows[:, :, ::-1].reshape(h, 3 * w)
        elif bits == 32:
            bgrx = np.zeros((h, w, 4), dtype=np.uint8)
            bgrx[:, :, :3] = rows[:, :, ::-1]
            line = bgrx.reshape(h, 4 * w)
        elif bits == 8:
            line = rows
        elif bits == 4:
            padded_w = 2 * ((w + 1) // 2)
            nib = np.zeros((h, padded_w), dtype=np.uint8)
            nib[:, :w] = rows
            line = (nib[:, 0::2] << 4) | nib[:, 1::2]
        else:  # 1-bit
            line = np.packbits(rows.astype(np.uint8), axis=1)
        padded = np.zeros((h, stride), dtype=np.uint8)
        padded[:, : line.shape[1]] = line
        pixel = padded.tobytes()
        comp = 0

    data_off = 14 + 40 + len(pal_bytes)
    info = struct.pack(
        "<IiiHHIIiiII",
        40,
        w,
        -h if top_down else h,
        1,
        bits,
        comp,
        len(pixel),
        2835,
        2835,
        n_colors,
        0,
    )
    head = struct.pack(
        "<2sIHHI", b"BM", data_off + len(pixel), 0, 0, data_off
    )
    return head + info + pal_bytes + pixel
