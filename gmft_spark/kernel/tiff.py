"""From-scratch TIFF 6.0 codec (reader + writer twin).

The reader parses both byte orders (``II``/``MM``), walks the first
IFD, assembles multi-strip images, and decompresses through the repo's
own from-scratch codecs: LZW (the shared PDF/TIFF variant in
sources/pdfparse/objects.py), PackBits (here), CCITT Group 3/4
(kernel/ccitt.py), and new-style JPEG-in-TIFF (compression 7 with
JPEGTables splicing, kernel/jpeg.py). Horizontal-differencing
predictor 2, FillOrder 2 bit reversal, and bilevel/gray/palette/RGB/
YCbCr-JPEG photometrics are supported. The writer is the
roundtrip-test twin (tests/test_tiff.py) and also feeds the multimodal
gate parity query — every supported compression EXCEPT jpeg is
lossless, so decode(encode(x)) must be bit-exact (jpeg roundtrips
bit-exact only for flat-DC content at quality >= 90, the codec-parity
recipe in kernel/jpeg.py).

Output convention: ``decode_tiff`` returns DISPLAY luminance/color —
``(h, w) uint8`` grayscale (photometric applied: WhiteIsZero inverts)
or ``(h, w, 3) uint8`` RGB for photometric 2/3/6. Malformed input
raises ``ValueError``; genuinely unsupported corners (tiles, planar=2,
16-bit samples, old-style compression-6 JPEG, RGB-stored JPEG) raise
``NotImplementedError`` at the exact seam.

Scale note: payloads decode inside mapInPandas narrow maps
(operators/multimodal.py) — bytes never leave their scan partition.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from gmft_spark.kernel.ccitt import (
    decode_g3_1d,
    decode_g4,
    encode_g3_1d,
    encode_g4,
)
from gmft_spark.kernel.jpeg import decode_jpeg, encode_jpeg
from gmft_spark.sources.pdfparse.objects import _lzw_decode

__all__ = [
    "decode_tiff",
    "encode_tiff",
    "tiff_info",
    "lzw_encode",
    "packbits_decode",
    "packbits_encode",
]

# tag ids (TIFF 6.0 §8)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BPS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_FILLORDER = 266
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_T4OPTIONS = 292
_T_T6OPTIONS = 293
_T_PREDICTOR = 317
_T_COLORMAP = 320
_T_TILE_WIDTH = 322
_T_JPEGTABLES = 347

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

# FillOrder 2: every byte bit-reversed
_BITREV = bytes.maketrans(
    bytes(range(256)),
    bytes(int(f"{b:08b}"[::-1], 2) for b in range(256)),
)


# ── PackBits (TIFF 6.0 §9) ───────────────────────────────────────────


def packbits_decode(data: bytes, expected: Optional[int] = None) -> bytes:
    """Apple PackBits RLE decode. ``expected`` bounds the output (strip
    decoders stop exactly at the strip's byte count)."""
    out = bytearray()
    i = 0
    n = len(data)
    limit = expected if expected is not None else 1 << 31
    while i < n and len(out) < limit:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            j = i + h + 1
            if j > n:
                raise ValueError("PackBits literal overruns input")
            out += data[i:j]
            i = j
        elif h > 128:  # replicate next byte 257-h times
            if i >= n:
                raise ValueError("PackBits replicate missing byte")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op
    if expected is not None and len(out) < expected:
        raise ValueError(f"short PackBits strip: {len(out)}/{expected}")
    return bytes(out[:limit])


def packbits_encode(data: bytes) -> bytes:
    """PackBits encode (replicate runs >= 3, literals otherwise)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # measure replicate run
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i = j + 1
            continue
        # literal: extend until a >=3 replicate run starts or 128 cap
        lit_start = i
        while i < n and i - lit_start < 128:
            if (
                i + 2 < n
                and data[i] == data[i + 1] == data[i + 2]
                and i > lit_start
            ):
                break
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


# ── LZW encoder (mirror of sources/pdfparse/objects._lzw_decode) ─────


def lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """TIFF/PDF LZW encode: MSB-first packing, clear=256, EOD=257,
    9→12-bit growing codes. The width schedule SIMULATES the decoder's
    table-length counter (objects.py:_lzw_decode) so the pair is a true
    mirror: the decoder adds one entry per data code except the first
    after a clear, and widens when ``len(table) + early_change >=
    1 << width``. A clear is emitted when the table fills (4094)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    width = 9
    emit(256, width)
    table: Dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    dec_len = 258  # decoder table length AFTER processing the last code
    first_after_clear = True
    w = b""
    for byte in data:
        c = bytes([byte])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        # decoder bookkeeping for the code just emitted
        if first_after_clear:
            first_after_clear = False
        elif dec_len < 4096:
            dec_len += 1
        if dec_len + early_change >= (1 << width) and width < 12:
            width += 1
        table[wc] = next_code
        next_code += 1
        w = c
        if next_code >= 4094:
            emit(256, width)
            width = 9
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            dec_len = 258
            first_after_clear = True
    if w:
        emit(table[w], width)
        if first_after_clear:
            first_after_clear = False
        elif dec_len < 4096:
            dec_len += 1
        if dec_len + early_change >= (1 << width) and width < 12:
            width += 1
    emit(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ── IFD parsing ──────────────────────────────────────────────────────


def _read_ifd(data: bytes, fmt: str, off: int) -> Dict[int, List[int]]:
    if off + 2 > len(data):
        raise ValueError("IFD offset out of bounds")
    (count,) = struct.unpack_from(fmt + "H", data, off)
    tags: Dict[int, List[int]] = {}
    pos = off + 2
    for _ in range(count):
        if pos + 12 > len(data):
            raise ValueError("truncated IFD entry")
        tag, typ, n = struct.unpack_from(fmt + "HHI", data, pos)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            pos += 12
            continue  # unknown type: skip tag (spec-sanctioned)
        total = size * n
        if total <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(fmt + "I", data, pos + 8)
        if voff + total > len(data):
            raise ValueError(f"tag {tag} value out of bounds")
        if typ in (3, 8):
            vals = list(struct.unpack_from(f"{fmt}{n}H", data, voff))
        elif typ in (4, 9):
            vals = list(struct.unpack_from(f"{fmt}{n}I", data, voff))
        elif typ in (1, 6, 7, 2):
            vals = list(data[voff : voff + n])
        elif typ in (5, 10):  # rational → floor of the ratio
            raw = struct.unpack_from(f"{fmt}{2 * n}I", data, voff)
            vals = [
                raw[2 * i] // max(1, raw[2 * i + 1]) for i in range(n)
            ]
        else:  # pragma: no cover
            vals = []
        tags[tag] = vals
        pos += 12
    return tags


def _open(data: bytes) -> Tuple[str, Dict[int, List[int]]]:
    if len(data) < 8:
        raise ValueError("not a TIFF: too short")
    if data[:2] == b"II":
        fmt = "<"
    elif data[:2] == b"MM":
        fmt = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_off = struct.unpack_from(fmt + "HI", data, 2)
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    return fmt, _read_ifd(data, fmt, ifd_off)


def tiff_info(data: bytes) -> dict:
    """Header-only probe: width/height/compression/photometric/bps/spp
    without decompressing any strip (metadata queries stay cheap)."""
    _fmt, tags = _open(data)

    def one(tag: int, default: int) -> int:
        v = tags.get(tag)
        return int(v[0]) if v else default

    return {
        "width": one(_T_WIDTH, 0),
        "height": one(_T_LENGTH, 0),
        "compression": one(_T_COMPRESSION, 1),
        "photometric": one(_T_PHOTOMETRIC, 1),
        "bits_per_sample": one(_T_BPS, 1),
        "samples_per_pixel": one(_T_SPP, 1),
        "n_strips": len(tags.get(_T_STRIP_OFFSETS, [])),
    }


# ── decode ───────────────────────────────────────────────────────────


def _decode_strip(
    raw: bytes,
    compression: int,
    w: int,
    strip_rows: int,
    row_bytes: int,
    bilevel: bool,
    fill_order: int,
    t4_options: int,
    t6_options: int,
) -> np.ndarray:
    """One strip → (strip_rows, row_bytes) uint8 of SAMPLE bytes (for
    bilevel, rows of {0,1} samples, width w)."""
    if fill_order == 2:
        raw = raw.translate(_BITREV)
    if compression in (2, 3, 4):
        if not bilevel:
            raise ValueError("CCITT compression requires 1-bit samples")
        if compression == 4:
            if t6_options & 2:
                raise NotImplementedError("T.6 uncompressed mode")
            bm = decode_g4(raw, w, strip_rows)
        elif compression == 3:
            if t4_options & 1:
                raise NotImplementedError("T.4 2-D (K>0) TIFF strips")
            bm = decode_g3_1d(
                raw, w, strip_rows, byte_align=bool(t4_options & 4)
            )
        else:  # 2: Modified Huffman RLE — EOL-free, byte-aligned rows
            bm = decode_g3_1d(raw, w, strip_rows, byte_align=True)
        # CCITT decodes 1 = black; photometric 0 maps black to sample 1,
        # which is exactly the bitmap — return sample rows directly.
        return bm.astype(np.uint8)
    if compression == 1:
        out = raw
    elif compression == 5:
        out = _lzw_decode(raw, early_change=1)
    elif compression == 32773:
        out = packbits_decode(raw, expected=strip_rows * row_bytes)
    elif compression == 6:
        raise NotImplementedError("old-style JPEG-in-TIFF (compression 6)")
    else:
        raise ValueError(f"unsupported TIFF compression {compression}")
    need = strip_rows * row_bytes
    if len(out) < need:
        raise ValueError(f"short strip: {len(out)}/{need} bytes")
    arr = np.frombuffer(out[:need], dtype=np.uint8).reshape(
        strip_rows, row_bytes
    )
    if bilevel:
        bits = np.unpackbits(arr, axis=1)[:, :w]
        return bits
    return arr


def _split_jpeg_stream(stream: bytes) -> Tuple[bytes, bytes]:
    """Full JFIF stream → (tables_body, abbreviated_stream). DQT/DHT/DRI
    segments move to the tables body (the JPEGTables tag payload minus
    its SOI/EOI framing); everything else — SOI, APP0, SOF, the SOS
    header and the entropy-coded data through EOI — stays in the strip
    stream verbatim (TIFF TechNote 2 layout)."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    tables = bytearray()
    rest = bytearray(b"\xff\xd8")
    while pos + 4 <= len(stream):
        if stream[pos] != 0xFF:
            raise ValueError("bad JPEG marker while splitting")
        m = stream[pos + 1]
        if m == 0xDA:  # SOS: entropy data follows — keep verbatim
            rest += stream[pos:]
            return bytes(tables), bytes(rest)
        (ln,) = struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos : pos + 2 + ln]
        if m in (0xDB, 0xC4, 0xDD):  # DQT / DHT / DRI
            tables += seg
        else:
            rest += seg
        pos += 2 + ln
    raise ValueError("JPEG stream missing SOS")


def _decode_jpeg_strips(
    data: bytes,
    tags: Dict[int, List[int]],
    w: int,
    h: int,
    spp: int,
    photometric: int,
    offsets: List[int],
    counts: List[int],
    rows_per_strip: int,
) -> np.ndarray:
    """New-style JPEG-in-TIFF (compression 7, TIFF TechNote 2): each
    strip is a self-contained JPEG stream whose shared DQT/DHT/DRI
    segments may instead live in the JPEGTables tag (347) as an
    abbreviated SOI..EOI stream; the tables body is spliced in after
    each strip's SOI before handing the stream to kernel/jpeg.py."""
    tbody = b""
    traw = tags.get(_T_JPEGTABLES)
    if traw:
        tb = bytes(traw)
        end = tb.rfind(b"\xff\xd9")
        if tb[:2] != b"\xff\xd8" or end < 2:
            raise ValueError("JPEGTables is not an SOI..EOI stream")
        tbody = tb[2:end]
    if photometric == 2 and spp >= 3:
        # decode_jpeg always applies the YCbCr→RGB transform; RGB-stored
        # JPEG data (no transform) would come out miscolored.
        raise NotImplementedError("RGB-stored JPEG-in-TIFF")
    want = 3 if spp >= 3 else 1
    parts: List[np.ndarray] = []
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ValueError("strip outruns file")
        strip = bytes(data[off : off + cnt])
        if strip[:2] != b"\xff\xd8":
            raise ValueError("JPEG strip missing SOI")
        px = decode_jpeg(strip[:2] + tbody + strip[2:])
        strip_rows = min(rows_per_strip, h - s * rows_per_strip)
        got = 1 if px.ndim == 2 else int(px.shape[2])
        if got != want:
            raise ValueError(
                f"JPEG strip has {got} components, IFD declares {spp}"
            )
        if px.shape[0] < strip_rows or px.shape[1] < w:
            raise ValueError("JPEG strip smaller than its strip window")
        parts.append(px[:strip_rows, :w])
    out = np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    if spp == 1 and photometric == 0:
        out = (255 - out.astype(np.int16)).astype(np.uint8)
    return np.ascontiguousarray(out)


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode the first IFD → display pixels: (h, w) uint8 grayscale or
    (h, w, 3) uint8 RGB (photometric 2 chunky, or 3 via ColorMap)."""
    fmt, tags = _open(data)
    if _T_TILE_WIDTH in tags:
        raise NotImplementedError("tiled TIFF")

    def one(tag: int, default: int) -> int:
        v = tags.get(tag)
        return int(v[0]) if v else default

    w = one(_T_WIDTH, 0)
    h = one(_T_LENGTH, 0)
    if w <= 0 or h <= 0:
        raise ValueError("missing/invalid image dimensions")
    if w * h > 64_000_000:
        raise ValueError("TIFF dimensions exceed decoder cap")
    spp = one(_T_SPP, 1)
    bps_list = tags.get(_T_BPS, [1])
    if len(set(bps_list)) != 1:
        raise NotImplementedError("mixed bits-per-sample")
    bps = int(bps_list[0])
    if bps not in (1, 8):
        raise NotImplementedError(f"{bps}-bit samples")
    if one(_T_PLANAR, 1) != 1:
        raise NotImplementedError("planar configuration 2")
    photometric = one(_T_PHOTOMETRIC, 1)
    compression = one(_T_COMPRESSION, 1)
    predictor = one(_T_PREDICTOR, 1)
    fill_order = one(_T_FILLORDER, 1)
    bilevel = bps == 1
    if bilevel and spp != 1:
        raise NotImplementedError("multi-sample bilevel")
    offsets = tags.get(_T_STRIP_OFFSETS)
    counts = tags.get(_T_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("missing/mismatched strip tables")
    rows_per_strip = one(_T_ROWS_PER_STRIP, h)
    if rows_per_strip <= 0:
        rows_per_strip = h
    n_strips = (h + rows_per_strip - 1) // rows_per_strip
    if n_strips != len(offsets):
        raise ValueError(
            f"strip count mismatch: {len(offsets)} strips for "
            f"{h} rows at {rows_per_strip}/strip"
        )
    if compression == 7:
        if bps != 8:
            raise ValueError("JPEG-in-TIFF requires 8-bit samples")
        return _decode_jpeg_strips(
            data, tags, w, h, spp, photometric,
            offsets, counts, rows_per_strip,
        )
    row_bytes = (w * spp * bps + 7) // 8
    parts: List[np.ndarray] = []
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ValueError("strip outruns file")
        strip_rows = min(rows_per_strip, h - s * rows_per_strip)
        parts.append(
            _decode_strip(
                data[off : off + cnt],
                compression,
                w,
                strip_rows,
                row_bytes,
                bilevel,
                fill_order,
                one(_T_T4OPTIONS, 0),
                one(_T_T6OPTIONS, 0),
            )
        )
    samples = np.concatenate(parts, axis=0)
    if bilevel:
        # photometric 0 (WhiteIsZero): sample 1 = black → lum 0
        if photometric == 0:
            return np.where(samples > 0, 0, 255).astype(np.uint8)
        return np.where(samples > 0, 255, 0).astype(np.uint8)
    if predictor == 2:
        samples = (
            np.cumsum(
                samples.reshape(h, w, spp).astype(np.uint32), axis=1
            )
            & 0xFF
        ).astype(np.uint8).reshape(h, row_bytes)
    elif predictor != 1:
        raise NotImplementedError(f"predictor {predictor}")
    if photometric == 3:
        cmap = tags.get(_T_COLORMAP)
        if not cmap or len(cmap) != 3 * 256:
            raise ValueError("palette image lacks a 256-entry ColorMap")
        lut = (np.array(cmap, dtype=np.uint32).reshape(3, 256) >> 8).astype(
            np.uint8
        )
        idx = samples.reshape(h, w)
        return np.stack([lut[0][idx], lut[1][idx], lut[2][idx]], axis=2)
    if spp >= 3:
        px = samples.reshape(h, w, spp)[:, :, :3]
        if photometric == 0:
            px = (255 - px.astype(np.int16)).astype(np.uint8)
        return np.ascontiguousarray(px)
    px = samples.reshape(h, w)
    if photometric == 0:
        return (255 - px.astype(np.int16)).astype(np.uint8)
    return px


# ── encode (roundtrip-test twin) ─────────────────────────────────────


def _pack_rows_bilevel(bm: np.ndarray) -> bytes:
    return np.packbits(bm.astype(np.uint8), axis=1).tobytes()


def encode_tiff(
    arr: np.ndarray,
    compression: str = "none",
    predictor: bool = False,
    rows_per_strip: Optional[int] = None,
    big_endian: bool = False,
    colormap: Optional[np.ndarray] = None,
    photometric: Optional[int] = None,
    fill_order: int = 1,
    quality: int = 90,
) -> bytes:
    """Write a single-IFD TIFF. ``arr``: (h, w) uint8 gray, (h, w, 3)
    uint8 RGB, or (h, w) {0,1} with a bilevel compression. Compressions:
    ``none``, ``lzw``, ``packbits``, ``g4``, ``g3`` (EOL-framed),
    ``mh`` (compression 2, byte-aligned rows), ``jpeg`` (new-style
    compression 7: shared DQT/DHT in a JPEGTables tag, abbreviated
    per-strip streams; the ONE lossy compression — roundtrips are
    bit-exact only for flat-DC content at ``quality`` >= 90).
    ``colormap`` (3, 256) uint16 turns a (h, w) uint8 index plane into
    photometric 3. ``fill_order=2`` (bilevel only) stores strips
    LSB-first, the common fax byte order."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        h, w = arr.shape
        spp = 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w = arr.shape[:2]
        spp = 3
    else:
        raise ValueError("arr must be (h,w) or (h,w,3)")
    bilevel = compression in ("g4", "g3", "mh")
    comp_id = {
        "none": 1,
        "mh": 2,
        "g3": 3,
        "g4": 4,
        "lzw": 5,
        "jpeg": 7,
        "packbits": 32773,
    }.get(compression)
    if comp_id is None:
        raise ValueError(f"unknown compression {compression!r}")
    is_jpeg = compression == "jpeg"
    if is_jpeg:
        if colormap is not None:
            raise ValueError("jpeg compression cannot carry a palette")
        if predictor:
            raise ValueError("predictor applies to lossless strips only")
    if bilevel:
        if spp != 1:
            raise ValueError("bilevel compressions need a 2-D bitmap")
        if arr.max(initial=0) > 1:
            raise ValueError("bilevel array must be {0,1} (1 = black)")
        bps = 1
        photo = 0 if photometric is None else photometric
    elif colormap is not None:
        if spp != 1:
            raise ValueError("palette image must be a 2-D index plane")
        bps = 8
        photo = 3
    elif is_jpeg:
        bps = 8
        # 6 = YCbCr: encode_jpeg color-converts 3-sample input
        photo = (1 if spp == 1 else 6) if photometric is None else photometric
    else:
        bps = 8
        photo = (1 if spp == 1 else 2) if photometric is None else photometric
    if fill_order == 2 and not bilevel:
        raise ValueError("fill_order=2 is only written for bilevel data")
    if rows_per_strip is None or rows_per_strip <= 0:
        rows_per_strip = h
    fmt = ">" if big_endian else "<"

    body = arr
    if predictor and not bilevel:
        px = body.reshape(h, w, spp).astype(np.int16)
        diff = px.copy()
        diff[:, 1:, :] = px[:, 1:, :] - px[:, :-1, :]
        body = (diff & 0xFF).astype(np.uint8).reshape(h, -1)

    strips: List[bytes] = []
    jpeg_tables: Optional[bytes] = None
    for y0 in range(0, h, rows_per_strip):
        rows = body[y0 : y0 + rows_per_strip]
        if bilevel:
            if compression == "g4":
                strips.append(encode_g4(rows))
            elif compression == "g3":
                strips.append(encode_g3_1d(rows, eol=True))
            else:  # mh: byte-aligned EOL-free rows
                strips.append(
                    b"".join(
                        encode_g3_1d(rows[y : y + 1], eol=False)
                        for y in range(rows.shape[0])
                    )
                )
        elif is_jpeg:
            full = encode_jpeg(np.ascontiguousarray(rows), quality=quality)
            tb, abbrev = _split_jpeg_stream(full)
            if jpeg_tables is None:
                jpeg_tables = tb
            elif jpeg_tables != tb:  # pragma: no cover — fixed tables
                raise ValueError("inconsistent JPEG tables across strips")
            strips.append(abbrev)
        else:
            raw = rows.tobytes()
            if compression == "none":
                strips.append(raw)
            elif compression == "lzw":
                strips.append(lzw_encode(raw))
            else:
                strips.append(packbits_encode(raw))
    if fill_order == 2:
        strips = [s.translate(_BITREV) for s in strips]

    # layout: header(8) | strip data | tag overflow arrays | IFD
    out = bytearray(struct.pack(fmt + "2sHI", b"II" if fmt == "<" else b"MM", 42, 0))
    strip_offsets: List[int] = []
    for s in strips:
        strip_offsets.append(len(out))
        out += s
        if len(out) & 1:
            out += b"\0"

    entries: List[Tuple[int, int, int, List[int]]] = [
        (_T_WIDTH, 4, 1, [w]),
        (_T_LENGTH, 4, 1, [h]),
        (_T_BPS, 3, spp, [bps] * spp),
        (_T_COMPRESSION, 3, 1, [comp_id]),
        (_T_PHOTOMETRIC, 3, 1, [photo]),
        (_T_STRIP_OFFSETS, 4, len(strips), strip_offsets),
        (_T_SPP, 3, 1, [spp]),
        (_T_ROWS_PER_STRIP, 4, 1, [rows_per_strip]),
        (_T_STRIP_COUNTS, 4, len(strips), [len(s) for s in strips]),
        (_T_PLANAR, 3, 1, [1]),
    ]
    if predictor and not bilevel:
        entries.append((_T_PREDICTOR, 3, 1, [2]))
    if fill_order == 2:
        entries.append((_T_FILLORDER, 3, 1, [2]))
    if compression == "g3":
        entries.append((_T_T4OPTIONS, 4, 1, [0]))
    if colormap is not None:
        cm = np.asarray(colormap)
        if cm.shape != (3, 256):
            raise ValueError("colormap must be (3, 256) uint16")
        entries.append(
            (_T_COLORMAP, 3, 768, [int(v) for v in cm.reshape(-1)])
        )
    if is_jpeg and jpeg_tables:
        jt = b"\xff\xd8" + jpeg_tables + b"\xff\xd9"
        entries.append((_T_JPEGTABLES, 7, len(jt), jt))
    entries.sort(key=lambda e: e[0])

    # materialize overflow value arrays
    packed: List[Tuple[int, int, int, bytes]] = []
    code = {3: "H", 4: "I"}
    for tag, typ, n, vals in entries:
        if typ == 7:  # UNDEFINED: raw bytes
            raw = bytes(vals)
        else:
            raw = struct.pack(f"{fmt}{n}{code[typ]}", *vals)
        if len(raw) > 4:
            off = len(out)
            out += raw
            if len(out) & 1:
                out += b"\0"
            raw = struct.pack(fmt + "I", off)
        packed.append((tag, typ, n, raw.ljust(4, b"\0")))

    ifd_off = len(out)
    out += struct.pack(fmt + "H", len(packed))
    for tag, typ, n, val4 in packed:
        out += struct.pack(fmt + "HHI", tag, typ, n) + val4
    out += struct.pack(fmt + "I", 0)  # next-IFD terminator
    struct.pack_into(fmt + "I", out, 4, ifd_off)
    return bytes(out)
