"""From-scratch TIFF 6.0 codec (reader + writer twin).

The reader parses both byte orders (``II``/``MM``), walks the first
IFD, assembles multi-strip images, and decompresses through the repo's
own from-scratch codecs: LZW (the shared PDF/TIFF variant in
sources/pdfparse/objects.py), PackBits (here), CCITT Group 3/4
(kernel/ccitt.py), and new-style JPEG-in-TIFF (compression 7 with
JPEGTables splicing, kernel/jpeg.py). Strip AND tile layouts, chunky
AND planar (2) configurations, 8- and 16-bit samples,
horizontal-differencing predictor 2 (per chunk — tiles restart it),
FillOrder 2 bit reversal, and bilevel/gray/palette/RGB/YCbCr-JPEG
photometrics are supported. The writer is the
roundtrip-test twin (tests/test_tiff.py) and also feeds the multimodal
gate parity query — every supported compression EXCEPT jpeg is
lossless, so decode(encode(x)) must be bit-exact (jpeg roundtrips
bit-exact only for flat-DC content at quality >= 90, the codec-parity
recipe in kernel/jpeg.py).

Output convention: ``decode_tiff`` returns DISPLAY luminance/color —
``(h, w) uint8`` grayscale (photometric applied: WhiteIsZero inverts)
or ``(h, w, 3) uint8`` RGB for photometric 2/3/6; 16-bit samples
display as their high byte. Malformed input raises ``ValueError``;
genuinely unsupported corners (old-style compression-6 JPEG,
RGB-stored JPEG, raw YCbCr, planar JPEG, T.6 uncompressed mode) raise
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
    decode_g3_2d,
    decode_g4,
    encode_g3_1d,
    encode_g3_2d,
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
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325
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
        "n_tiles": len(tags.get(_T_TILE_OFFSETS, [])),
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
            if t4_options & 1:  # bit 0: 2-D (mixed) coding
                bm = decode_g3_2d(
                    raw, w, strip_rows, byte_align=bool(t4_options & 4)
                )
            else:
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


def _jpeg_tables_body(tags: Dict[int, List[int]]) -> bytes:
    """JPEGTables tag (347) payload → the marker-segment body to splice
    after each chunk's SOI (TIFF TechNote 2 abbreviated-stream layout)."""
    traw = tags.get(_T_JPEGTABLES)
    if not traw:
        return b""
    tb = bytes(traw)
    end = tb.rfind(b"\xff\xd9")
    if tb[:2] != b"\xff\xd8" or end < 2:
        raise ValueError("JPEGTables is not an SOI..EOI stream")
    return tb[2:end]


def _decode_jpeg_chunk(
    raw: bytes, tbody: bytes, rows: int, cols: int, want: int
) -> np.ndarray:
    """One JPEG strip/tile → (rows, cols*want) uint8 display samples."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("JPEG chunk missing SOI")
    px = decode_jpeg(raw[:2] + tbody + raw[2:])
    got = 1 if px.ndim == 2 else int(px.shape[2])
    if got != want:
        raise ValueError(
            f"JPEG chunk has {got} components, IFD declares {want}"
        )
    if px.shape[0] < rows or px.shape[1] < cols:
        raise ValueError("JPEG chunk smaller than its window")
    return np.ascontiguousarray(px[:rows, :cols]).reshape(rows, cols * want)


def _display_samples(
    arr: np.ndarray,
    rows: int,
    cols: int,
    spp: int,
    bps: int,
    fmt: str,
    predictor: int,
) -> np.ndarray:
    """(rows, row_bytes) decompressed bytes → (rows, cols*spp) uint8
    display samples. Horizontal-differencing predictor 2 is undone HERE,
    per chunk, because tiles restart the differencing at their own left
    edge (TIFF 6.0 §14 applies the predictor within each tile row).
    16-bit samples display as their high byte after un-prediction."""
    if bps == 16:
        u = np.frombuffer(arr.tobytes(), dtype=fmt + "u2").reshape(
            rows, cols, spp
        )
        if predictor == 2:
            u = np.cumsum(u.astype(np.uint32), axis=1) & 0xFFFF
        return (u >> 8).astype(np.uint8).reshape(rows, cols * spp)
    s = arr.reshape(rows, cols, spp)
    if predictor == 2:
        s = (np.cumsum(s.astype(np.uint32), axis=1) & 0xFF).astype(np.uint8)
    return np.ascontiguousarray(s).reshape(rows, cols * spp)


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode the first IFD → display pixels: (h, w) uint8 grayscale or
    (h, w, 3) uint8 RGB (photometric 2 chunky/planar, 3 via ColorMap,
    6 via JPEG strips/tiles). Strip AND tile layouts decode through one
    chunk-window model; planar configuration 2 stacks per-plane chunks;
    16-bit samples display as their high byte."""
    fmt, tags = _open(data)

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
    if bps not in (1, 8, 16):
        raise NotImplementedError(f"{bps}-bit samples")
    planar = one(_T_PLANAR, 1)
    if planar not in (1, 2):
        raise ValueError(f"bad planar configuration {planar}")
    if spp == 1:
        planar = 1  # single-sample planar is the chunky layout
    photometric = one(_T_PHOTOMETRIC, 1)
    compression = one(_T_COMPRESSION, 1)
    predictor = one(_T_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"predictor {predictor}")
    fill_order = one(_T_FILLORDER, 1)
    bilevel = bps == 1
    if bilevel and spp != 1:
        raise NotImplementedError("multi-sample bilevel")
    if compression == 7:
        if bps != 8:
            raise ValueError("JPEG-in-TIFF requires 8-bit samples")
        if planar == 2:
            raise NotImplementedError("planar JPEG-in-TIFF")
        if photometric == 2 and spp >= 3:
            # decode_jpeg always applies the YCbCr→RGB transform;
            # RGB-stored JPEG data would come out miscolored.
            raise NotImplementedError("RGB-stored JPEG-in-TIFF")
        if photometric == 3:
            raise ValueError("palette JPEG-in-TIFF")
    elif photometric == 6:
        raise NotImplementedError("raw (non-JPEG) YCbCr samples")
    if photometric == 3 and bps == 16:
        raise ValueError("16-bit palette indices")

    n_planes = spp if planar == 2 else 1
    chunk_spp = 1 if planar == 2 else spp
    tiled = _T_TILE_WIDTH in tags or _T_TILE_OFFSETS in tags
    # windows: (plane, y0, x0, rows, cols, full_rows, full_cols) in
    # stored-chunk order — full_* is the stored geometry (edge tiles
    # carry a full tile of data; strips store only surviving rows)
    windows: List[Tuple[int, int, int, int, int, int, int]] = []
    if tiled:
        tile_w = one(_T_TILE_WIDTH, 0)
        tile_h = one(_T_TILE_LENGTH, 0)
        if tile_w <= 0 or tile_h <= 0:
            raise ValueError("missing/invalid tile dimensions")
        offsets = tags.get(_T_TILE_OFFSETS)
        counts = tags.get(_T_TILE_COUNTS)
        tiles_x = (w + tile_w - 1) // tile_w
        tiles_y = (h + tile_h - 1) // tile_h
        if tiles_x * tiles_y * n_planes > 65536:
            raise ValueError("tile count exceeds decoder cap")
        for p in range(n_planes):
            for ty in range(tiles_y):
                for tx in range(tiles_x):
                    y0, x0 = ty * tile_h, tx * tile_w
                    windows.append((
                        p, y0, x0,
                        min(tile_h, h - y0), min(tile_w, w - x0),
                        tile_h, tile_w,
                    ))
    else:
        offsets = tags.get(_T_STRIP_OFFSETS)
        counts = tags.get(_T_STRIP_COUNTS)
        rows_per_strip = one(_T_ROWS_PER_STRIP, h)
        if rows_per_strip <= 0:
            rows_per_strip = h
        n_strips = (h + rows_per_strip - 1) // rows_per_strip
        for p in range(n_planes):
            for s in range(n_strips):
                y0 = s * rows_per_strip
                rows = min(rows_per_strip, h - y0)
                windows.append((p, y0, 0, rows, w, rows, w))
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("missing/mismatched strip/tile tables")
    if len(offsets) != len(windows):
        raise ValueError(
            f"chunk count mismatch: {len(offsets)} stored for "
            f"{len(windows)} expected"
        )

    tbody = _jpeg_tables_body(tags) if compression == 7 else b""
    want = 3 if (compression == 7 and spp >= 3) else chunk_spp
    cs = 1 if bilevel else want  # canvas samples per pixel column
    canvas = np.zeros((n_planes, h, w * cs), dtype=np.uint8)
    t4o = one(_T_T4OPTIONS, 0)
    t6o = one(_T_T6OPTIONS, 0)
    for (p, y0, x0, rows, cols, frows, fcols), off, cnt in zip(
        windows, offsets, counts
    ):
        if off + cnt > len(data):
            raise ValueError("strip/tile outruns file")
        raw = bytes(data[off : off + cnt])
        if compression == 7:
            sm = _decode_jpeg_chunk(raw, tbody, frows, fcols, want)
        else:
            row_bytes = (fcols * chunk_spp * bps + 7) // 8
            arr = _decode_strip(
                raw, compression, fcols, frows, row_bytes,
                bilevel, fill_order, t4o, t6o,
            )
            if bilevel:
                sm = arr
            else:
                sm = _display_samples(
                    arr, frows, fcols, chunk_spp, bps, fmt, predictor
                )
        canvas[p, y0 : y0 + rows, x0 * cs : (x0 + cols) * cs] = sm[
            :rows, : cols * cs
        ]

    if bilevel:
        bits = canvas[0]
        # photometric 0 (WhiteIsZero): sample 1 = black → lum 0
        if photometric == 0:
            return np.where(bits > 0, 0, 255).astype(np.uint8)
        return np.where(bits > 0, 255, 0).astype(np.uint8)
    if planar == 2:
        samples = np.stack(
            [canvas[p].reshape(h, w) for p in range(spp)], axis=2
        ).reshape(h, w * spp)
        eff = spp
    else:
        samples = canvas[0]
        eff = want
    if photometric == 3:
        cmap = tags.get(_T_COLORMAP)
        if not cmap or len(cmap) != 3 * 256:
            raise ValueError("palette image lacks a 256-entry ColorMap")
        lut = (np.array(cmap, dtype=np.uint32).reshape(3, 256) >> 8).astype(
            np.uint8
        )
        idx = samples.reshape(h, w)
        return np.stack([lut[0][idx], lut[1][idx], lut[2][idx]], axis=2)
    if eff >= 3:
        px = samples.reshape(h, w, eff)[:, :, :3]
        if photometric == 0:
            px = (255 - px.astype(np.int16)).astype(np.uint8)
        return np.ascontiguousarray(px)
    px = samples.reshape(h, w)
    if photometric == 0:
        return (255 - px.astype(np.int16)).astype(np.uint8)
    return np.ascontiguousarray(px)


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
    tile: Optional[Tuple[int, int]] = None,
    planar: int = 1,
) -> bytes:
    """Write a single-IFD TIFF. ``arr``: (h, w) uint8 gray, (h, w, 3)
    uint8 RGB, (h, w[, 3]) uint16 (written as 16-bit samples; the
    decoder displays their high byte), or (h, w) {0,1} with a bilevel
    compression. Compressions: ``none``, ``lzw``, ``packbits``, ``g4``,
    ``g3`` (EOL-framed 1-D), ``g32d`` (compression 3 with T4Options
    2-D: EOL+tag framed mixed rows), ``mh`` (compression 2,
    byte-aligned rows),
    ``jpeg`` (new-style compression 7: shared DQT/DHT in a JPEGTables
    tag, abbreviated per-chunk streams; the ONE lossy compression —
    roundtrips are bit-exact only for flat-DC content at ``quality``
    >= 90). ``colormap`` (3, 256) uint16 turns a (h, w) uint8 index
    plane into photometric 3. ``fill_order=2`` (bilevel only) stores
    chunks LSB-first, the common fax byte order. ``tile=(tw, th)``
    (multiples of 16) writes the tiled layout instead of strips;
    ``planar=2`` writes plane-major chunks for (h, w, 3) uint8/uint16
    input."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        h, w = arr.shape
        spp = 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w = arr.shape[:2]
        spp = 3
    else:
        raise ValueError("arr must be (h,w) or (h,w,3)")
    sixteen = arr.dtype == np.uint16
    bilevel = compression in ("g4", "g3", "g32d", "mh")
    comp_id = {
        "none": 1,
        "mh": 2,
        "g3": 3,
        "g32d": 3,  # compression 3 with T4Options bit 0 set
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
    if sixteen and (bilevel or is_jpeg or colormap is not None):
        raise ValueError("16-bit samples support none/lzw/packbits only")
    if planar not in (1, 2):
        raise ValueError("planar must be 1 or 2")
    if planar == 2 and (spp != 3 or is_jpeg or colormap is not None):
        raise ValueError("planar=2 needs plain (h, w, 3) samples")
    if tile is not None:
        tw_, th_ = tile
        if tw_ <= 0 or th_ <= 0 or tw_ % 16 or th_ % 16:
            raise ValueError("tile dims must be positive multiples of 16")
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
        bps = 16 if sixteen else 8
        photo = (1 if spp == 1 else 2) if photometric is None else photometric
    if fill_order == 2 and not bilevel:
        raise ValueError("fill_order=2 is only written for bilevel data")
    if rows_per_strip is None or rows_per_strip <= 0:
        rows_per_strip = h
    fmt = ">" if big_endian else "<"

    # chunk windows: strips span full rows; edge tiles pad to full size
    n_planes = spp if planar == 2 else 1
    if tile is not None:
        tw_, th_ = tile
        wins = [
            (p, ty * th_, tx * tw_, th_, tw_)
            for p in range(n_planes)
            for ty in range((h + th_ - 1) // th_)
            for tx in range((w + tw_ - 1) // tw_)
        ]
    else:
        wins = [
            (p, y0, 0, min(rows_per_strip, h - y0), w)
            for p in range(n_planes)
            for y0 in range(0, h, rows_per_strip)
        ]

    px3 = arr.reshape(h, w, spp)
    strips: List[bytes] = []
    jpeg_tables: Optional[bytes] = None
    for p, y0, x0, rows, cols in wins:
        sub = (
            px3[y0 : y0 + rows, x0 : x0 + cols, p : p + 1]
            if planar == 2
            else px3[y0 : y0 + rows, x0 : x0 + cols, :]
        )
        if sub.shape[0] < rows or sub.shape[1] < cols:  # edge tile
            sub = np.pad(
                sub,
                (
                    (0, rows - sub.shape[0]),
                    (0, cols - sub.shape[1]),
                    (0, 0),
                ),
                mode="edge",
            )
        if bilevel:
            bm = sub[:, :, 0]
            if compression == "g4":
                strips.append(encode_g4(bm))
            elif compression == "g32d":
                strips.append(encode_g3_2d(bm, k=4))
            elif compression == "g3":
                strips.append(encode_g3_1d(bm, eol=True))
            else:  # mh: byte-aligned EOL-free rows
                strips.append(
                    b"".join(
                        encode_g3_1d(bm[y : y + 1], eol=False)
                        for y in range(bm.shape[0])
                    )
                )
            continue
        if is_jpeg:
            img = sub[:, :, 0] if spp == 1 else sub
            full = encode_jpeg(np.ascontiguousarray(img), quality=quality)
            tb, abbrev = _split_jpeg_stream(full)
            if jpeg_tables is None:
                jpeg_tables = tb
            elif jpeg_tables != tb:  # pragma: no cover — fixed tables
                raise ValueError("inconsistent JPEG tables across chunks")
            strips.append(abbrev)
            continue
        if predictor:
            # differencing restarts at each chunk's left edge (§14)
            mask = 0xFFFF if sixteen else 0xFF
            d = sub.astype(np.int32).copy()
            d[:, 1:, :] -= sub[:, :-1, :].astype(np.int32)
            sub = (d & mask).astype(np.uint16 if sixteen else np.uint8)
        raw = sub.astype(fmt + ("u2" if sixteen else "u1")).tobytes()
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
        (_T_SPP, 3, 1, [spp]),
        (_T_PLANAR, 3, 1, [planar]),
    ]
    if tile is not None:
        entries += [
            (_T_TILE_WIDTH, 4, 1, [tile[0]]),
            (_T_TILE_LENGTH, 4, 1, [tile[1]]),
            (_T_TILE_OFFSETS, 4, len(strips), strip_offsets),
            (_T_TILE_COUNTS, 4, len(strips), [len(s) for s in strips]),
        ]
    else:
        entries += [
            (_T_STRIP_OFFSETS, 4, len(strips), strip_offsets),
            (_T_ROWS_PER_STRIP, 4, 1, [rows_per_strip]),
            (_T_STRIP_COUNTS, 4, len(strips), [len(s) for s in strips]),
        ]
    if predictor and not bilevel:
        entries.append((_T_PREDICTOR, 3, 1, [2]))
    if fill_order == 2:
        entries.append((_T_FILLORDER, 3, 1, [2]))
    if compression == "g3":
        entries.append((_T_T4OPTIONS, 4, 1, [0]))
    elif compression == "g32d":
        entries.append((_T_T4OPTIONS, 4, 1, [1]))
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
