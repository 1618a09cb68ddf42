"""Page rasterization and a from-scratch PNG codec (pure stdlib + numpy).

The reference renders pages through pdfium bitmaps (``PyPDFium2Document``
rasterization, gmft/pdf_bindings/pdfium.py:86-101) and crops/pads table
regions from the page image before structure recognition
(gmft/detectors/base.py CroppedTable.image). This container has no
pdfium/PIL, so the raster path is built from scratch at the fidelity the
sandbox supports:

- ``render_words``: word-occupancy bitmap — white canvas, each word box
  filled with ink. This is exactly the signal the deterministic layout
  detector consumes; glyph-level rasterization would need font rendering
  the sandbox can't host (that seam stays documented in
  operators/multimodal.py).
- ``encode_png`` / ``decode_png``: a real PNG codec (zlib + struct, all
  five scanline filters on decode), so rendered pages ship as genuine
  ``image/png`` payloads and the multimodal ``decode_mode='real'`` path
  actually decodes them.
- ``crop`` / ``pad`` / ``resize_nearest`` / ``rotate90``: the D3 image
  ops (reference crop/pad/rotate on table-region images) on real rasters.

Scale notes: rasterization is per-turn work inside ``mapInPandas`` — a
narrow map over the transcript scan, no shuffle; PNG bytes never leave
their partition.
"""

from __future__ import annotations

import math
import struct
import zlib
from typing import Sequence

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color types for the bit-depth-8 layouts this codec supports
_COLOR_GRAY = 0
_COLOR_RGB = 2
_COLOR_RGBA = 6
_CHANNELS = {_COLOR_GRAY: 1, _COLOR_RGB: 3, _COLOR_RGBA: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(
    arr: np.ndarray,
    filter_type: int = 0,
    compress_level: int = 6,
    depth: int = 8,
    palette=None,
    trns=None,
    interlace: bool = False,
) -> bytes:
    """Encode a uint8 array as PNG bytes.

    ``arr``: (H, W) grayscale, or (H, W, 3|4) RGB/RGBA. ``filter_type``
    selects the scanline filter applied to EVERY row (0=None default;
    1-4 exist so the decoder's filter inverses can be differentially
    tested against this encoder). ``compress_level``: zlib level —
    pipelines whose payloads are transient (stay in-partition) trade a
    couple KB for ~2× encode speed at level 3.

    Full-format knobs (decoder-path twins; filter 0 only):
    ``palette`` ((n, 3) uint8 + (H, W) index plane, ``depth`` 1/2/4/8,
    optional ``trns`` per-entry alpha bytes), ``depth`` 1/2/4 gray
    (values < 2^depth, display-scaled on decode) or 16 (uint16 input,
    decoder keeps the high byte), (H, W, 2) gray+alpha input, and
    ``interlace`` (Adam7)."""
    a = np.asarray(arr)
    general = (
        palette is not None
        or trns is not None
        or depth != 8
        or interlace
        or (a.ndim == 3 and a.shape[2] == 2)
    )
    if general:
        return _encode_png_general(
            a, depth, palette, trns, interlace, compress_level
        )
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, bpp = _COLOR_GRAY, 1
        rows = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (3, 4):
        color = _COLOR_RGB if a.shape[2] == 3 else _COLOR_RGBA
        bpp = a.shape[2]
        rows = a
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[0], a.shape[1]
    if not 0 <= filter_type <= 4:
        raise ValueError(f"bad filter type {filter_type}")

    if filter_type == 0:
        # fast path (the production encode): no per-row Python — one
        # (h, stride+1) buffer with the filter byte column prepended
        stride = w * bpp
        buf = np.empty((h, stride + 1), dtype=np.uint8)
        buf[:, 0] = 0
        buf[:, 1:] = rows.reshape(h, stride)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (
            _PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(buf.tobytes(), compress_level))
            + _chunk(b"IEND", b"")
        )

    flat = rows.reshape(h, w * bpp).astype(np.int16)
    prev = np.zeros(w * bpp, dtype=np.int16)
    out = bytearray()
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int16), cur[:-bpp]])
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:  # Sub
            enc = cur - left
        elif filter_type == 2:  # Up
            enc = cur - prev
        elif filter_type == 3:  # Average
            enc = cur - (left + prev) // 2
        else:  # Paeth
            upleft = np.concatenate(
                [np.zeros(bpp, dtype=np.int16), prev[:-bpp]]
            )
            enc = cur - _paeth(left, prev, upleft)
        out.append(filter_type)
        out.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), compress_level))
        + _chunk(b"IEND", b"")
    )


def _paeth(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    p = left + up - upleft
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
    # spec tie-breaking: left wins ties with up, up wins ties with upleft
    return np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))


# hostile-payload cap: decoded pixel budget per image (64 MP ≈ a 256 MB
# RGBA allocation at most) — untrusted dimensions must not be able to
# allocate arbitrary executor memory (same containment contract as the
# PDF parser's FlateDecode cap, sources/pdfparse/objects.py)
MAX_DECODE_PIXELS = 64_000_000


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to a uint8 array ((H, W) for grayscale, (H, W, C)
    otherwise). Supports the FULL still-image format: bit depths
    1/2/4/8/16 (sub-byte gray display-scales; 16-bit keeps its high
    byte), all five color types incl. palette (PLTE + tRNS → RGBA) and
    gray+alpha (→ RGBA), tRNS color keys, Adam7 interlace, and all
    five scanline filters. The byte-sample non-interlaced shapes that
    production pipelines emit take a pure-numpy fast path.

    Untrusted-input containment: dimensions are capped (a hostile IHDR
    cannot allocate unbounded memory) and the IDAT stream inflates
    through a bounded decompressor (a kilobyte-scale zlib bomb cannot
    expand past the size the IHDR promises) — oversized payloads raise
    ValueError for the caller's error-row handling."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    try:
        return _decode_png_inner(data)
    except (zlib.error, struct.error) as ex:
        # containment contract: EVERY corrupt-payload failure surfaces as
        # ValueError so callers' error-row handling catches one exception
        # type (a PNG-signed payload with garbage IDAT raises zlib.error,
        # a truncated IHDR raises struct.error)
        raise ValueError(f"corrupt PNG: {ex}") from ex


def _decode_png_inner(data: bytes) -> np.ndarray:
    pos = 8
    width = height = None
    color = depth = interlace = None
    plte = b""
    trns = b""
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + tag + payload + crc
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if depth not in _PNG_DEPTHS[color]:
                raise ValueError(
                    f"bad depth {depth} for color type {color}"
                )
            if interlace not in (0, 1):
                raise ValueError(f"bad interlace method {interlace}")
            if width == 0 or height == 0:
                # zero-dim images would bypass the pixel cap below
                # (0 * huge = 0) while expected = (0*bpp+1)*height still
                # drives an unbounded inflate + filter loop
                raise ValueError("zero-dimension image")
            if width * height > MAX_DECODE_PIXELS:
                raise ValueError(
                    f"image too large ({width}x{height} exceeds "
                    f"{MAX_DECODE_PIXELS} pixel cap)"
                )
        elif tag == b"PLTE":
            plte = payload
        elif tag == b"tRNS":
            trns = payload
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    if depth == 8 and color in _CHANNELS and not interlace and not trns:
        # fast path: byte samples, no interlace — the shape every
        # production pipeline payload takes (pure-numpy defilter)
        return _inflate_defilter(bytes(idat), width, height, color)
    return _decode_png_general(
        bytes(idat), width, height, color, depth, interlace, plte, trns
    )


def _inflate_bounded(idat: bytes, expected: int) -> bytes:
    """Bounded inflate: never produce more bytes than the IHDR promises,
    regardless of what the deflate stream would expand to."""
    d = zlib.decompressobj()
    raw = d.decompress(idat, expected)
    if d.unconsumed_tail or d.decompress(b"", 1):
        raise ValueError("IDAT inflates past the declared image size")
    if len(raw) != expected:
        raise ValueError("IDAT length mismatch")
    return raw


def _inflate_defilter(
    idat: bytes, width: int, height: int, color: int
) -> np.ndarray:
    """One zlib-compressed filtered scanline stream → pixel array
    (shared by the still decoder and the APNG frame decoder)."""
    bpp = _CHANNELS[color]
    stride = width * bpp
    raw = _inflate_bounded(idat, (stride + 1) * height)

    grid = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    if not grid[:, 0].any():
        # fast path: every scanline uses filter 0 (what encode_png's
        # production path emits) — pure reshape, no per-row loop
        out = grid[:, 1:].copy()
        if color == _COLOR_GRAY:
            return out
        return out.reshape(height, width, bpp)

    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int16)
        if ft == 0:
            cur = row
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft in (1, 3, 4):
            # left-dependent filters are sequential per pixel group
            cur = np.empty(stride, dtype=np.int16)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                up = prev[x]
                upleft = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    v = row[x] + left
                elif ft == 3:
                    v = row[x] + (left + up) // 2
                else:
                    p = left + up - upleft
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else upleft)
                    v = row[x] + pred
                cur[x] = v & 0xFF
        else:
            raise ValueError(f"bad filter byte {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur.astype(np.int16)
    if color == _COLOR_GRAY:
        return out
    return out.reshape(height, width, bpp)


# ---------------------------------------------------------------------------
# General-format PNG path (palette, sub-byte/16-bit depths, Adam7)
# ---------------------------------------------------------------------------

# color type → sample channels (the full spec set; _CHANNELS above is
# the byte-sample fast-path subset)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _pack_sample_rows(
    samples: np.ndarray, w: int, channels: int, depth: int
) -> np.ndarray:
    """(h, w, channels) uint16 raw samples → (h, stride) bytes
    (sub-byte MSB-first, 16-bit big-endian) — the inverse of
    ``_bytes_to_samples``."""
    h = samples.shape[0]
    if depth == 8:
        return samples.astype(np.uint8).reshape(h, w * channels)
    if depth == 16:
        return np.frombuffer(
            np.ascontiguousarray(samples.astype(">u2")).tobytes(),
            dtype=np.uint8,
        ).reshape(h, w * channels * 2)
    flat = samples.reshape(h, w * channels).astype(np.uint8)
    bits = (
        (flat[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1
    ).reshape(h, -1).astype(np.uint8)
    return np.packbits(bits, axis=1)


def _encode_png_general(
    a: np.ndarray,
    depth: int,
    palette,
    trns,
    interlace: bool,
    compress_level: int,
) -> bytes:
    if palette is not None:
        if a.ndim != 2:
            raise ValueError("palette PNG needs a 2-D index plane")
        pal = np.asarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or pal.shape[0] > 256:
            raise ValueError("palette must be (n<=256, 3) RGB")
        color = 3
        samples = a[:, :, None].astype(np.uint16)
        limit = min(1 << depth, pal.shape[0])
        if int(samples.max(initial=0)) >= limit:
            raise ValueError("index plane overflows the palette/depth")
    elif a.ndim == 2:
        color = 0
        samples = a[:, :, None].astype(np.uint16)
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        color = {2: 4, 3: 2, 4: 6}[a.shape[2]]
        samples = a.astype(np.uint16)
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    if depth not in _PNG_DEPTHS[color]:
        raise ValueError(f"bad depth {depth} for color type {color}")
    if depth < 8 and color == 0 and int(samples.max(initial=0)) >= (
        1 << depth
    ):
        raise ValueError(f"gray values overflow {depth}-bit storage")
    if depth == 16 and np.asarray(a).dtype != np.uint16:
        samples = samples << 8  # widen uint8 input to the high byte
    h, w = a.shape[0], a.shape[1]
    channels = _PNG_CHANNELS[color]

    def filtered(rows: np.ndarray) -> bytes:
        buf = np.empty((rows.shape[0], rows.shape[1] + 1), dtype=np.uint8)
        buf[:, 0] = 0
        buf[:, 1:] = rows
        return buf.tobytes()

    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.append(
                filtered(
                    _pack_sample_rows(sub, sub.shape[1], channels, depth)
                )
            )
        payload = b"".join(parts)
    else:
        payload = filtered(_pack_sample_rows(samples, w, channels, depth))

    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color, 0, 0, 1 if interlace else 0
    )
    out = bytearray(_PNG_SIG)
    out += _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
        if trns is not None:
            out += _chunk(b"tRNS", bytes(bytearray(trns)))
    elif trns is not None:
        out += _chunk(b"tRNS", bytes(bytearray(trns)))
    out += _chunk(b"IDAT", zlib.compress(payload, compress_level))
    out += _chunk(b"IEND", b"")
    return bytes(out)
_PNG_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}
# Adam7: (x0, y0, dx, dy) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _defilter_bytes(
    raw: bytes, height: int, stride: int, bpp: int
) -> np.ndarray:
    """Filtered scanlines (any depth: ``bpp`` = filter unit in BYTES,
    >= 1 per spec) → (height, stride) uint8 of raw sample bytes."""
    grid = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    if not grid[:, 0].any():
        return grid[:, 1:].copy()
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(height):
        ft = int(grid[y, 0])
        row = grid[y, 1:].astype(np.int16)
        if ft == 0:
            cur = row
        elif ft == 2:
            cur = (row + prev) & 0xFF
        elif ft in (1, 3, 4):
            cur = np.empty(stride, dtype=np.int16)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                up = prev[x]
                upleft = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    v = row[x] + left
                elif ft == 3:
                    v = row[x] + (left + up) // 2
                else:
                    p = left + up - upleft
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                    pred = (
                        left
                        if (pa <= pb and pa <= pc)
                        else (up if pb <= pc else upleft)
                    )
                    v = row[x] + pred
                cur[x] = v & 0xFF
        else:
            raise ValueError(f"bad filter byte {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def _bytes_to_samples(
    rows: np.ndarray, w: int, channels: int, depth: int
) -> np.ndarray:
    """(h, stride) sample bytes → (h, w, channels) uint16 raw samples
    (sub-byte values MSB-first within each byte; 16-bit big-endian)."""
    h = rows.shape[0]
    if depth == 8:
        return (
            rows[:, : w * channels]
            .reshape(h, w, channels)
            .astype(np.uint16)
        )
    if depth == 16:
        u = np.frombuffer(
            np.ascontiguousarray(rows[:, : 2 * w * channels]).tobytes(),
            dtype=">u2",
        )
        return u.reshape(h, w, channels).astype(np.uint16)
    bits = np.unpackbits(rows, axis=1)
    per = bits.shape[1] // depth
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    vals = (
        bits[:, : per * depth].reshape(h, per, depth).astype(np.uint16)
        @ weights
    )
    return vals[:, : w * channels].reshape(h, w, channels)


def _decode_png_general(
    idat: bytes,
    width: int,
    height: int,
    color: int,
    depth: int,
    interlace: int,
    plte: bytes,
    trns: bytes,
) -> np.ndarray:
    channels = _PNG_CHANNELS[color]
    bpp = max(1, (channels * depth) // 8)

    def pass_dims(x0, y0, dx, dy):
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        return pw, ph

    if interlace:
        passes = [p for p in _ADAM7 if pass_dims(*p)[0] and pass_dims(*p)[1]]
        expected = sum(
            (((pw * channels * depth + 7) // 8) + 1) * ph
            for pw, ph in (pass_dims(*p) for p in passes)
        )
    else:
        passes = None
        expected = (((width * channels * depth + 7) // 8) + 1) * height
    raw = _inflate_bounded(idat, expected)
    samples = np.zeros((height, width, channels), dtype=np.uint16)
    if passes is None:
        stride = (width * channels * depth + 7) // 8
        rows = _defilter_bytes(raw, height, stride, bpp)
        samples = _bytes_to_samples(rows, width, channels, depth)
    else:
        off = 0
        for x0, y0, dx, dy in passes:
            pw, ph = pass_dims(x0, y0, dx, dy)
            stride = (pw * channels * depth + 7) // 8
            take = (stride + 1) * ph
            rows = _defilter_bytes(raw[off : off + take], ph, stride, bpp)
            off += take
            samples[y0::dy, x0::dx] = _bytes_to_samples(
                rows, pw, channels, depth
            )

    if color == 3:  # palette
        n = len(plte) // 3
        if n == 0:
            raise ValueError("palette image lacks a PLTE chunk")
        pal = np.zeros((256, 3), dtype=np.uint8)
        pal[:n] = np.frombuffer(plte[: 3 * n], dtype=np.uint8).reshape(n, 3)
        idx = np.minimum(samples[:, :, 0], n - 1)
        rgb = pal[idx]
        if trns:
            alpha = np.full(256, 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            a = alpha[idx]
            if (a != 255).any():
                return np.ascontiguousarray(
                    np.concatenate([rgb, a[:, :, None]], axis=2)
                )
        return np.ascontiguousarray(rgb)
    # scale to display: sub-byte gray expands to full range, 16-bit
    # keeps its high byte (the TIFF convention)
    if depth < 8:
        disp = (samples * (255 // ((1 << depth) - 1))).astype(np.uint8)
    elif depth == 16:
        disp = (samples >> 8).astype(np.uint8)
    else:
        disp = samples.astype(np.uint8)
    key_alpha = None
    if trns and color in (0, 2):
        # transparent-color key (raw sample values, 16-bit fields)
        key = np.frombuffer(trns[: 2 * channels], dtype=">u2").astype(
            np.uint16
        )
        key_alpha = np.where(
            (samples == key[None, None, :]).all(axis=2), 0, 255
        ).astype(np.uint8)
    if color == 4:  # gray + alpha → RGBA
        g = disp[:, :, 0]
        return np.ascontiguousarray(
            np.stack([g, g, g, disp[:, :, 1]], axis=2)
        )
    if color == 0:
        g = disp[:, :, 0]
        if key_alpha is not None and (key_alpha != 255).any():
            return np.ascontiguousarray(
                np.stack([g, g, g, key_alpha], axis=2)
            )
        return np.ascontiguousarray(g)
    if key_alpha is not None and (key_alpha != 255).any():
        return np.ascontiguousarray(
            np.concatenate([disp[:, :, :3], key_alpha[:, :, None]], axis=2)
        )
    return np.ascontiguousarray(disp)


# ---------------------------------------------------------------------------
# APNG (acTL/fcTL/fdAT — the PNG 3rd-edition animation chunks)
# ---------------------------------------------------------------------------


def _to_rgba_frame(px: np.ndarray) -> np.ndarray:
    if px.ndim == 2:
        px = np.stack([px, px, px], axis=2)
    if px.shape[2] == 3:
        px = np.concatenate(
            [px, np.full(px.shape[:2] + (1,), 255, np.uint8)], axis=2
        )
    return px.astype(np.int32)


def encode_apng(
    frames: Sequence[np.ndarray],
    delay_ms: int = 100,
    offsets=None,
    dispose=0,
    blend=0,
    compress_level: int = 6,
) -> bytes:
    """Encode frames as an APNG. Frame 0 is the default image and must
    cover the canvas at offset (0, 0); later frames may be sub-rects
    at ``offsets``. ``dispose`` (scalar or per-frame): 0 keep, 1 clear
    rect to transparent, 2 restore the pre-frame canvas. ``blend``
    (scalar or per-frame): 0 replace, 1 alpha-over. The decoder twin
    is ``decode_apng_frames``."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    offs = offsets or [(0, 0)] * len(frames)
    if len(offs) != len(frames):
        raise ValueError("offsets/frames length mismatch")
    if offs[0] != (0, 0):
        raise ValueError("frame 0 is the default image: offset (0, 0)")
    disp = (
        list(dispose)
        if isinstance(dispose, (list, tuple))
        else [dispose] * len(frames)
    )
    blnd = (
        list(blend)
        if isinstance(blend, (list, tuple))
        else [blend] * len(frames)
    )
    if len(disp) != len(frames) or len(blnd) != len(frames):
        raise ValueError("dispose/blend length mismatch")
    if any(d not in (0, 1, 2) for d in disp) or any(
        b not in (0, 1) for b in blnd
    ):
        raise ValueError("bad dispose/blend op")
    chans = max(
        (f.shape[2] if np.asarray(f).ndim == 3 else 1) for f in frames
    )
    chans = 1 if chans == 1 else chans
    color = {1: _COLOR_GRAY, 3: _COLOR_RGB, 4: _COLOR_RGBA}[chans]

    def norm(f):
        f = np.asarray(f, dtype=np.uint8)
        if chans == 1:
            return f if f.ndim == 2 else f[:, :, 0]
        if f.ndim == 2:
            f = np.stack([f] * 3, axis=2)
        if f.shape[2] < chans:
            f = np.concatenate(
                [f, np.full(f.shape[:2] + (1,), 255, np.uint8)], axis=2
            )
        return f

    nf = [norm(f) for f in frames]
    ch, cw = nf[0].shape[:2]
    for f, (x, y) in zip(nf, offs):
        if y + f.shape[0] > ch or x + f.shape[1] > cw:
            raise ValueError("frame outside the canvas")

    def scanlines(f):
        h, w = f.shape[:2]
        stride = w * chans
        buf = np.empty((h, stride + 1), dtype=np.uint8)
        buf[:, 0] = 0
        buf[:, 1:] = f.reshape(h, stride)
        return zlib.compress(buf.tobytes(), compress_level)

    ihdr = struct.pack(">IIBBBBB", cw, ch, 8, color, 0, 0, 0)
    out = bytearray(_PNG_SIG)
    out += _chunk(b"IHDR", ihdr)
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0

    def fctl(f, x, y, d, bl):
        nonlocal seq
        p = struct.pack(
            ">IIIIIHHBB",
            seq, f.shape[1], f.shape[0], x, y,
            delay_ms, 1000, d, bl,
        )
        seq += 1
        return _chunk(b"fcTL", p)

    out += fctl(nf[0], 0, 0, disp[0], blnd[0])
    out += _chunk(b"IDAT", scanlines(nf[0]))
    for f, (x, y), d, bl in zip(nf[1:], offs[1:], disp[1:], blnd[1:]):
        out += fctl(f, x, y, d, bl)
        out += _chunk(
            b"fdAT", struct.pack(">I", seq) + scanlines(f)
        )
        seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def decode_apng_frames(data: bytes, frame_stride: int = 1) -> list:
    """Decode an APNG → list of composed (h, w, 3|4) uint8 frames,
    every ``frame_stride``-th DISPLAYED frame (composition walks every
    frame). A plain PNG decodes as a single frame. fcTL dispose 1
    clears the rect, 2 restores the pre-frame canvas; blend 1
    alpha-composites with the same integer math as the WebP/GIF
    compositors."""
    if frame_stride < 1:
        raise ValueError("frame_stride must be >= 1")
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = color = None
    actl = None
    # entries: (fctl_fields, bytearray of this frame's compressed data)
    entries = []
    default_idat = bytearray()
    default_has_fctl = False
    last_seq = -1
    try:
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            payload = data[pos + 8 : pos + 8 + length]
            pos += 12 + length
            if tag == b"IHDR":
                (width, height, depth, color, _c, _f, interlace) = (
                    struct.unpack(">IIBBBBB", payload)
                )
                if depth != 8 or color not in _CHANNELS or interlace:
                    raise ValueError("unsupported APNG base format")
                if width == 0 or height == 0:
                    raise ValueError("zero-dimension image")
                if width * height > MAX_DECODE_PIXELS:
                    raise ValueError("image too large")
            elif tag == b"acTL":
                actl = struct.unpack(">II", payload[:8])
            elif tag == b"fcTL":
                f = struct.unpack(">IIIIIHHBB", payload[:26])
                if f[0] != last_seq + 1:
                    raise ValueError("APNG sequence number gap")
                last_seq = f[0]
                entries.append((f, bytearray()))
                if not default_idat:
                    default_has_fctl = True
            elif tag == b"IDAT":
                if entries and default_has_fctl:
                    entries[-1][1].extend(payload)
                default_idat.extend(payload)
            elif tag == b"fdAT":
                (sq,) = struct.unpack(">I", payload[:4])
                if sq != last_seq + 1:
                    raise ValueError("APNG sequence number gap")
                last_seq = sq
                if not entries:
                    raise ValueError("fdAT before any fcTL")
                entries[-1][1].extend(payload[4:])
            elif tag == b"IEND":
                break
    except (struct.error, zlib.error) as ex:
        raise ValueError(f"corrupt APNG: {ex}") from ex
    if width is None:
        raise ValueError("missing IHDR")
    if actl is None or not entries:
        return [decode_png(data)]
    if len(entries) != actl[0]:
        raise ValueError("acTL frame count mismatch")
    canvas = np.zeros((height, width, 4), dtype=np.int32)
    frames = []
    for idx, ((
        _sq, fw, fh, fx, fy, _dn, _dd, dispose, blend
    ), dat) in enumerate(entries):
        if fx + fw > width or fy + fh > height or fw == 0 or fh == 0:
            raise ValueError("APNG frame outside the canvas")
        try:
            px = _inflate_defilter(bytes(dat), fw, fh, color)
        except zlib.error as ex:
            raise ValueError(f"corrupt APNG frame: {ex}") from ex
        fr = _to_rgba_frame(
            px if color == _COLOR_GRAY else px.reshape(fh, fw, _CHANNELS[color])
        )
        prev = canvas[fy : fy + fh, fx : fx + fw].copy()
        rect = canvas[fy : fy + fh, fx : fx + fw]
        if blend == 1:
            fa = fr[:, :, 3:]
            ca_scaled = rect[:, :, 3:] * (255 - fa) // 255
            out_a = fa + ca_scaled
            num = fr[:, :, :3] * fa + rect[:, :, :3] * ca_scaled
            blended = np.concatenate(
                [num // np.maximum(out_a, 1), out_a], axis=2
            )
        else:
            blended = fr
        canvas[fy : fy + fh, fx : fx + fw] = blended
        if idx % frame_stride == 0:
            disp = canvas.astype(np.uint8)
            if (disp[:, :, 3] != 255).any():
                frames.append(disp.copy())
            else:
                frames.append(np.ascontiguousarray(disp[:, :, :3]))
        if dispose == 1:
            canvas[fy : fy + fh, fx : fx + fw] = 0
        elif dispose == 2:
            canvas[fy : fy + fh, fx : fx + fw] = prev
    return frames


# ---------------------------------------------------------------------------
# Rasterization
# ---------------------------------------------------------------------------


def render_words(
    word_boxes: Sequence[Sequence[float]],
    page_width: float,
    page_height: float,
    scale: float = 1.0,
    ink: int = 0,
) -> np.ndarray:
    """Word-occupancy bitmap: white (255) canvas, each word box filled
    with ``ink``. Pixel coverage rule: box (x0,y0,x1,y1) inks rows
    [floor(y0*s), ceil(y1*s)) and cols [floor(x0*s), ceil(x1*s)),
    clamped to the canvas — the exact rule the SQL ink oracle sums
    (operators/render.py), so ink counts are cross-checkable."""
    w = max(1, int(np.ceil(page_width * scale)))
    h = max(1, int(np.ceil(page_height * scale)))
    arr = np.full((h, w), 255, dtype=np.uint8)
    for x0, y0, x1, y1 in word_boxes:
        c0 = max(0, int(np.floor(x0 * scale)))
        c1 = min(w, int(np.ceil(x1 * scale)))
        r0 = max(0, int(np.floor(y0 * scale)))
        r1 = min(h, int(np.ceil(y1 * scale)))
        if c1 > c0 and r1 > r0:
            arr[r0:r1, c0:c1] = ink
    return arr


def fill_contours_mask(h: int, w: int, contours) -> np.ndarray:
    """Nonzero-winding scanline fill of closed polygon contours (pixel
    coordinates, y down) into an (h, w) bool mask — the PDF/PostScript/
    TrueType fill rule. Contours close implicitly (last point connects to
    the first). A pixel is inked when the winding number at its CENTER
    (x+0.5, y+0.5) is nonzero; edges are vectorized per scanline."""
    mask = np.zeros((max(h, 0), max(w, 0)), dtype=bool)
    if h <= 0 or w <= 0:
        return mask
    ex0, ey0, ex1, ey1 = [], [], [], []
    for c in contours:
        n = len(c)
        if n < 3:
            continue
        for i in range(n):
            x0, y0 = c[i]
            x1, y1 = c[(i + 1) % n]
            if y0 != y1:
                ex0.append(x0)
                ey0.append(y0)
                ex1.append(x1)
                ey1.append(y1)
    if not ex0:
        return mask
    x0 = np.asarray(ex0)
    y0 = np.asarray(ey0)
    x1 = np.asarray(ex1)
    y1 = np.asarray(ey1)
    wind = np.where(y1 > y0, 1, -1)
    ylo = np.minimum(y0, y1)
    yhi = np.maximum(y0, y1)
    slope = (x1 - x0) / (y1 - y0)
    y_first = max(0, int(math.floor(np.min(ylo) - 0.5)))
    y_last = min(h - 1, int(math.ceil(np.max(yhi))))
    for py in range(y_first, y_last + 1):
        sy = py + 0.5
        hit = (ylo <= sy) & (sy < yhi)
        if not hit.any():
            continue
        xs = x0[hit] + (sy - y0[hit]) * slope[hit]
        ws = wind[hit]
        order = np.argsort(xs, kind="stable")
        xs = xs[order]
        acc = np.cumsum(ws[order])
        inside = acc != 0  # span [xs[i], xs[i+1]) is inside after edge i
        for i in np.nonzero(inside)[0]:
            if i + 1 >= len(xs):
                break
            a = int(math.ceil(xs[i] - 0.5))
            b = int(math.ceil(xs[i + 1] - 0.5))
            if b > a:
                mask[py, max(a, 0) : min(b, w)] = True
    return mask


def ink_pixels(arr: np.ndarray, threshold: int = 128) -> int:
    """Count inked (dark) pixels."""
    return int((arr < threshold).sum())


def block_ahash(arr: np.ndarray, blocks: int = 8):
    """Perceptual average-hash bit plane: split the bitmap into
    ``blocks × blocks`` integer-boundary tiles (tile b spans pixels
    ``[b·dim // blocks, (b+1)·dim // blocks)``), count ink per tile, and
    set a tile's bit when its ink count is STRICTLY above the page's mean
    tile ink (``ink · n_tiles > total`` — pure integer comparison, so the
    plane is exactly reproducible in SQL from the scene's clamped
    word-area sums). Returns ``(ink_counts, bits)`` arrays of shape
    (blocks, blocks)."""
    h, w = arr.shape
    mask = (arr < 128).astype(np.int64)
    ys = [(b * h) // blocks for b in range(blocks)]
    xs = [(b * w) // blocks for b in range(blocks)]
    sums = np.add.reduceat(np.add.reduceat(mask, ys, axis=0), xs, axis=1)
    total = int(sums.sum())
    bits = (sums * (blocks * blocks) > total).astype(np.int64)
    return sums, bits


# ---------------------------------------------------------------------------
# D3: crop / pad / resize / rotate on rasters (reference crops+pads table
# regions from the page image before structure inference)
# ---------------------------------------------------------------------------


def crop(arr: np.ndarray, x0: float, y0: float, x1: float, y1: float) -> np.ndarray:
    """Crop a page-coordinate box out of a raster (coords at the raster's
    own scale), clamped to bounds."""
    h, w = arr.shape[:2]
    c0 = max(0, int(np.floor(x0)))
    c1 = min(w, int(np.ceil(x1)))
    r0 = max(0, int(np.floor(y0)))
    r1 = min(h, int(np.ceil(y1)))
    return arr[r0:r1, c0:c1].copy()


def pad(arr: np.ndarray, amount: int, value: int = 255) -> np.ndarray:
    """Uniform border pad (the reference pads cropped table images before
    structure inference)."""
    widths = [(amount, amount), (amount, amount)] + [(0, 0)] * (arr.ndim - 2)
    return np.pad(arr, widths, constant_values=value)


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (deterministic, library-free)."""
    h, w = arr.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[rows][:, cols].copy()


def resize_bilinear(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize (deterministic, library-free): half-pixel-center
    sampling (the align_corners=False convention), float64 accumulation,
    round-half-up back to uint8. (H, W) or (H, W, C)."""
    h, w = arr.shape[:2]
    if out_h < 1 or out_w < 1:
        raise ValueError("resize target must be positive")
    ys = np.clip((np.arange(out_h) + 0.5) * h / out_h - 0.5, 0, h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * w / out_w - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    if arr.ndim == 3:
        fy = fy[:, :, None]
        fx = fx[:, :, None]
    a = arr[y0][:, x0].astype(np.float64)
    b = arr[y0][:, x1].astype(np.float64)
    c = arr[y1][:, x0].astype(np.float64)
    d = arr[y1][:, x1].astype(np.float64)
    top = a + (b - a) * fx
    bot = c + (d - c) * fx
    return np.floor(top + (bot - top) * fy + 0.5).astype(np.uint8)


def mask_runs(mask: np.ndarray):
    """Maximal runs of True in a 1-D boolean mask, as [start, end)
    pairs — THE island-finding primitive shared by the raster detector
    (ink-row runs, operators/detect.infer_raster) and the projection
    structure analysis below; keep one copy so adjacency semantics can
    never desynchronize them (their SQL twin is the interval-island
    window merge in operators/scene_sql.RASTER_CTES)."""
    idx = np.flatnonzero(mask)
    if len(idx) == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate([[0], breaks + 1])
    ends = np.concatenate([breaks, [len(idx) - 1]])
    return [(int(idx[s]), int(idx[e]) + 1) for s, e in zip(starts, ends)]


def projection_gaps(arr: np.ndarray, axis: int, threshold: int = 128):
    """Whitespace-projection structure analysis (the img2table-style
    borderless-table method, reference gmft/detectors/img2table.py's
    niche): project ink onto one axis and return the interior blank runs
    [start, end) in pixels — the pixel-domain twin of the histogram
    formatter's ``coverage_gaps`` (kernel/histogram.py:21), with the same
    first-to-last-change-point scoping (leading/trailing whitespace is
    not a gap).

    ``axis=0`` collapses rows → a width-long column profile (→ column
    dividers); ``axis=1`` collapses columns → a height-long row profile
    (→ row dividers). Grayscale (2-D) rasters only — a multi-channel
    array would silently produce channel-interleaved positions."""
    if arr.ndim != 2:
        raise ValueError(f"projection_gaps needs a 2-D raster, got {arr.shape}")
    ink = (arr < threshold).any(axis=axis)
    filled = np.flatnonzero(ink)
    if len(filled) == 0:
        return []
    lo, hi = filled[0], filled[-1]
    return [
        (lo + a, lo + b) for a, b in mask_runs(~ink[lo : hi + 1])
    ]


def rotate90(arr: np.ndarray, k: int = 1) -> np.ndarray:
    """Rotate the raster by k*90° counterclockwise (matches
    ``np.rot90``; the coordinate-space twin is geometry.rotate_words)."""
    return np.rot90(arr, k).copy()


# ---------------------------------------------------------------------------
# Prediction visualization — the debug overlay users reach for when a table
# extracts wrong (reference gmft/table_visualization.py:1-298 /
# CroppedTable.visualize). Same label→color mapping as the reference's
# matplotlib palette, drawn directly into the raster (no plotting dep).
# ---------------------------------------------------------------------------

# reference table_visualization.colors (matplotlib names → RGB): red for
# table/detections, blue=column, green=row, yellow=column header,
# orange=projected row header, violet=spanning cell
VIS_COLORS = {
    -1: (255, 0, 0),
    0: (255, 0, 0),
    1: (0, 0, 255),
    2: (0, 128, 0),
    3: (255, 255, 0),
    4: (255, 165, 0),
    5: (238, 130, 238),
}


def to_rgb(arr: np.ndarray) -> np.ndarray:
    """Grayscale (H, W) → RGB (H, W, 3); RGB input passes through."""
    if arr.ndim == 3:
        return arr.copy()
    return np.repeat(arr[:, :, None], 3, axis=2)


def draw_rect(
    rgb: np.ndarray,
    x0: float,
    y0: float,
    x1: float,
    y1: float,
    color: tuple,
    linewidth: int = 3,
) -> None:
    """Rectangle OUTLINE into an RGB raster, in place. The stroke is
    centered on the box edge (linewidth pixels thick, clamped to the
    canvas) — the raster twin of matplotlib's Rectangle patch."""
    h, w = rgb.shape[:2]
    half = linewidth / 2.0
    col = np.asarray(color, dtype=np.uint8)

    def band(r0, r1, c0, c1):
        r0, r1 = max(0, int(np.floor(r0))), min(h, int(np.ceil(r1)))
        c0, c1 = max(0, int(np.floor(c0))), min(w, int(np.ceil(c1)))
        if r1 > r0 and c1 > c0:
            rgb[r0:r1, c0:c1] = col

    band(y0 - half, y0 + half, x0 - half, x1 + half)  # top
    band(y1 - half, y1 + half, x0 - half, x1 + half)  # bottom
    band(y0 - half, y1 + half, x0 - half, x0 + half)  # left
    band(y0 - half, y1 + half, x1 - half, x1 + half)  # right


def draw_predictions(
    arr: np.ndarray,
    boxes,
    labels=None,
    linewidth: int = 3,
    offset: tuple = (0.0, 0.0),
    label_filter=None,
) -> np.ndarray:
    """Label-colored prediction outlines over a page/tile raster —
    returns a new RGB array. ``offset`` shifts table-local prediction
    coords into page space (the reference's ``padding``/``margin``
    params collapsed into one translation); ``label_filter`` keeps only
    the listed labels (reference ``filter`` param)."""
    rgb = to_rgb(arr)
    ox, oy = offset
    n = len(boxes)
    lbls = list(labels) if labels is not None else [0] * n
    for (x0, y0, x1, y1), lbl in zip(boxes, lbls):
        if label_filter is not None and lbl not in label_filter:
            continue
        color = VIS_COLORS.get(int(lbl), (255, 0, 0))
        draw_rect(rgb, x0 + ox, y0 + oy, x1 + ox, y1 + oy, color, linewidth)
    return rgb
