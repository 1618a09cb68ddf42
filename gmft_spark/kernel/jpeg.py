"""From-scratch JPEG (ITU-T T.81) codec — no PIL, no libjpeg.

Graduates the multimodal image seam past PNG (operators/multimodal.py
previously raised ``NotImplementedError`` for any non-PNG image): the
decoder handles real-world JFIF files — sequential baseline (SOF0/1)
AND progressive (SOF2) DCT with spectral selection + successive
approximation, Huffman entropy coding, grayscale and YCbCr with 4:4:4 /
4:2:2 / 4:2:0 subsampling, restart markers — and the encoders emit
spec-compliant baseline and progressive streams so test payloads and
synthetic media corpora are generated deterministically with zero
external dependencies — the same design as the from-scratch PNG codec
in kernel/raster.py.

Everything here derives from the public JPEG specification (ITU-T T.81 /
ISO 10918-1): the zigzag scan is generated algorithmically, the base
quantization tables are the spec's Annex K.1/K.2 examples, and the
encoder's Huffman tables are fixed-length prefix codes (12 DC symbols at
4 bits, 162/178 AC symbols at 8 bits — valid canonical tables, chosen
for construction simplicity over compression ratio; the decoder reads
whatever DHT the file carries, so it also decodes Annex-K-coded files).
The progressive refinement control flow follows the published libjpeg
jcphuff/jdphuff algorithms, the de-facto reference realization of the
spec's Annex G flowcharts.

Untrusted-input containment mirrors decode_png: hostile dimensions are
capped, every malformed-stream failure surfaces as ``ValueError`` for
the caller's error-row handling, and only genuine format gaps
(hierarchical / lossless / arithmetic coding) raise
``NotImplementedError``.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_jpeg",
    "encode_jpeg_progressive",
    "decode_jpeg",
    "probe_jpeg",
]

_MAX_DIM = 1 << 14  # hostile SOF containment (same spirit as decode_png)
_MAX_PIXELS = 1 << 24


def _zigzag() -> np.ndarray:
    """Scan-order → row-major flat index, generated from the diagonal
    traversal rule (even diagonals run up-right, odd run down-left)."""
    order = []
    for s in range(15):
        cells = [
            (i, s - i) for i in range(max(0, s - 7), min(8, s + 1))
        ]
        if s % 2 == 0:
            cells.reverse()  # even diagonal: up-right (row decreasing)
        order.extend(r * 8 + c for r, c in cells)
    return np.asarray(order, dtype=np.int64)


_ZIGZAG = _zigzag()

# ITU-T T.81 Annex K.1 / K.2 example quantization tables (row-major).
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling (public formula)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    out = np.floor((base * scale + 50.0) / 100.0)
    return np.clip(out, 1.0, 255.0)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix M: coef = M @ block @ M.T."""
    k = np.arange(8, dtype=np.float64)
    m = np.cos((2.0 * k[None, :] + 1.0) * k[:, None] * np.pi / 16.0)
    m *= np.sqrt(2.0 / 8.0)
    m[0, :] = np.sqrt(1.0 / 8.0)
    return m


_DCT_M = _dct_matrix()


# --- fixed encoder Huffman tables -------------------------------------
# All 12 DC categories at code length 4 (16 >= 12) and all 162 AC
# run/size symbols at length 8 (256 >= 162): fixed-length prefix codes
# are trivially valid canonical Huffman tables, and the all-ones code of
# each length stays unused (T.81 requirement).
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_AC_BITS = [0] * 7 + [162] + [0] * 8
_DC_CODES = {sym: (i, 4) for i, sym in enumerate(range(12))}
_AC_CODES = {sym: (i, 8) for i, sym in enumerate(_AC_SYMBOLS)}


class _BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self._out.append(byte)
            if byte == 0xFF:  # entropy-stream byte stuffing
                self._out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def pad_align(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec)

    def write_marker(self, marker: int) -> None:
        """Emit a raw marker (RSTn) — caller must pad_align first."""
        self._out += bytes([0xFF, marker])

    def flush(self) -> bytes:
        self.pad_align()
        return bytes(self._out)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, additional-bits) coding of a DC diff / AC value."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_blocks(
    writer: _BitWriter,
    coeffs: np.ndarray,
    dc_pred: int,
) -> int:
    """Huffman-encode quantized zigzag blocks (n, 64); returns new DC
    predictor."""
    for blk in coeffs:
        diff = int(blk[0]) - dc_pred
        dc_pred = int(blk[0])
        size, bits = _magnitude(diff)
        code, length = _DC_CODES[size]
        writer.write(code, length)
        if size:
            writer.write(bits, size)
        run = 0
        last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, length = _AC_CODES[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            size, bits = _magnitude(v)
            code, length = _AC_CODES[(run << 4) | size]
            writer.write(code, length)
            writer.write(bits, size)
            run = 0
        if last_nz < 63:
            code, length = _AC_CODES[0x00]  # EOB
            writer.write(code, length)
    return dc_pred


def _tile_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) → (n, 8, 8) blocks in
    MCU raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _quantize_plane(plane: np.ndarray, qtab_rowmajor: np.ndarray) -> np.ndarray:
    """Level-shift, batched DCT, quantize (row-major table), zigzag →
    (n, 64) int32 in scan order (zz[k] = rowmajor[_ZIGZAG[k]])."""
    blocks = _tile_blocks(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ij,njk,lk->nil", _DCT_M, blocks, _DCT_M)
    q = np.round(coef.reshape(-1, 64) / qtab_rowmajor[None, :])
    return q.astype(np.int32)[:, _ZIGZAG]


def _pad_to_multiple(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _dht_segment(tclass: int, tid: int, bits: list, symbols: list) -> bytes:
    body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tid: int, qtab: np.ndarray) -> bytes:
    body = bytes([tid]) + bytes(
        int(v) for v in qtab[_ZIGZAG]  # stored in zigzag order
    )
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 array — (H, W) grayscale or (H, W, 3) RGB — as a
    baseline JFIF JPEG. ``subsampling`` is '444' or '420' (color only).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (grayscale and 4:4:4 paths)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 pixels")
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        raise ValueError("encode_jpeg expects (H, W) or (H, W, 3)")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = arr.shape[0], arr.shape[1]
    if not (0 < h <= _MAX_DIM and 0 < w <= _MAX_DIM):
        raise ValueError("image dimensions out of range")

    color = len(planes) == 3
    sub420 = color and subsampling == "420"
    qluma = _scaled_quant(_QUANT_LUMA, quality)
    qchroma = _scaled_quant(_QUANT_CHROMA, quality)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (  # APP0 / JFIF 1.01, no thumbnail
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, _scaled_quant(_QUANT_LUMA, quality))
    if color:
        out += _dqt_segment(1, _scaled_quant(_QUANT_CHROMA, quality))
    # SOF0
    ncomp = 3 if color else 1
    sof = bytearray()
    sof += struct.pack(">BHHB", 8, h, w, ncomp)
    if color:
        yfac = 0x22 if sub420 else 0x11
        sof += bytes([1, yfac, 0])  # Y
        sof += bytes([2, 0x11, 1])  # Cb
        sof += bytes([3, 0x11, 1])  # Cr
    else:
        sof += bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + bytes(sof)
    # DHT: one DC + one AC table shared by all components
    out += _dht_segment(0, 0, _DC_BITS, list(range(12)))
    out += _dht_segment(1, 0, _AC_BITS, _AC_SYMBOLS)
    if restart_interval:
        if sub420:
            raise ValueError("restart_interval unsupported with 420")
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytearray([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])  # DC table 0 / AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + bytes(sos)

    writer = _BitWriter()

    def _emit_restart(i_mcu: int) -> None:
        writer.pad_align()
        writer.write_marker(0xD0 + ((i_mcu // restart_interval - 1) & 7))

    if not color:
        plane = _pad_to_multiple(planes[0], 8, 8)
        blocks = _quantize_plane(plane, qluma)
        if not restart_interval:
            _encode_blocks(writer, blocks, 0)
        else:
            pred = 0
            for i in range(blocks.shape[0]):
                if i and i % restart_interval == 0:
                    _emit_restart(i)
                    pred = 0
                pred = _encode_blocks(writer, blocks[i : i + 1], pred)
    elif not sub420:
        padded = [_pad_to_multiple(p, 8, 8) for p in planes]
        qs = [qluma, qchroma, qchroma]
        comp_blocks = [
            _quantize_plane(p, q) for p, q in zip(padded, qs)
        ]
        preds = [0, 0, 0]
        n_mcu = comp_blocks[0].shape[0]
        for i in range(n_mcu):
            if restart_interval and i and i % restart_interval == 0:
                _emit_restart(i)
                preds = [0, 0, 0]
            for c in range(3):
                preds[c] = _encode_blocks(
                    writer, comp_blocks[c][i : i + 1], preds[c]
                )
    else:
        ypl = _pad_to_multiple(planes[0], 16, 16)
        # chroma: average 2x2 then pad to 8
        def _down2(p: np.ndarray) -> np.ndarray:
            p = _pad_to_multiple(p, 2, 2)
            return (
                p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2)
                .mean(axis=(1, 3))
            )

        cbpl = _pad_to_multiple(_down2(planes[1]), 8, 8)
        crpl = _pad_to_multiple(_down2(planes[2]), 8, 8)
        yq = _quantize_plane(ypl, qluma)
        cbq = _quantize_plane(cbpl, qchroma)
        crq = _quantize_plane(crpl, qchroma)
        mcuw = ypl.shape[1] // 16
        mcuh = ypl.shape[0] // 16
        ybw = ypl.shape[1] // 8
        preds = [0, 0, 0]
        for my in range(mcuh):
            for mx in range(mcuw):
                for dy in range(2):
                    for dx in range(2):
                        bi = (my * 2 + dy) * ybw + (mx * 2 + dx)
                        preds[0] = _encode_blocks(
                            writer, yq[bi : bi + 1], preds[0]
                        )
                ci = my * mcuw + mx
                preds[1] = _encode_blocks(writer, cbq[ci : ci + 1], preds[1])
                preds[2] = _encode_blocks(writer, crq[ci : ci + 1], preds[2])
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder ------------------------------------------------
# The decoder-twin for the roundtrip tests: spectral selection AND
# successive approximation (T.81 Annex G), scan script modeled on
# libjpeg's default. The AC table gains the EOBn symbols (r<<4 for
# r=1..14) progressive run coding needs; still one fixed 8-bit length
# (178 codes < 255, all-ones code unused).

_AC_PROG_SYMBOLS = (
    [r << 4 for r in range(15)]  # EOB0..EOB14 (0x00 doubles as EOB0)
    + [0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_AC_PROG_BITS = [0] * 7 + [len(_AC_PROG_SYMBOLS)] + [0] * 8
_AC_PROG_CODES = {sym: (i, 8) for i, sym in enumerate(_AC_PROG_SYMBOLS)}


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift toward zero (G.1.2.2)."""
    return -((-v) >> al) if v < 0 else v >> al


class _ProgACWriter:
    """Scan-level EOB-run + correction-bit buffering shared by the AC
    scan emitters (jcphuff.c's emit_eobrun/emit_buffered_bits). Two
    distinct bit pools, matching the decoder's read order: ``run_bits``
    belong to the blocks of the pending EOB run (read right after the
    EOBn code), while each ZRL / newly-significant code flushes its own
    bits immediately after itself."""

    def __init__(self, writer: _BitWriter):
        self.w = writer
        self.eobrun = 0
        self.run_bits: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nb = self.eobrun.bit_length() - 1
            code, length = _AC_PROG_CODES[nb << 4]
            self.w.write(code, length)
            if nb:
                self.w.write(self.eobrun - (1 << nb), nb)
            self.eobrun = 0
            for b in self.run_bits:
                self.w.write(b, 1)
            self.run_bits = []

    def end_of_band(self, block_bits: list[int]) -> None:
        self.eobrun += 1
        self.run_bits.extend(block_bits)
        if self.eobrun == 0x7FFF:
            self.flush_eobrun()


def _emit_ac_first(
    state: _ProgACWriter, blk: np.ndarray, ss: int, se: int, al: int
) -> None:
    w = state.w
    r = 0
    for k in range(ss, se + 1):
        t = _pt_ac(int(blk[k]), al)
        if t == 0:
            r += 1
            continue
        state.flush_eobrun()
        while r > 15:
            code, length = _AC_PROG_CODES[0xF0]
            w.write(code, length)
            r -= 16
        size, bits = _magnitude(t)
        code, length = _AC_PROG_CODES[(r << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        r = 0
    if r > 0:
        state.end_of_band([])


def _emit_ac_refine(
    state: _ProgACWriter, blk: np.ndarray, ss: int, se: int, al: int
) -> None:
    w = state.w
    absvals = [abs(_pt_ac(int(blk[k]), al)) for k in range(ss, se + 1)]
    eob = ss - 1
    for i, a in enumerate(absvals):
        if a == 1:
            eob = ss + i
    r = 0
    cur_bits: list[int] = []  # correction bits since the last symbol
    for k in range(ss, se + 1):
        a = absvals[k - ss]
        if a == 0:
            r += 1
            continue
        # drain pending ZRLs at ANY nonzero coefficient (jcphuff: the
        # decoder's ZRL advance consumes history correction bits in
        # position order, so the run must be cut before buffering them)
        while r > 15 and k <= eob:
            state.flush_eobrun()
            code, length = _AC_PROG_CODES[0xF0]
            w.write(code, length)
            r -= 16
            for b in cur_bits:
                w.write(b, 1)
            cur_bits = []
        if a > 1:  # history coefficient: buffer its correction bit
            cur_bits.append(a & 1)
            continue
        # newly significant (|pt| == 1)
        state.flush_eobrun()
        code, length = _AC_PROG_CODES[(r << 4) | 1]
        w.write(code, length)
        w.write(1 if int(blk[k]) > 0 else 0, 1)
        for b in cur_bits:
            w.write(b, 1)
        cur_bits = []
        r = 0
    if r > 0 or cur_bits:
        state.end_of_band(cur_bits)


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 85, subsampling: str = "444"
) -> bytes:
    """Encode uint8 pixels as a PROGRESSIVE (SOF2) JFIF JPEG using a
    libjpeg-style scan script: DC first (Al=1) → luma/chroma AC bands
    (Al=2 / Al=1) → AC refinements → DC refinement. Quantized
    coefficients are identical to ``encode_jpeg`` at the same quality,
    so both decode to identical pixels (the roundtrip tests assert
    it)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive expects uint8 pixels")
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        raise ValueError("expects (H, W) or (H, W, 3)")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = arr.shape[0], arr.shape[1]
    if not (0 < h <= _MAX_DIM and 0 < w <= _MAX_DIM):
        raise ValueError("image dimensions out of range")
    color = len(planes) == 3
    sub420 = color and subsampling == "420"
    qluma = _scaled_quant(_QUANT_LUMA, quality)
    qchroma = _scaled_quant(_QUANT_CHROMA, quality)

    # quantized stores, padded to the MCU grid (store raster order)
    if not color:
        pl = _pad_to_multiple(planes[0], 8, 8)
        stores = [_quantize_plane(pl, qluma)]
        store_bw = [pl.shape[1] // 8]
        facs = [(1, 1)]
    elif not sub420:
        pls = [_pad_to_multiple(p, 8, 8) for p in planes]
        qs = [qluma, qchroma, qchroma]
        stores = [_quantize_plane(p, q) for p, q in zip(pls, qs)]
        store_bw = [p.shape[1] // 8 for p in pls]
        facs = [(1, 1)] * 3
    else:
        ypl = _pad_to_multiple(planes[0], 16, 16)

        def _down2(p: np.ndarray) -> np.ndarray:
            p = _pad_to_multiple(p, 2, 2)
            return (
                p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2)
                .mean(axis=(1, 3))
            )

        cbpl = _pad_to_multiple(_down2(planes[1]), 8, 8)
        crpl = _pad_to_multiple(_down2(planes[2]), 8, 8)
        # chroma planes must span the MCU grid (w/16 blocks)
        cbpl = _pad_to_multiple(cbpl, ypl.shape[0] // 2, ypl.shape[1] // 2)
        crpl = _pad_to_multiple(crpl, ypl.shape[0] // 2, ypl.shape[1] // 2)
        stores = [
            _quantize_plane(ypl, qluma),
            _quantize_plane(cbpl, qchroma),
            _quantize_plane(crpl, qchroma),
        ]
        store_bw = [
            ypl.shape[1] // 8, cbpl.shape[1] // 8, crpl.shape[1] // 8
        ]
        facs = [(2, 2), (1, 1), (1, 1)]

    ncomp = len(stores)
    hmax = max(f[0] for f in facs)
    vmax = max(f[1] for f in facs)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    out = bytearray()
    out += b"\xff\xd8"
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, qluma)
    if color:
        out += _dqt_segment(1, qchroma)
    sof = bytearray()
    sof += struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        hf, vf = facs[i]
        sof += bytes([i + 1, (hf << 4) | vf, 0 if i == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + bytes(sof)
    out += _dht_segment(0, 0, _DC_BITS, list(range(12)))
    out += _dht_segment(1, 0, _AC_PROG_BITS, _AC_PROG_SYMBOLS)

    def _sos(comp_specs: list[tuple[int, int, int]],
             ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytearray([len(comp_specs)])
        for cid, dct, act in comp_specs:
            body += bytes([cid, (dct << 4) | act])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + bytes(body)

    def _dc_block_iter():
        """(scan_comp_index, flat block index) in interleaved MCU order
        over the full padded grid."""
        for my in range(mcuy):
            for mx in range(mcux):
                for si in range(ncomp):
                    hf, vf = facs[si]
                    bw = store_bw[si]
                    for by in range(vf):
                        for bx in range(hf):
                            yield si, (my * vf + by) * bw + mx * hf + bx

    def _used_grid(si: int):
        hf, vf = facs[si]
        ubw = -(-(-(-w * hf // hmax)) // 8)
        ubh = -(-(-(-h * vf // vmax)) // 8)
        return ubw, ubh

    # scan 1: DC first, all components interleaved, Al=1
    out += _sos([(i + 1, 0, 0) for i in range(ncomp)], 0, 0, 0, 1)
    wtr = _BitWriter()
    preds = [0] * ncomp
    for si, blk in _dc_block_iter():
        dcv = int(stores[si][blk, 0]) >> 1  # arithmetic shift (DC pt)
        size, bits = _magnitude(dcv - preds[si])
        preds[si] = dcv
        code, length = _DC_CODES[size]
        wtr.write(code, length)
        if size:
            wtr.write(bits, size)
    out += wtr.flush()

    # AC scans: first pass at Al=al0, then refinements down to 0
    al0 = {0: 2} | ({1: 1, 2: 1} if color else {})
    bands = [(1, 5), (6, 63)]
    for si in range(ncomp):
        ubw, ubh = _used_grid(si)
        sbw = store_bw[si]
        for a in range(al0[si], -1, -1):
            first = a == al0[si]
            for ss_, se_ in (bands if si == 0 else [(1, 63)]):
                out += _sos(
                    [(si + 1, 0, 0)], ss_, se_,
                    0 if first else a + 1, a,
                )
                wtr = _BitWriter()
                state = _ProgACWriter(wtr)
                emit = _emit_ac_first if first else _emit_ac_refine
                for by in range(ubh):
                    for bx in range(ubw):
                        emit(
                            state, stores[si][by * sbw + bx],
                            ss_, se_, a,
                        )
                state.flush_eobrun()
                out += wtr.flush()

    # final scan: DC refinement (Ah=1, Al=0), interleaved
    out += _sos([(i + 1, 0, 0) for i in range(ncomp)], 0, 0, 1, 0)
    wtr = _BitWriter()
    for si, blk in _dc_block_iter():
        wtr.write(int(stores[si][blk, 0]) & 1, 1)
    out += wtr.flush()

    out += b"\xff\xd9"
    return bytes(out)


# --- decoder -----------------------------------------------------------


class _BitReader:
    """Entropy-segment reader: pre-unstuffs 0xFF00 once into per-restart
    chunks, then serves bits from a 64-bit-ish accumulator refilled 6
    bytes at a time — the standard fast path (bit-at-a-time reading made
    a 0.5 MP decode take minutes; this is ~100x). ``end`` is the
    absolute offset of the marker that terminated the entropy segment
    (progressive decoding resumes the marker walk there)."""

    def __init__(self, data: bytes, pos: int) -> None:
        chunks: list[bytes] = []
        markers: list[int] = []  # RSTn code that ENDED chunk i
        out = bytearray()
        i = pos
        n = len(data)
        while i < n:
            b = data[i]
            if b == 0xFF:
                nxt = data[i + 1] if i + 1 < n else None
                if nxt == 0x00:
                    out.append(0xFF)
                    i += 2
                    continue
                if nxt is not None and 0xD0 <= nxt <= 0xD7:
                    chunks.append(bytes(out))
                    markers.append(nxt)
                    out = bytearray()
                    i += 2
                    continue
                break  # real marker: entropy segment ends
            out.append(b)
            i += 1
        self.end = i
        chunks.append(bytes(out))
        self._chunks = chunks
        self._markers = markers
        self._ci = 0
        self._chunk = chunks[0]
        self._cpos = 0
        self._acc = 0
        self._nbits = 0

    def _refill(self) -> None:
        take = min(6, len(self._chunk) - self._cpos)
        if take > 0:
            self._acc = (self._acc << (8 * take)) | int.from_bytes(
                self._chunk[self._cpos : self._cpos + take], "big"
            )
            self._nbits += 8 * take
            self._cpos += take

    def decode(self, table: tuple[list, list]) -> int:
        """One Huffman symbol via the table's 16-bit prefix LUT."""
        if self._nbits < 16:
            self._refill()
        nb = self._nbits
        if nb >= 16:
            idx = (self._acc >> (nb - 16)) & 0xFFFF
        elif nb > 0:
            idx = (self._acc << (16 - nb)) & 0xFFFF
        else:
            raise ValueError("entropy stream truncated")
        lut_len, lut_sym = table
        ln = lut_len[idx]
        if ln == 0:
            raise ValueError("invalid Huffman code")
        if ln > nb:
            raise ValueError("entropy stream truncated")
        nb -= ln
        self._nbits = nb
        self._acc &= (1 << nb) - 1
        return lut_sym[idx]

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self._nbits < n:
            self._refill()
            if self._nbits < n:
                raise ValueError("entropy stream truncated")
        nb = self._nbits - n
        v = (self._acc >> nb) & ((1 << n) - 1)
        self._nbits = nb
        self._acc &= (1 << nb) - 1
        return v

    def sync_restart(self, expected: int) -> None:
        """Drop to the next restart chunk; the consumed RSTn must carry
        the expected modulo-8 index."""
        if self._ci >= len(self._markers):
            raise ValueError("missing restart marker")
        m = self._markers[self._ci]
        if (m & 7) != (expected & 7):
            raise ValueError(f"bad restart marker: {m!r}")
        self._ci += 1
        self._chunk = self._chunks[self._ci]
        self._cpos = 0
        self._acc = 0
        self._nbits = 0


def _build_huffman(bits: bytes, vals: bytes) -> tuple[list, list]:
    """Canonical T.81 Annex-C table as a 16-bit prefix LUT:
    (lut_len, lut_sym), each 65536 entries — index by the next 16 bits,
    get the code length to consume (0 = invalid prefix) and symbol."""
    lut_len = [0] * 65536
    lut_sym = [0] * 65536
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if vi >= len(vals):
                raise ValueError("DHT symbol count mismatch")
            sym = vals[vi]
            vi += 1
            if code >= (1 << length):
                raise ValueError("over-subscribed Huffman table")
            base = code << (16 - length)
            for k in range(1 << (16 - length)):
                lut_len[base + k] = length
                lut_sym[base + k] = sym
            code += 1
        code <<= 1
    return lut_len, lut_sym


def _decode_symbol(reader: _BitReader, table: tuple[list, list]) -> int:
    return reader.decode(table)


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode JPEG bytes → uint8 (H, W) grayscale or (H, W, 3) RGB.
    Supports sequential DCT (SOF0/SOF1) and progressive DCT (SOF2,
    spectral selection + successive approximation), 1 or 3 components
    with sampling factors up to 2×2, DRI/RSTn restart intervals.

    ``ValueError`` for any malformed stream (containment contract shared
    with decode_png); ``NotImplementedError`` only for genuine format
    gaps (hierarchical, lossless, arithmetic coding)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    try:
        return _decode_inner(data)
    except (struct.error, IndexError) as ex:
        raise ValueError(f"corrupt JPEG: {ex}") from ex


def _decode_inner(data: bytes) -> np.ndarray:
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None  # (h, w, comps) where comps: [(cid, hf, vf, tq)]
    progressive = False
    prog_coef: list[np.ndarray] | None = None  # per-comp (n, 64) int32
    restart_interval = 0
    out_planes: list[np.ndarray] | None = None

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(data):
            raise ValueError("truncated segment header")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment body")
        if marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                bits = seg[p + 1 : p + 17]
                if len(bits) < 16:
                    raise ValueError("truncated DHT")
                n = sum(bits)
                vals = seg[p + 17 : p + 17 + n]
                if len(vals) < n:
                    raise ValueError("truncated DHT symbols")
                table = _build_huffman(bits, vals)
                if tc_th >> 4 == 0:
                    dc_tables[tc_th & 15] = table
                else:
                    ac_tables[tc_th & 15] = table
                p += 17 + n
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq_tq = seg[p]
                if pq_tq >> 4 == 0:
                    raw = np.frombuffer(
                        seg[p + 1 : p + 65], dtype=np.uint8
                    ).astype(np.float64)
                    p += 65
                else:  # 16-bit table
                    raw = np.frombuffer(
                        seg[p + 1 : p + 129], dtype=">u2"
                    ).astype(np.float64)
                    p += 129
                if raw.size != 64:
                    raise ValueError("truncated DQT")
                tab = np.empty(64, dtype=np.float64)
                tab[_ZIGZAG] = raw  # de-zigzag to row-major
                qtables[pq_tq & 15] = tab
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if not (0 < h <= _MAX_DIM and 0 < w <= _MAX_DIM):
                raise ValueError("hostile SOF dimensions")
            if h * w > _MAX_PIXELS:
                raise ValueError("image too large")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                hf, vf = hv >> 4, hv & 15
                if hf not in (1, 2) or vf not in (1, 2):
                    raise ValueError("sampling factors beyond 2x2")
                comps.append((cid, hf, vf, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "non-baseline JPEG coding process not implemented"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            h, w, comps = frame
            ns = seg[0]
            if progressive:
                if prog_coef is None:
                    prog_coef = _alloc_coef_stores(frame)
                reader = _BitReader(data, pos + seglen)
                _progressive_scan(
                    reader, seg, frame, prog_coef,
                    dc_tables, ac_tables, restart_interval,
                )
                pos = reader.end
                continue
            if ns != len(comps):
                raise ValueError("partial-scan JPEG not supported")
            scan_tabs = {}
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tabs[cs] = (tdta >> 4, tdta & 15)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            # per-component quantized-coefficient stores
            coef = []
            for cid, hf, vf, tq in comps:
                bw, bh = mcux * hf, mcuy * vf
                coef.append(np.zeros((bh * bw, 64), dtype=np.float64))
            reader = _BitReader(data, pos + seglen)
            preds = [0] * len(comps)
            mcu_i = 0
            dec = reader.decode
            rcv = reader.receive
            comp_tabs = []
            # coefficients accumulate in flat python lists (fast appends)
            # and land in the numpy store via ONE fancy-index per
            # component — per-coefficient ndarray writes dominated the
            # profile otherwise
            idx_acc: list[list[int]] = [[] for _ in comps]
            val_acc: list[list[int]] = [[] for _ in comps]
            for cid, hf, vf, tq in comps:
                dct, act = scan_tabs[cid]
                dtab = dc_tables.get(dct)
                atab = ac_tables.get(act)
                if dtab is None or atab is None:
                    raise ValueError("missing Huffman table")
                comp_tabs.append((hf, vf, dtab, atab))
            for my in range(mcuy):
                for mx in range(mcux):
                    if (
                        restart_interval
                        and mcu_i
                        and mcu_i % restart_interval == 0
                    ):
                        reader.sync_restart(
                            (mcu_i // restart_interval - 1) & 7
                        )
                        preds = [0] * len(comps)
                    for ci, (hf, vf, dtab, atab) in enumerate(comp_tabs):
                        iacc = idx_acc[ci]
                        vacc = val_acc[ci]
                        rowlen = mcux * hf
                        for by in range(vf):
                            for bx in range(hf):
                                base = (
                                    (my * vf + by) * rowlen + mx * hf + bx
                                ) << 6
                                s = dec(dtab)
                                if s:
                                    v = rcv(s)
                                    preds[ci] += (
                                        v
                                        if v >= (1 << (s - 1))
                                        else v - (1 << s) + 1
                                    )
                                iacc.append(base)
                                vacc.append(preds[ci])
                                k = 1
                                while k < 64:
                                    rs = dec(atab)
                                    if rs == 0x00:  # EOB
                                        break
                                    if rs == 0xF0:  # ZRL
                                        k += 16
                                        continue
                                    k += rs >> 4
                                    size = rs & 15
                                    if k > 63:
                                        raise ValueError(
                                            "AC index overflow"
                                        )
                                    v = rcv(size)
                                    iacc.append(base + k)
                                    vacc.append(
                                        v
                                        if v >= (1 << (size - 1))
                                        else v - (1 << size) + 1
                                    )
                                    k += 1
                    mcu_i += 1
            for ci in range(len(comps)):
                if idx_acc[ci]:
                    coef[ci].ravel()[
                        np.asarray(idx_acc[ci], dtype=np.int64)
                    ] = np.asarray(val_acc[ci], dtype=np.float64)
            out_planes = _idct_planes(coef, comps, qtables, mcux, mcuy)
            break
        # other segments (APPn, COM) are skipped
        pos += seglen
    if progressive and prog_coef is not None and frame is not None:
        h, w, comps = frame
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        out_planes = _idct_planes(
            [c.astype(np.float64) for c in prog_coef],
            comps, qtables, mcux, mcuy,
        )
    if out_planes is None or frame is None:
        raise ValueError("no scan decoded")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if len(comps) == 1:
        plane = out_planes[0][:h, :w]
        return np.clip(np.round(plane), 0, 255).astype(np.uint8)
    full = []
    for (cid, hf, vf, tq), plane in zip(comps, out_planes):
        if hf < hmax or vf < vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vf, axis=0), hmax // hf, axis=1
            )
        full.append(plane[:h, :w])
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _idct_planes(
    coef: list[np.ndarray],
    comps: list,
    qtables: dict[int, np.ndarray],
    mcux: int,
    mcuy: int,
) -> list[np.ndarray]:
    """Dequantize + batched IDCT per component: (n, 64) float zigzag
    coefficient stores → level-shifted pixel planes."""
    out_planes = []
    for ci, (cid, hf, vf, tq) in enumerate(comps):
        qt = qtables.get(tq)
        if qt is None:
            raise ValueError("missing quant table")
        rm = np.empty_like(coef[ci])
        rm[:, _ZIGZAG] = coef[ci]  # zigzag → row-major
        rm *= qt[None, :]
        blocks = rm.reshape(-1, 8, 8)
        px = np.einsum("ji,njk,kl->nil", _DCT_M, blocks, _DCT_M)
        bw = mcux * hf
        bh = mcuy * vf
        plane = (
            px.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        out_planes.append(plane + 128.0)
    return out_planes


# --- progressive (SOF2) scan decoding ------------------------------------
# T.81 Annex G successive-approximation Huffman coding; the refinement
# control flow follows the published libjpeg jdphuff.c algorithms (the
# de-facto reference implementation of the spec's flowcharts).


def _frame_geometry(frame):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _alloc_coef_stores(frame) -> list[np.ndarray]:
    """Per-component (n_blocks, 64) int32 zigzag coefficient stores over
    the PADDED (MCU-aligned) block grid — scans accumulate into these."""
    h, w, comps = frame
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    return [
        np.zeros((mcux * hf * mcuy * vf, 64), dtype=np.int32)
        for (cid, hf, vf, tq) in comps
    ]


def _progressive_scan(
    reader: "_BitReader",
    seg: bytes,
    frame,
    prog_coef: list[np.ndarray],
    dc_tables: dict,
    ac_tables: dict,
    restart_interval: int,
) -> None:
    """Decode one progressive scan into the coefficient stores.

    Four scan species: DC first (Ss=0, Ah=0; ns may interleave all
    components), DC refinement (Ss=0, Ah>0: one raw bit per block), AC
    first (single component, band Ss..Se, values << Al, EOBn run codes),
    AC refinement (correction bits for history coefficients + newly
    significant ±1<<Al insertions — jdphuff.c decode_mcu_AC_refine)."""
    h, w, comps = frame
    ns = seg[0]
    if ns < 1 or len(seg) < 4 + 2 * ns:
        raise ValueError("bad SOS header")
    scan_comps = []  # (ci, dc_table_id, ac_table_id)
    for i in range(ns):
        cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
        ci = next(
            (j for j, c in enumerate(comps) if c[0] == cs), None
        )
        if ci is None:
            raise ValueError("scan names unknown component")
        scan_comps.append((ci, tdta >> 4, tdta & 15))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ah_al = seg[3 + 2 * ns]
    ah, al = ah_al >> 4, ah_al & 15
    if ss > se or se > 63 or al > 13:
        raise ValueError("bad spectral selection")
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    dec = reader.decode
    rcv = reader.receive

    if ss == 0:  # DC scan (first or refinement); se must be 0
        if se != 0:
            raise ValueError("DC scan with nonzero Se")
        tabs = []
        for ci, dct, act in scan_comps:
            if ah == 0:
                t = dc_tables.get(dct)
                if t is None:
                    raise ValueError("missing DC Huffman table")
            else:
                t = None  # refinement reads raw bits only
            tabs.append(t)
        preds = [0] * len(scan_comps)
        mcu_i = 0
        # interleaved: MCU walk over every (hf, vf) block incl. padding;
        # single-component scans use the same walk with hf=vf=1 over the
        # component's own padded grid (spec: non-interleaved MCU = 1 blk)
        if ns > 1:
            walks = [
                (ci, comps[ci][1], comps[ci][2], mcux * comps[ci][1])
                for ci, _, _ in scan_comps
            ]
            total_x, total_y = mcux, mcuy
        else:
            ci = scan_comps[0][0]
            _, hf, vf, _ = comps[ci]
            walks = [(ci, 1, 1, mcux * hf)]
            total_x = -(-(-(-w * hf // hmax)) // 8)  # ceil(comp_w/8)
            total_y = -(-(-(-h * vf // vmax)) // 8)
        for my in range(total_y):
            for mx in range(total_x):
                if (
                    restart_interval
                    and mcu_i
                    and mcu_i % restart_interval == 0
                ):
                    reader.sync_restart(
                        (mcu_i // restart_interval - 1) & 7
                    )
                    preds = [0] * len(scan_comps)
                for si, (ci, hf, vf, rowlen) in enumerate(walks):
                    store = prog_coef[ci]
                    for by in range(vf):
                        for bx in range(hf):
                            blk = (my * vf + by) * rowlen + mx * hf + bx
                            if ah == 0:
                                s = dec(tabs[si])
                                if s:
                                    v = rcv(s)
                                    preds[si] += _extend(v, s)
                                store[blk, 0] = preds[si] << al
                            else:
                                if rcv(1):
                                    store[blk, 0] |= 1 << al
                mcu_i += 1
        return

    # AC scan: exactly one component (spec G.1.1.1.1)
    if ns != 1:
        raise ValueError("interleaved AC progressive scan")
    ci, dct, act = scan_comps[0]
    atab = ac_tables.get(act)
    if atab is None:
        raise ValueError("missing AC Huffman table")
    cid, hf, vf, tq = comps[ci]
    store = prog_coef[ci]
    sbw = mcux * hf  # store stride (padded)
    used_bw = -(-(-(-w * hf // hmax)) // 8)
    used_bh = -(-(-(-h * vf // vmax)) // 8)
    eobrun = 0
    p1 = 1 << al
    m1 = -p1
    blk_i = 0
    for by in range(used_bh):
        for bx in range(used_bw):
            if (
                restart_interval
                and blk_i
                and blk_i % restart_interval == 0
            ):
                reader.sync_restart((blk_i // restart_interval - 1) & 7)
                eobrun = 0
            blk_i += 1
            blk = by * sbw + bx
            if ah == 0:  # AC first scan
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = dec(atab)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rcv(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC index overflow")
                    store[blk, k] = _extend(rcv(s), s) << al
                    k += 1
                continue
            # AC refinement scan
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = dec(atab)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r < 15:  # EOBn: current block joins the run
                            eobrun = 1 << r
                            if r:
                                eobrun += rcv(r)
                            break
                        val = 0  # ZRL: 16 zero-history skips
                    else:
                        if s != 1:
                            raise ValueError("bad AC refinement code")
                        val = p1 if rcv(1) else m1
                    while k <= se:
                        c = int(store[blk, k])
                        if c != 0:
                            if rcv(1) and (c & p1) == 0:
                                store[blk, k] = (
                                    c + p1 if c >= 0 else c + m1
                                )
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val != 0:
                        if k > se:
                            raise ValueError("AC refinement overflow")
                        store[blk, k] = val
                    k += 1
            if eobrun > 0:
                # correction bits for the remaining nonzero history
                while k <= se:
                    c = int(store[blk, k])
                    if c != 0 and rcv(1) and (c & p1) == 0:
                        store[blk, k] = c + p1 if c >= 0 else c + m1
                    k += 1
                eobrun -= 1


def probe_jpeg(data: bytes) -> dict:
    """Header-only metadata probe: width/height/components without
    entropy decode (for media_stats over large corpora)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        if marker in (0xC0, 0xC1, 0xC2):
            prec, h, w, nc = struct.unpack(
                ">BHHB", data[pos + 2 : pos + 8]
            )
            return {
                "width": int(w),
                "height": int(h),
                "n_components": int(nc),
                "progressive": marker == 0xC2,
            }
        if marker == 0xDA:
            break
        pos += seglen
    raise ValueError("no SOF found")
