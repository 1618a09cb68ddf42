"""From-scratch baseline JPEG (ITU-T T.81) codec — no PIL, no libjpeg.

Graduates the multimodal image seam past PNG (operators/multimodal.py
previously raised ``NotImplementedError`` for any non-PNG image): the
decoder handles real-world baseline JFIF files (sequential DCT, Huffman
entropy coding, grayscale and YCbCr with 4:4:4 / 4:2:2 / 4:2:0
subsampling, restart markers), and the encoder emits spec-compliant
baseline JPEG so test payloads and synthetic media corpora are generated
deterministically with zero external dependencies — the same design as
the from-scratch PNG codec in kernel/raster.py.

Everything here derives from the public JPEG specification (ITU-T T.81 /
ISO 10918-1): the zigzag scan is generated algorithmically, the base
quantization tables are the spec's Annex K.1/K.2 examples, and the
encoder's Huffman tables are fixed-length prefix codes (12 DC symbols at
4 bits, 162 AC symbols at 8 bits — valid canonical tables, chosen for
construction simplicity over compression ratio; the decoder reads
whatever DHT the file carries, so it also decodes Annex-K-coded files).

Untrusted-input containment mirrors decode_png: hostile dimensions are
capped, every malformed-stream failure surfaces as ``ValueError`` for
the caller's error-row handling, and only genuine format gaps
(progressive / arithmetic coding) raise ``NotImplementedError``.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg", "probe_jpeg"]

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


# --- decoder -----------------------------------------------------------


class _BitReader:
    """Entropy-segment reader: pre-unstuffs 0xFF00 once into per-restart
    chunks, then serves bits from a 64-bit-ish accumulator refilled 6
    bytes at a time — the standard fast path (bit-at-a-time reading made
    a 0.5 MP decode take minutes; this is ~100x)."""

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
    """Decode baseline JPEG bytes → uint8 (H, W) grayscale or (H, W, 3)
    RGB. Supports sequential DCT (SOF0/SOF1), 1 or 3 components with
    sampling factors up to 2×2, DRI/RSTn restart intervals.

    ``ValueError`` for any malformed stream (containment contract shared
    with decode_png); ``NotImplementedError`` only for genuine format
    gaps (progressive SOF2, arithmetic coding)."""
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
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (baseline)
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
        elif marker == 0xC2:
            raise NotImplementedError(
                "progressive JPEG decode not implemented (baseline only)"
            )
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
            # dequantize + batched IDCT per component
            out_planes = []
            for ci, (cid, hf, vf, tq) in enumerate(comps):
                qt = qtables.get(tq)
                if qt is None:
                    raise ValueError("missing quant table")
                rm = np.empty_like(coef[ci])
                rm[:, _ZIGZAG] = coef[ci]  # zigzag → row-major
                rm *= qt[None, :]
                blocks = rm.reshape(-1, 8, 8)
                px = np.einsum(
                    "ji,njk,kl->nil", _DCT_M, blocks, _DCT_M
                )
                bw = mcux * hf
                bh = mcuy * vf
                plane = (
                    px.reshape(bh, bw, 8, 8)
                    .transpose(0, 2, 1, 3)
                    .reshape(bh * 8, bw * 8)
                )
                out_planes.append(plane + 128.0)
            break
        # other segments (APPn, COM) are skipped
        pos += seglen
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
