"""CCITT Group 3/4 (ITU-T T.4/T.6) fax codec — from scratch, stdlib+numpy.

Decodes the `CCITTFaxDecode` streams PDF scanners embed (the last two
undecoded images in the reference golden corpus are K=-1 Group 4 scans;
reference behavior: pdfium's fax decoder feeding FPDF_RenderPageBitmap).
Covers K < 0 (pure 2-D / T.6 MMR), K = 0 (pure 1-D MH rows, optional
EOLs), and K > 0 (T.4 mixed 2-D: every row framed EOL + tag bit, 1-D
rows at least every K rows, 2-D rows coded against the previous row) —
the three row coders share one transition-list representation, so the
2-D machinery is written once (``_decode_2d_row`` / ``_encode_2d_row``).

The encoder exists for the roundtrip property tests: the code tables are
prefix-free per color class (asserted in tests), and a transcription
error in either table breaks the corpus decode (a T.6 stream is a dense
prefix-code sequence — a wrong entry desynchronizes the row geometry
long before row `Rows`).

Bit conventions follow the PDF filter contract: the DECODED output of
this module is a (rows, cols) uint8 array with 1 = BLACK pixel; the
caller maps it to sample bits per /BlackIs1 (default false: black = 0).
"""

from __future__ import annotations

from bisect import bisect_right
from typing import List, Optional, Tuple

import numpy as np

# ── ITU-T T.4 modified-Huffman run-length tables ─────────────────────
# (code_as_bit_string, run_length); terminating codes 0–63 then makeup
# codes 64–2560 in steps of 64; the 1792–2560 extended makeups are
# shared by both colors.

_WHITE_CODES: List[Tuple[str, int]] = [
    ("00110101", 0), ("000111", 1), ("0111", 2), ("1000", 3),
    ("1011", 4), ("1100", 5), ("1110", 6), ("1111", 7),
    ("10011", 8), ("10100", 9), ("00111", 10), ("01000", 11),
    ("001000", 12), ("000011", 13), ("110100", 14), ("110101", 15),
    ("101010", 16), ("101011", 17), ("0100111", 18), ("0001100", 19),
    ("0001000", 20), ("0010111", 21), ("0000011", 22), ("0000100", 23),
    ("0101000", 24), ("0101011", 25), ("0010011", 26), ("0100100", 27),
    ("0011000", 28), ("00000010", 29), ("00000011", 30), ("00011010", 31),
    ("00011011", 32), ("00010010", 33), ("00010011", 34), ("00010100", 35),
    ("00010101", 36), ("00010110", 37), ("00010111", 38), ("00101000", 39),
    ("00101001", 40), ("00101010", 41), ("00101011", 42), ("00101100", 43),
    ("00101101", 44), ("00000100", 45), ("00000101", 46), ("00001010", 47),
    ("00001011", 48), ("01010010", 49), ("01010011", 50), ("01010100", 51),
    ("01010101", 52), ("00100100", 53), ("00100101", 54), ("01011000", 55),
    ("01011001", 56), ("01011010", 57), ("01011011", 58), ("01001010", 59),
    ("01001011", 60), ("00110010", 61), ("00110011", 62), ("00110100", 63),
    # makeup
    ("11011", 64), ("10010", 128), ("010111", 192), ("0110111", 256),
    ("00110110", 320), ("00110111", 384), ("01100100", 448),
    ("01100101", 512), ("01101000", 576), ("01100111", 640),
    ("011001100", 704), ("011001101", 768), ("011010010", 832),
    ("011010011", 896), ("011010100", 960), ("011010101", 1024),
    ("011010110", 1088), ("011010111", 1152), ("011011000", 1216),
    ("011011001", 1280), ("011011010", 1344), ("011011011", 1408),
    ("010011000", 1472), ("010011001", 1536), ("010011010", 1600),
    ("011000", 1664), ("010011011", 1728),
]

_BLACK_CODES: List[Tuple[str, int]] = [
    ("0000110111", 0), ("010", 1), ("11", 2), ("10", 3),
    ("011", 4), ("0011", 5), ("0010", 6), ("00011", 7),
    ("000101", 8), ("000100", 9), ("0000100", 10), ("0000101", 11),
    ("0000111", 12), ("00000100", 13), ("00000111", 14), ("000011000", 15),
    ("0000010111", 16), ("0000011000", 17), ("0000001000", 18),
    ("00001100111", 19), ("00001101000", 20), ("00001101100", 21),
    ("00000110111", 22), ("00000101000", 23), ("00000010111", 24),
    ("00000011000", 25), ("000011001010", 26), ("000011001011", 27),
    ("000011001100", 28), ("000011001101", 29), ("000001101000", 30),
    ("000001101001", 31), ("000001101010", 32), ("000001101011", 33),
    ("000011010010", 34), ("000011010011", 35), ("000011010100", 36),
    ("000011010101", 37), ("000011010110", 38), ("000011010111", 39),
    ("000001101100", 40), ("000001101101", 41), ("000011011010", 42),
    ("000011011011", 43), ("000001010100", 44), ("000001010101", 45),
    ("000001010110", 46), ("000001010111", 47), ("000001100100", 48),
    ("000001100101", 49), ("000001010010", 50), ("000001010011", 51),
    ("000000100100", 52), ("000000110111", 53), ("000000111000", 54),
    ("000000100111", 55), ("000000101000", 56), ("000001011000", 57),
    ("000001011001", 58), ("000000101011", 59), ("000000101100", 60),
    ("000001011010", 61), ("000001100110", 62), ("000001100111", 63),
    # makeup
    ("0000001111", 64), ("000011001000", 128), ("000011001001", 192),
    ("000001011011", 256), ("000000110011", 320), ("000000110100", 384),
    ("000000110101", 448), ("0000001101100", 512), ("0000001101101", 576),
    ("0000001001010", 640), ("0000001001011", 704), ("0000001001100", 768),
    ("0000001001101", 832), ("0000001110010", 896), ("0000001110011", 960),
    ("0000001110100", 1024), ("0000001110101", 1088),
    ("0000001110110", 1152), ("0000001110111", 1216),
    ("0000001010010", 1280), ("0000001010011", 1344),
    ("0000001010100", 1408), ("0000001010101", 1472),
    ("0000001011010", 1536), ("0000001011011", 1600),
    ("0000001100100", 1664), ("0000001100101", 1728),
]

_EXT_MAKEUP: List[Tuple[str, int]] = [
    ("00000001000", 1792), ("00000001100", 1856), ("00000001101", 1920),
    ("000000010010", 1984), ("000000010011", 2048), ("000000010100", 2112),
    ("000000010101", 2176), ("000000010110", 2240), ("000000010111", 2304),
    ("000000011100", 2368), ("000000011101", 2432), ("000000011110", 2496),
    ("000000011111", 2560),
]

# 2-D vertical/pass/horizontal mode codes (T.6 §2.2.4)
_MODE_CODES: List[Tuple[str, str]] = [
    ("1", "V0"), ("011", "VR1"), ("000011", "VR2"), ("0000011", "VR3"),
    ("010", "VL1"), ("000010", "VL2"), ("0000010", "VL3"),
    ("001", "H"), ("0001", "P"),
]

_EOL = "000000000001"
_MAX_CODE_BITS = 13


def _build_run_lut(codes: List[Tuple[str, int]]):
    """Peek-13-bit LUT: index -> (run, nbits, is_terminating)."""
    lut: List[Optional[Tuple[int, int, bool]]] = [None] * (1 << _MAX_CODE_BITS)
    for bits, run in codes + _EXT_MAKEUP:
        n = len(bits)
        base = int(bits, 2) << (_MAX_CODE_BITS - n)
        for i in range(1 << (_MAX_CODE_BITS - n)):
            lut[base + i] = (run, n, run < 64)
    return lut


def _build_mode_lut():
    lut: List[Optional[Tuple[str, int]]] = [None] * (1 << 7)
    for bits, mode in _MODE_CODES:
        n = len(bits)
        base = int(bits, 2) << (7 - n)
        for i in range(1 << (7 - n)):
            lut[base + i] = (mode, n)
    return lut


_WHITE_LUT = _build_run_lut(_WHITE_CODES)
_BLACK_LUT = _build_run_lut(_BLACK_CODES)
_MODE_LUT = _build_mode_lut()


class _BitReader:
    """MSB-first bit reader; reads past the end return zero bits (a T.4
    stream may omit EOFB and rely on the row count)."""

    __slots__ = ("data", "nbytes", "bytepos", "bitbuf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.nbytes = len(data)
        self.bytepos = 0
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            b = self.data[self.bytepos] if self.bytepos < self.nbytes else 0
            self.bytepos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def peek(self, k: int) -> int:
        self._fill(k)
        return (self.bitbuf >> (self.nbits - k)) & ((1 << k) - 1)

    def skip(self, k: int) -> None:
        self._fill(k)
        self.nbits -= k
        self.bitbuf &= (1 << self.nbits) - 1

    def exhausted(self) -> bool:
        """True once every real input bit has been consumed (bits taken
        from the zero padding `_fill` synthesizes past the end do not
        count as remaining input)."""
        if self.bytepos < self.nbytes:
            return False
        pad_bits = 8 * (self.bytepos - self.nbytes)
        return self.nbits <= pad_bits

    def byte_align(self) -> None:
        extra = self.nbits % 8
        if extra:
            self.skip(extra)


def _read_run(r: _BitReader, black: bool) -> int:
    """One complete MH run length (makeup chain + terminating code)."""
    lut = _BLACK_LUT if black else _WHITE_LUT
    total = 0
    for _ in range(64):  # bound: longest legal chain is short
        ent = lut[r.peek(_MAX_CODE_BITS)]
        if ent is None:
            raise ValueError("bad MH code")
        run, n, terminating = ent
        r.skip(n)
        total += run
        if terminating:
            return total
    raise ValueError("unterminated MH makeup chain")


def _decode_2d_row(
    r: _BitReader, ref: List[int], columns: int
) -> List[int]:
    """One 2-D coded row (shared by T.6 and T.4 K>0) → transition list.
    ``ref`` is the previous row's transitions + [columns, columns]."""
    cur: List[int] = []
    a0 = -1
    color = 0  # 0 = white
    guard = 0
    while a0 < columns:
        guard += 1
        if guard > 2 * columns + 8:
            raise ValueError("row fails to terminate")
        # b1: first ref transition > a0 with parity matching `color`
        i = bisect_right(ref, a0)
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else columns
        b2 = ref[i + 1] if i + 1 < len(ref) else columns
        ent = _MODE_LUT[r.peek(7)]
        if ent is None:
            raise ValueError("bad 2-D mode code")
        mode, n = ent
        r.skip(n)
        if mode == "P":
            a0 = b2
        elif mode == "H":
            start = a0 if a0 > 0 else 0
            r1 = _read_run(r, black=bool(color))
            r2 = _read_run(r, black=not bool(color))
            a1 = start + r1
            a2 = a1 + r2
            if a2 > columns or a1 > columns:
                a1 = min(a1, columns)
                a2 = min(a2, columns)
            cur.append(a1)
            cur.append(a2)
            a0 = a2
        else:  # vertical family
            delta = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                     "VL1": -1, "VL2": -2, "VL3": -3}[mode]
            a1 = b1 + delta
            if a1 < 0 or a1 > columns:
                raise ValueError("vertical mode out of row")
            cur.append(a1)
            a0 = a1
            color ^= 1
    return cur


def _decode_1d_row(r: _BitReader, columns: int) -> List[int]:
    """One MH 1-D coded row → transition list."""
    cur: List[int] = []
    pos = 0
    color = 0
    while pos < columns:
        run = _read_run(r, black=bool(color))
        pos += run
        cur.append(min(pos, columns))
        color ^= 1
    if pos > columns:
        raise ValueError("1-D row overruns columns")
    return cur


def decode_g4(
    data: bytes,
    columns: int,
    rows: Optional[int] = None,
    byte_align: bool = False,
) -> np.ndarray:
    """T.6 (K<0) decode → (rows, columns) uint8, 1 = black.

    With ``rows=None`` decodes until EOFB / input end. Raises
    ``ValueError`` on malformed streams (bad codes, rows overrunning
    ``columns``)."""
    if columns <= 0:
        raise ValueError("columns must be positive")
    r = _BitReader(data)
    # reference line transitions: ref[2k] white→black, ref[2k+1] black→white
    ref: List[int] = [columns, columns]
    out_rows: List[List[int]] = []
    max_rows = rows if rows is not None else 1 << 30
    while len(out_rows) < max_rows:
        if byte_align:
            r.byte_align()
        if rows is None and r.exhausted():
            break
        if r.peek(len(_EOL)) == 1:  # EOL prefix == EOFB half
            break
        cur = _decode_2d_row(r, ref, columns)
        out_rows.append(cur)
        ref = cur + [columns, columns]
    if rows is not None and len(out_rows) < rows:
        raise ValueError(f"short G4 stream: {len(out_rows)}/{rows} rows")
    return _rows_to_bitmap(out_rows, columns)


def decode_g3_1d(
    data: bytes,
    columns: int,
    rows: Optional[int] = None,
    byte_align: bool = False,
) -> np.ndarray:
    """T.4 pure 1-D (K=0) decode → (rows, columns) uint8, 1 = black.
    Leading EOLs are consumed when present (PDF writers may omit them)."""
    if columns <= 0:
        raise ValueError("columns must be positive")
    r = _BitReader(data)
    out_rows: List[List[int]] = []
    max_rows = rows if rows is not None else 1 << 30
    while len(out_rows) < max_rows:
        if byte_align:
            r.byte_align()
        # skip any EOL(s) + fill bits
        guard = 0
        while r.peek(len(_EOL)) == 1:
            r.skip(len(_EOL))
            guard += 1
            if guard > 64:
                break
        if rows is None and r.exhausted():
            break
        out_rows.append(_decode_1d_row(r, columns))
    if rows is not None and len(out_rows) < rows:
        raise ValueError(f"short G3 stream: {len(out_rows)}/{rows} rows")
    return _rows_to_bitmap(out_rows, columns)


def decode_g3_2d(
    data: bytes,
    columns: int,
    rows: Optional[int] = None,
    byte_align: bool = False,
) -> np.ndarray:
    """T.4 mixed 2-D (K>0) decode → (rows, columns) uint8, 1 = black.

    Every row is framed ``EOL + tag`` (tag 1 = 1-D MH row, 0 = 2-D row
    coded against the previous row); zero fill bits before an EOL are
    consumed. With ``rows=None`` decodes until RTC (an EOL directly
    following an EOL+1 frame) or input end. ``byte_align`` aligns
    before each EOL (PDF ``EncodedByteAlign``)."""
    if columns <= 0:
        raise ValueError("columns must be positive")
    r = _BitReader(data)
    ref: List[int] = [columns, columns]
    out_rows: List[List[int]] = []
    max_rows = rows if rows is not None else 1 << 30
    while len(out_rows) < max_rows:
        if byte_align:
            r.byte_align()
        # zero fill bits, then the mandatory EOL
        guard = 0
        while not r.exhausted() and r.peek(len(_EOL)) != 1:
            if r.peek(1) != 0:
                raise ValueError("expected EOL before G3 2-D row")
            r.skip(1)
            guard += 1
            if guard > 4096:
                raise ValueError("EOL fill search overran")
        if r.exhausted():
            break
        r.skip(len(_EOL))
        tag = r.peek(1)
        r.skip(1)
        if tag and (r.exhausted() or r.peek(len(_EOL)) == 1):
            break  # RTC: EOL+1 frames with no row data between them
        if tag:
            cur = _decode_1d_row(r, columns)
        else:
            cur = _decode_2d_row(r, ref, columns)
        out_rows.append(cur)
        ref = cur + [columns, columns]
    if rows is not None and len(out_rows) < rows:
        raise ValueError(
            f"short G3 2-D stream: {len(out_rows)}/{rows} rows"
        )
    return _rows_to_bitmap(out_rows, columns)


def decode_ccitt(
    data: bytes,
    columns: int,
    rows: Optional[int],
    k: int = 0,
    byte_align: bool = False,
) -> np.ndarray:
    """PDF CCITTFaxDecode dispatch: K<0 → G4, K=0 → G3 1-D, K>0 → G3
    mixed 2-D."""
    if k < 0:
        return decode_g4(data, columns, rows, byte_align)
    if k == 0:
        return decode_g3_1d(data, columns, rows, byte_align)
    return decode_g3_2d(data, columns, rows, byte_align)


def _rows_to_bitmap(out_rows: List[List[int]], columns: int) -> np.ndarray:
    h = len(out_rows)
    bitmap = np.zeros((h, columns + 1), dtype=np.uint8)
    for y, tr in enumerate(out_rows):
        if not tr:
            continue
        row = bitmap[y]
        for p in tr:
            row[p] ^= 1
    return np.cumsum(bitmap, axis=1, dtype=np.uint8)[:, :columns] & 1


# ── encoder (roundtrip-test twin) ────────────────────────────────────


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, bits: str) -> None:
        for c in bits:
            self.acc = (self.acc << 1) | (c == "1")
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc << (8 - self.nbits))
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)

    def pad_align(self) -> None:
        """Zero-fill to the next byte boundary (EncodedByteAlign)."""
        if self.nbits:
            self.buf.append(self.acc << (8 - self.nbits))
            self.acc = 0
            self.nbits = 0


_ENC_WHITE = {run: bits for bits, run in _WHITE_CODES}
_ENC_BLACK = {run: bits for bits, run in _BLACK_CODES}
_ENC_EXT = {run: bits for bits, run in _EXT_MAKEUP}
_ENC_MODE = {mode: bits for bits, mode in _MODE_CODES}


def _write_run(w: _BitWriter, run: int, black: bool) -> None:
    table = _ENC_BLACK if black else _ENC_WHITE
    while run > 2623:
        w.write(_ENC_EXT[2560])
        run -= 2560
    if run >= 1792:
        ext = (run // 64) * 64  # largest extended makeup ≤ run (≤ 2560)
        w.write(_ENC_EXT[ext])
        run -= ext
    elif run >= 64:
        mk = (run // 64) * 64
        w.write(table[mk])
        run -= mk
    w.write(table[run])


def _transitions(line: np.ndarray) -> List[int]:
    """Positions where the color changes, starting from white."""
    padded = np.concatenate(([0], line.astype(np.int8)))
    idx = np.nonzero(np.diff(padded))[0]
    return idx.tolist()


def _encode_2d_row(
    w: _BitWriter, cur: List[int], ref: List[int], cols: int
) -> None:
    """One 2-D coded row (shared by T.6 and T.4 K>0). ``cur`` is the
    row's transition list; ``ref`` the previous row's + [cols, cols]."""
    curx = cur + [cols, cols, cols]
    a0 = -1
    color = 0
    ci = 0  # index of next transition > a0 in cur
    while a0 < cols:
        a1 = curx[ci] if ci < len(cur) else cols
        i = bisect_right(ref, a0)
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else cols
        b2 = ref[i + 1] if i + 1 < len(ref) else cols
        if b2 < a1:
            w.write(_ENC_MODE["P"])
            a0 = b2
        elif abs(a1 - b1) <= 3:
            w.write(_ENC_MODE[
                {0: "V0", 1: "VR1", 2: "VR2", 3: "VR3",
                 -1: "VL1", -2: "VL2", -3: "VL3"}[a1 - b1]
            ])
            a0 = a1
            color ^= 1
            ci += 1
        else:
            a2 = curx[ci + 1] if ci + 1 < len(cur) else cols
            start = a0 if a0 > 0 else 0
            w.write(_ENC_MODE["H"])
            _write_run(w, a1 - start, black=bool(color))
            _write_run(w, a2 - a1, black=not bool(color))
            a0 = a2
            ci += 2


def _encode_1d_row(w: _BitWriter, cur: List[int], cols: int) -> None:
    """One MH 1-D coded row from its transition list."""
    pos = 0
    color = 0
    for t in cur + [cols]:
        if t < pos:
            continue
        _write_run(w, t - pos, black=bool(color))
        pos = t
        color ^= 1
        if pos >= cols:
            break
    if pos < cols:
        _write_run(w, cols - pos, black=bool(color))


def encode_g4(bitmap: np.ndarray) -> bytes:
    """T.6 encode of a (rows, cols) {0,1} bitmap (1 = black), EOFB
    terminated. The decoder twin for the roundtrip property tests."""
    bitmap = np.asarray(bitmap)
    if bitmap.ndim != 2:
        raise ValueError("bitmap must be 2-D")
    h, cols = bitmap.shape
    w = _BitWriter()
    ref: List[int] = [cols, cols]
    for y in range(h):
        cur = _transitions(bitmap[y])
        _encode_2d_row(w, cur, ref, cols)
        ref = cur + [cols, cols]
    w.write(_EOL)
    w.write(_EOL)
    return w.flush()


def encode_g3_1d(bitmap: np.ndarray, eol: bool = True) -> bytes:
    """T.4 1-D encode (K=0), optional per-row EOLs."""
    bitmap = np.asarray(bitmap)
    h, cols = bitmap.shape
    w = _BitWriter()
    for y in range(h):
        if eol:
            w.write(_EOL)
        _encode_1d_row(w, _transitions(bitmap[y]), cols)
    return w.flush()


def encode_g3_2d(
    bitmap: np.ndarray, k: int = 2, byte_align: bool = False
) -> bytes:
    """T.4 mixed 2-D encode (K>0): every row framed ``EOL + tag``; the
    first row of each K-row group is 1-D, the rest 2-D against the
    previous row. RTC-free (PDF CCITTFaxDecode relies on the row
    count). ``byte_align`` zero-fills so each EOL starts a byte."""
    bitmap = np.asarray(bitmap)
    if bitmap.ndim != 2:
        raise ValueError("bitmap must be 2-D")
    if k < 1:
        raise ValueError("k must be >= 1 for G3 2-D")
    h, cols = bitmap.shape
    w = _BitWriter()
    ref: List[int] = [cols, cols]
    for y in range(h):
        if byte_align:
            w.pad_align()
        one_d = (y % k) == 0
        w.write(_EOL)
        w.write("1" if one_d else "0")
        cur = _transitions(bitmap[y])
        if one_d:
            _encode_1d_row(w, cur, cols)
        else:
            _encode_2d_row(w, cur, ref, cols)
        ref = cur + [cols, cols]
    return w.flush()
