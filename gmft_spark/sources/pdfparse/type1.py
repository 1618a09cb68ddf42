"""Original Adobe Type 1 font parser (eexec + Type 1 charstrings).

From-scratch implementation of the public "Adobe Type 1 Font Format"
specification: decrypts the eexec section, reads the built-in
``/Encoding``, ``/Subrs`` and ``/CharStrings``, and interprets Type 1
charstrings to recover per-glyph control boxes and advance widths
(including flex via the OtherSubrs protocol and ``seac`` composition).

Charstring units are in the font's glyph space; ``font_matrix`` scales
to text space (usually 0.001 → em-1000).
"""

from __future__ import annotations

import re
import struct
from typing import Dict, List, Optional, Tuple

from gmft_spark.sources.pdfparse.encodings import STANDARD_ENCODING

_EEXEC_R = 55665
_CHAR_R = 4330
_C1, _C2 = 52845, 22719


def _decrypt(data: bytes, r: int, skip: int) -> bytes:
    out = bytearray()
    for b in data:
        out.append(b ^ (r >> 8))
        r = ((b + r) * _C1 + _C2) & 0xFFFF
    return bytes(out[skip:])


class _T1Run:
    __slots__ = ("x", "y", "xmin", "ymin", "xmax", "ymax", "any", "width",
                 "sbx", "ps")

    def __init__(self):
        self.x = 0.0
        self.y = 0.0
        self.xmin = self.ymin = float("inf")
        self.xmax = self.ymax = float("-inf")
        self.any = False
        self.width = 0.0
        self.sbx = 0.0
        self.ps: List[float] = []  # OtherSubrs communication stack

    def add(self, x: float, y: float) -> None:
        if x < self.xmin:
            self.xmin = x
        if x > self.xmax:
            self.xmax = x
        if y < self.ymin:
            self.ymin = y
        if y > self.ymax:
            self.ymax = y
        self.any = True

    def move(self, dx: float, dy: float, mark: bool = True) -> None:
        self.x += dx
        self.y += dy
        if mark:
            self.add(self.x, self.y)

    # lineto: identical arithmetic for the bbox run; the path run
    # overrides it to extend the current contour instead of starting one
    line = move

    def flexpoint(self, dx: float, dy: float) -> None:
        """A flex-sequence rmoveto (collected control/interpolation
        point). Bbox semantics: same pen update + mark as always."""
        self.x += dx
        self.y += dy
        self.add(self.x, self.y)

    def curve(self, d: Tuple[float, ...]) -> None:
        x1 = self.x + d[0]
        y1 = self.y + d[1]
        x2 = x1 + d[2]
        y2 = y1 + d[3]
        self.x = x2 + d[4]
        self.y = y2 + d[5]
        self.add(x1, y1)
        self.add(x2, y2)
        self.add(self.x, self.y)


class _T1PathRun(_T1Run):
    """_T1Run that also records flattened contours (see cff._PathRun —
    same hook discipline: base-class pen/bbox arithmetic untouched).
    Flex points are appended as line points: flex exists precisely for
    nearly-straight curves, so the collected control points ARE the
    flattening."""

    __slots__ = ("contours",)

    def __init__(self):
        super().__init__()
        self.contours: List[List[Tuple[float, float]]] = []

    def move(self, dx: float, dy: float, mark: bool = True) -> None:
        super().move(dx, dy, mark)
        self.contours.append([(self.x, self.y)])

    def line(self, dx: float, dy: float) -> None:
        _T1Run.move(self, dx, dy)
        if not self.contours:
            self.contours.append([])
        self.contours[-1].append((self.x, self.y))

    def flexpoint(self, dx: float, dy: float) -> None:
        super().flexpoint(dx, dy)
        if not self.contours:
            self.contours.append([])
        self.contours[-1].append((self.x, self.y))

    def curve(self, d: Tuple[float, ...]) -> None:
        from gmft_spark.sources.pdfparse.cff import _CURVE_STEPS

        x0, y0 = self.x, self.y
        x1 = x0 + d[0]
        y1 = y0 + d[1]
        x2 = x1 + d[2]
        y2 = y1 + d[3]
        x3 = x2 + d[4]
        y3 = y2 + d[5]
        super().curve(d)
        if not self.contours:
            self.contours.append([(x0, y0)])
        pts = self.contours[-1]
        for k in range(1, _CURVE_STEPS + 1):
            t = k / _CURVE_STEPS
            u = 1.0 - t
            pts.append(
                (
                    u * u * u * x0 + 3 * u * u * t * x1
                    + 3 * u * t * t * x2 + t * t * t * x3,
                    u * u * u * y0 + 3 * u * u * t * y1
                    + 3 * u * t * t * y2 + t * t * t * y3,
                )
            )


class Type1Font:
    def __init__(self, data: bytes, length1: Optional[int] = None):
        # PFB segments?
        if data[:1] == b"\x80":
            data = self._join_pfb(data)
        idx = data.find(b"eexec")
        clear = data[: idx if idx >= 0 else len(data)]
        self.encoding: Dict[int, str] = self._parse_encoding(clear)
        self.font_matrix = self._parse_matrix(clear)

        enc_part = data[idx + 5 :] if idx >= 0 else b""
        # skip whitespace after 'eexec'
        enc_part = enc_part.lstrip(b"\r\n\t ")
        # hex form? (all leading bytes hex digits)
        head = enc_part[:4]
        if all(c in b"0123456789abcdefABCDEF" for c in head):
            hex_bytes = bytes(
                c for c in enc_part if c in b"0123456789abcdefABCDEF"
            )
            try:
                enc_part = bytes.fromhex(hex_bytes.decode("ascii"))
            except ValueError:
                pass
        private = _decrypt(enc_part, _EEXEC_R, 4)

        m = re.search(rb"/lenIV\s+(\d+)", private)
        self.len_iv = int(m.group(1)) if m else 4
        self.subrs = self._parse_subrs(private)
        self.charstrings = self._parse_charstrings(private)
        self._cache: Dict[str, Optional[Tuple[float, float, float, float, float]]] = {}

    @staticmethod
    def _join_pfb(data: bytes) -> bytes:
        out = bytearray()
        pos = 0
        while pos + 6 <= len(data) and data[pos] == 0x80:
            t = data[pos + 1]
            if t == 3:
                break
            (n,) = struct.unpack_from("<I", data, pos + 2)
            out += data[pos + 6 : pos + 6 + n]
            pos += 6 + n
        return bytes(out)

    @staticmethod
    def _parse_matrix(clear: bytes):
        m = re.search(rb"/FontMatrix\s*\[([^\]]*)\]", clear)
        if m:
            try:
                vals = [float(v) for v in m.group(1).split()]
                if len(vals) == 6:
                    return tuple(vals)
            except ValueError:
                pass
        return (0.001, 0.0, 0.0, 0.001, 0.0, 0.0)

    @staticmethod
    def _parse_encoding(clear: bytes) -> Dict[int, str]:
        if re.search(rb"/Encoding\s+StandardEncoding", clear):
            return dict(STANDARD_ENCODING)
        out: Dict[int, str] = {}
        for m in re.finditer(rb"dup\s+(\d+)\s*/([^\s/]+)\s+put", clear):
            try:
                out[int(m.group(1))] = m.group(2).decode("latin-1")
            except ValueError:
                continue
        return out or dict(STANDARD_ENCODING)

    def _parse_subrs(self, private: bytes) -> List[bytes]:
        subrs: List[bytes] = []
        m = re.search(rb"/Subrs\s+(\d+)", private)
        if not m:
            return subrs
        count = int(m.group(1))
        pos = m.end()
        pat = re.compile(rb"dup\s+(\d+)\s+(\d+)\s+(RD|-\|)[ ]")
        subrs = [b""] * count
        for _ in range(count):
            mm = pat.search(private, pos)
            if not mm:
                break
            idx, n = int(mm.group(1)), int(mm.group(2))
            start = mm.end()
            if 0 <= idx < count:
                subrs[idx] = _decrypt(
                    private[start : start + n], _CHAR_R, self.len_iv
                )
            pos = start + n
        return subrs

    def _parse_charstrings(self, private: bytes) -> Dict[str, bytes]:
        out: Dict[str, bytes] = {}
        m = re.search(rb"/CharStrings\s+(\d+)", private)
        if not m:
            return out
        pos = m.end()
        pat = re.compile(rb"/([^\s/{}()\[\]]+)\s+(\d+)\s+(RD|-\|)[ ]")
        while True:
            mm = pat.search(private, pos)
            if not mm:
                break
            name = mm.group(1).decode("latin-1")
            n = int(mm.group(2))
            start = mm.end()
            out[name] = _decrypt(
                private[start : start + n], _CHAR_R, self.len_iv
            )
            pos = start + n
        return out

    # -- interpretation ---------------------------------------------------

    def _exec(self, code: bytes, run: _T1Run, depth: int) -> bool:
        if depth > 10:
            return True
        st: List[float] = []
        i = 0
        n = len(code)
        flex_pts: Optional[List[float]] = None
        while i < n:
            b0 = code[i]
            if b0 >= 32:
                if b0 <= 246:
                    st.append(b0 - 139)
                    i += 1
                elif b0 <= 250:
                    st.append((b0 - 247) * 256 + code[i + 1] + 108)
                    i += 2
                elif b0 <= 254:
                    st.append(-(b0 - 251) * 256 - code[i + 1] - 108)
                    i += 2
                else:
                    st.append(struct.unpack_from(">i", code, i + 1)[0])
                    i += 5
                continue
            i += 1
            if b0 == 13:  # hsbw: sbx wx
                if len(st) >= 2:
                    run.sbx = st[0]
                    run.width = st[1]
                    run.x = st[0]
                    run.y = 0.0
                st.clear()
            elif b0 == 21:  # rmoveto
                if len(st) >= 2:
                    if flex_pts is not None:
                        run.flexpoint(st[-2], st[-1])
                        flex_pts.extend((run.x, run.y))
                    else:
                        run.move(st[-2], st[-1])
                st.clear()
            elif b0 == 22:  # hmoveto
                if st:
                    run.move(st[-1], 0.0)
                st.clear()
            elif b0 == 4:  # vmoveto
                if st:
                    run.move(0.0, st[-1])
                st.clear()
            elif b0 == 5:  # rlineto
                if len(st) >= 2:
                    run.line(st[-2], st[-1])
                st.clear()
            elif b0 == 6:  # hlineto
                if st:
                    run.line(st[-1], 0.0)
                st.clear()
            elif b0 == 7:  # vlineto
                if st:
                    run.line(0.0, st[-1])
                st.clear()
            elif b0 == 8:  # rrcurveto
                if len(st) >= 6:
                    run.curve(tuple(st[-6:]))
                st.clear()
            elif b0 == 30:  # vhcurveto
                if len(st) >= 4:
                    run.curve((0.0, st[-4], st[-3], st[-2], st[-1], 0.0))
                st.clear()
            elif b0 == 31:  # hvcurveto
                if len(st) >= 4:
                    run.curve((st[-4], 0.0, st[-3], st[-2], 0.0, st[-1]))
                st.clear()
            elif b0 == 1 or b0 == 3:  # hstem / vstem
                st.clear()
            elif b0 == 9:  # closepath
                st.clear()
            elif b0 == 10:  # callsubr
                if st:
                    idx = int(st.pop())
                    if 0 <= idx < len(self.subrs):
                        if self._exec(self.subrs[idx], run, depth + 1):
                            return True
            elif b0 == 11:  # return
                return False
            elif b0 == 14:  # endchar
                return True
            elif b0 == 12:
                b1 = code[i]
                i += 1
                if b1 == 12:  # div
                    if len(st) >= 2:
                        b = st.pop()
                        a = st.pop()
                        st.append(a / b if b else 0.0)
                elif b1 == 6:  # seac: asb adx ady bchar achar
                    if len(st) >= 5:
                        asb, adx, ady, bchar, achar = st[-5:]
                        self._seac(run, asb, adx, ady, int(bchar), int(achar))
                    st.clear()
                    return True
                elif b1 == 7:  # sbw
                    if len(st) >= 4:
                        run.sbx = st[0]
                        run.width = st[2]
                        run.x = st[0]
                        run.y = st[1]
                    st.clear()
                elif b1 == 16:  # callothersubr
                    if len(st) >= 2:
                        othersubr = int(st.pop())
                        count = int(st.pop())
                        args = st[-count:] if count else []
                        del st[len(st) - count :]
                        if othersubr == 1:  # flex start
                            flex_pts = []
                        elif othersubr == 0:  # flex end
                            run.ps = [run.y, run.x]
                            flex_pts = None
                        elif othersubr == 3:  # hint replacement
                            run.ps = [3.0]
                        else:
                            run.ps = list(reversed(args))
                elif b1 == 17:  # pop
                    st.append(run.ps.pop() if run.ps else 0.0)
                elif b1 == 33:  # setcurrentpoint
                    if len(st) >= 2:
                        run.x = st[-2]
                        run.y = st[-1]
                    st.clear()
                else:
                    st.clear()
            else:
                st.clear()
        return False

    def _seac(
        self, run: _T1Run, asb, adx, ady, bchar: int, achar: int
    ) -> None:
        is_path = isinstance(run, _T1PathRun)
        for char, dx, dy in (
            (bchar, 0.0, 0.0),
            (achar, run.sbx - asb + adx, ady),
        ):
            name = STANDARD_ENCODING.get(char)
            if not name:
                continue
            sub = self._metrics(name)
            if sub is not None:
                x0, y0, x1, y1, _w = sub
                run.add(x0 + dx, y0 + dy)
                run.add(x1 + dx, y1 + dy)
            if is_path:
                cs = self.charstrings.get(name)
                if cs is None:
                    continue
                comp = _T1PathRun()
                try:
                    self._exec(cs, comp, 0)
                except Exception:
                    continue
                run.contours.extend(
                    [(x + dx, y + dy) for x, y in c] for c in comp.contours
                )

    def _metrics(self, name: str):
        if name in self._cache:
            return self._cache[name]
        cs = self.charstrings.get(name)
        out = None
        if cs is not None:
            run = _T1Run()
            try:
                self._exec(cs, run, 0)
                if run.any:
                    out = (run.xmin, run.ymin, run.xmax, run.ymax, run.width)
                else:
                    out = (0.0, 0.0, 0.0, 0.0, run.width)
            except Exception:
                out = None
        self._cache[name] = out
        return out

    # -- public API (name-keyed) -----------------------------------------

    def has_glyph(self, name: str) -> bool:
        return name in self.charstrings

    def glyph_path_by_name(
        self, name: str
    ) -> Optional[List[List[Tuple[float, float]]]]:
        """Flattened outline contours in charstring units; [] for an
        executed-but-blank glyph, None when the charstring is absent or
        fails. Not cached (see cff.CFFFont.glyph_path)."""
        cs = self.charstrings.get(name)
        if cs is None:
            return None
        run = _T1PathRun()
        try:
            self._exec(cs, run, 0)
        except Exception:
            return None
        return [c for c in run.contours if len(c) >= 3]

    def glyph_bbox_by_name(
        self, name: str
    ) -> Optional[Tuple[float, float, float, float]]:
        m = self._metrics(name)
        if m is None or (m[0] == m[2] and m[1] == m[3]):
            return None
        return (m[0], m[1], m[2], m[3])

    def advance_by_name(self, name: str) -> float:
        m = self._metrics(name)
        return m[4] if m is not None else 0.0
