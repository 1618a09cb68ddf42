"""CFF (Compact Font Format / "Type1C") parser with a Type 2 charstring
interpreter that computes per-glyph control boxes and advance widths.

From-scratch implementation of the public Adobe Type 2 Charstring Format
and CFF specifications. The bounding box returned is the *control box*
(envelope of all on-curve and control points), which matches what
FreeType reports for unhinted outlines — and hence what pdfium uses for
its character boxes.

Supports: name/top-dict/string/charstring INDEXes, charsets (formats
0/1/2), private-dict local subrs, global subrs, subr biasing, all path
construction operators incl. flex variants, ``endchar`` accent
composition (seac), and CID-keyed fonts (FDArray/FDSelect formats 0/3).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

from gmft_spark.sources.pdfparse.encodings import CFF_STANDARD_STRINGS

# Standard Encoding code -> SID mapping is the identity into the standard
# strings list order for codes defined in StandardEncoding; used for seac.
from gmft_spark.sources.pdfparse.encodings import STANDARD_ENCODING


def _read_index(data: bytes, pos: int) -> Tuple[List[bytes], int]:
    """Read a CFF INDEX; returns (items, next_pos)."""
    if pos + 2 > len(data):
        return [], pos + 2
    (count,) = struct.unpack_from(">H", data, pos)
    pos += 2
    if count == 0:
        return [], pos
    off_size = data[pos]
    pos += 1
    offs = []
    for i in range(count + 1):
        v = 0
        for b in data[pos + i * off_size : pos + (i + 1) * off_size]:
            v = (v << 8) | b
        offs.append(v)
    pos += (count + 1) * off_size
    base = pos - 1
    items = [data[base + offs[i] : base + offs[i + 1]] for i in range(count)]
    return items, base + offs[count]


def _parse_dict(data: bytes) -> Dict[int, List[float]]:
    """Parse a CFF DICT: operator (int, two-byte ops as 1200+x) -> operands."""
    out: Dict[int, List[float]] = {}
    operands: List[float] = []
    i = 0
    n = len(data)
    while i < n:
        b0 = data[i]
        if b0 <= 21:  # operator
            if b0 == 12:
                op = 1200 + data[i + 1]
                i += 2
            else:
                op = b0
                i += 1
            out[op] = operands
            operands = []
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        elif b0 == 28:
            operands.append(struct.unpack_from(">h", data, i + 1)[0])
            i += 3
        elif b0 == 29:
            operands.append(struct.unpack_from(">i", data, i + 1)[0])
            i += 5
        elif b0 == 30:  # real number (BCD)
            s = ""
            i += 1
            done = False
            while i < n and not done:
                byte = data[i]
                i += 1
                for nib in (byte >> 4, byte & 0xF):
                    if nib <= 9:
                        s += str(nib)
                    elif nib == 0xA:
                        s += "."
                    elif nib == 0xB:
                        s += "E"
                    elif nib == 0xC:
                        s += "E-"
                    elif nib == 0xE:
                        s += "-"
                    elif nib == 0xF:
                        done = True
                        break
            try:
                operands.append(float(s) if s else 0.0)
            except ValueError:
                operands.append(0.0)
        else:
            i += 1  # reserved
    return out


def _bias(n: int) -> int:
    return 107 if n < 1240 else (1131 if n < 33900 else 32768)


class _GlyphRun:
    """Accumulates points for one glyph interpretation."""

    __slots__ = (
        "x", "y", "xmin", "ymin", "xmax", "ymax", "any", "width", "nstems",
        "_stack",
    )

    def __init__(self):
        self.x = 0.0
        self.y = 0.0
        self.xmin = self.ymin = float("inf")
        self.xmax = self.ymax = float("-inf")
        self.any = False
        self.width: Optional[float] = None
        self.nstems = 0

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

    def moveto(self, dx: float, dy: float) -> None:
        self.x += dx
        self.y += dy
        self.add(self.x, self.y)

    def lineto(self, dx: float, dy: float) -> None:
        self.x += dx
        self.y += dy
        self.add(self.x, self.y)

    def curveto(self, d: Tuple[float, ...]) -> None:
        x1 = self.x + d[0]
        y1 = self.y + d[1]
        x2 = x1 + d[2]
        y2 = y1 + d[3]
        self.x = x2 + d[4]
        self.y = y2 + d[5]
        self.add(x1, y1)
        self.add(x2, y2)
        self.add(self.x, self.y)


_CURVE_STEPS = 8  # cubic flattening: fixed, deterministic segment count


class _PathRun(_GlyphRun):
    """A _GlyphRun that ALSO records the outline as flattened contours
    (lists of (x, y) points). The executor calls the same
    moveto/lineto/curveto hooks, so pen position, width and bbox
    arithmetic stay bit-identical to the bbox-only run — this subclass
    only appends points."""

    __slots__ = ("contours",)

    def __init__(self):
        super().__init__()
        self.contours: List[List[Tuple[float, float]]] = []

    def moveto(self, dx: float, dy: float) -> None:
        super().moveto(dx, dy)
        self.contours.append([(self.x, self.y)])

    def lineto(self, dx: float, dy: float) -> None:
        super().lineto(dx, dy)
        if not self.contours:
            self.contours.append([])
        self.contours[-1].append((self.x, self.y))

    def curveto(self, d: Tuple[float, ...]) -> None:
        x0, y0 = self.x, self.y
        x1 = x0 + d[0]
        y1 = y0 + d[1]
        x2 = x1 + d[2]
        y2 = y1 + d[3]
        x3 = x2 + d[4]
        y3 = y2 + d[5]
        super().curveto(d)  # identical pen/bbox updates
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


class CFFFont:
    def __init__(self, data: bytes):
        self.data = data
        hdr_size = data[2]
        pos = hdr_size
        _names, pos = _read_index(data, pos)
        top_dicts, pos = _read_index(data, pos)
        self.strings, pos = _read_index(data, pos)
        self.gsubrs, pos = _read_index(data, pos)
        self.top = _parse_dict(top_dicts[0]) if top_dicts else {}

        cs_off = int(self.top.get(17, [0])[0])
        self.charstrings, _ = _read_index(data, cs_off) if cs_off else ([], 0)
        self.num_glyphs = len(self.charstrings)

        # CID-keyed?
        self.is_cid = 1230 in self.top  # ROS operator
        self._fd_privates: List[Tuple[float, float, List[bytes]]] = []
        self._fd_select: Optional[List[int]] = None
        if self.is_cid:
            self._load_cid_parts()
        else:
            self._default_private = self._load_private(self.top.get(18))

        self.charset: List[int] = self._load_charset()
        self._name_to_gid: Optional[Dict[str, int]] = None
        self._bbox_cache: Dict[int, Optional[Tuple[float, float, float, float]]] = {}
        self._width_cache: Dict[int, float] = {}

    # -- structure loading ------------------------------------------------

    def _load_private(self, entry) -> Tuple[float, float, List[bytes]]:
        """Returns (defaultWidthX, nominalWidthX, local_subrs)."""
        if not entry or len(entry) < 2:
            return (0.0, 0.0, [])
        size, off = int(entry[0]), int(entry[1])
        pd = _parse_dict(self.data[off : off + size])
        dwx = float(pd.get(20, [0.0])[0])
        nwx = float(pd.get(21, [0.0])[0])
        subrs: List[bytes] = []
        if 19 in pd:
            soff = off + int(pd[19][0])
            subrs, _ = _read_index(self.data, soff)
        return (dwx, nwx, subrs)

    def _load_cid_parts(self) -> None:
        fdarray_off = int(self.top.get(1236, [0])[0])
        fd_dicts, _ = _read_index(self.data, fdarray_off) if fdarray_off else ([], 0)
        for fd in fd_dicts:
            d = _parse_dict(fd)
            self._fd_privates.append(self._load_private(d.get(18)))
        if not self._fd_privates:
            self._fd_privates = [(0.0, 0.0, [])]
        self._default_private = self._fd_privates[0]
        fdsel_off = int(self.top.get(1237, [0])[0])
        sel = [0] * self.num_glyphs
        if fdsel_off:
            data = self.data
            fmt = data[fdsel_off]
            if fmt == 0:
                for g in range(self.num_glyphs):
                    sel[g] = data[fdsel_off + 1 + g]
            elif fmt == 3:
                (nranges,) = struct.unpack_from(">H", data, fdsel_off + 1)
                p = fdsel_off + 3
                ranges = []
                for _ in range(nranges):
                    first, fd = struct.unpack_from(">HB", data, p)
                    ranges.append((first, fd))
                    p += 3
                (sentinel,) = struct.unpack_from(">H", data, p)
                for i, (first, fd) in enumerate(ranges):
                    end = ranges[i + 1][0] if i + 1 < nranges else sentinel
                    for g in range(first, min(end, self.num_glyphs)):
                        sel[g] = fd
        self._fd_select = sel

    def _load_charset(self) -> List[int]:
        """GID -> SID (or CID for CID fonts)."""
        n = self.num_glyphs
        if n == 0:
            return []
        off = int(self.top.get(15, [0])[0])
        if off == 0:  # ISOAdobe: identity SIDs
            return list(range(n))
        if off in (1, 2):  # Expert charsets — approximate with identity
            return list(range(n))
        data = self.data
        fmt = data[off]
        out = [0]
        p = off + 1
        if fmt == 0:
            for _ in range(n - 1):
                out.append(struct.unpack_from(">H", data, p)[0])
                p += 2
        elif fmt in (1, 2):
            step = 3 if fmt == 1 else 4
            while len(out) < n:
                first = struct.unpack_from(">H", data, p)[0]
                if fmt == 1:
                    nleft = data[p + 2]
                else:
                    nleft = struct.unpack_from(">H", data, p + 2)[0]
                p += step
                for k in range(nleft + 1):
                    if len(out) >= n:
                        break
                    out.append(first + k)
        return out

    def sid_to_name(self, sid: int) -> str:
        if sid < len(CFF_STANDARD_STRINGS):
            return CFF_STANDARD_STRINGS[sid]
        idx = sid - len(CFF_STANDARD_STRINGS)
        if 0 <= idx < len(self.strings):
            return self.strings[idx].decode("latin-1", "replace")
        return ""

    def name_to_gid(self, name: str) -> Optional[int]:
        if self.is_cid:
            return None
        if self._name_to_gid is None:
            self._name_to_gid = {}
            for gid, sid in enumerate(self.charset):
                self._name_to_gid.setdefault(self.sid_to_name(sid), gid)
        return self._name_to_gid.get(name)

    def cid_to_gid(self, cid: int) -> Optional[int]:
        """For CID-keyed fonts the charset maps GID -> CID; invert."""
        if not self.is_cid:
            return cid if cid < self.num_glyphs else None
        if not hasattr(self, "_cid_to_gid"):
            self._cid_to_gid = {cid: gid for gid, cid in enumerate(self.charset)}
        return self._cid_to_gid.get(cid)

    # -- charstring interpretation ---------------------------------------

    def _private_for_gid(self, gid: int) -> Tuple[float, float, List[bytes]]:
        if self._fd_select is not None and gid < len(self._fd_select):
            return self._fd_privates[self._fd_select[gid]]
        return self._default_private

    def _interp(self, gid: int, run_cls=_GlyphRun) -> Optional[_GlyphRun]:
        if not (0 <= gid < self.num_glyphs):
            return None
        dwx, nwx, lsubrs = self._private_for_gid(gid)
        run = run_cls()
        run.width = None
        try:
            self._exec(self.charstrings[gid], run, lsubrs, 0)
        except Exception:
            return None
        if run.width is None:
            run.width = dwx
        else:
            run.width = nwx + run.width
        return run

    def _exec(
        self, code: bytes, run: _GlyphRun, lsubrs: List[bytes], depth: int
    ) -> bool:
        """Execute one charstring; returns True if endchar was hit."""
        if depth > 10:
            return True
        st: List[float] = getattr(run, "_stack", None)
        if st is None:
            st = []
        run._stack = st  # type: ignore[attr-defined]
        i = 0
        n = len(code)
        while i < n:
            b0 = code[i]
            if b0 >= 32 or b0 == 28:
                if b0 == 28:
                    st.append(struct.unpack_from(">h", code, i + 1)[0])
                    i += 3
                elif b0 <= 246:
                    st.append(b0 - 139)
                    i += 1
                elif b0 <= 250:
                    st.append((b0 - 247) * 256 + code[i + 1] + 108)
                    i += 2
                elif b0 <= 254:
                    st.append(-(b0 - 251) * 256 - code[i + 1] - 108)
                    i += 2
                else:  # 255: 16.16 fixed
                    st.append(struct.unpack_from(">i", code, i + 1)[0] / 65536.0)
                    i += 5
                continue
            i += 1
            if b0 in (1, 3, 18, 23):  # h/vstem(hm)
                if run.width is None and len(st) % 2 == 1:
                    run.width = st[0]
                    st.pop(0)
                run.nstems += len(st) // 2
                st.clear()
            elif b0 in (19, 20):  # hintmask / cntrmask
                if run.width is None and len(st) % 2 == 1:
                    run.width = st[0]
                    st.pop(0)
                run.nstems += len(st) // 2
                st.clear()
                i += (run.nstems + 7) // 8
            elif b0 == 21:  # rmoveto
                if run.width is None and len(st) > 2:
                    run.width = st[0]
                    st.pop(0)
                if len(st) >= 2:
                    run.moveto(st[-2], st[-1])
                st.clear()
            elif b0 == 22:  # hmoveto
                if run.width is None and len(st) > 1:
                    run.width = st[0]
                    st.pop(0)
                if st:
                    run.moveto(st[-1], 0.0)
                st.clear()
            elif b0 == 4:  # vmoveto
                if run.width is None and len(st) > 1:
                    run.width = st[0]
                    st.pop(0)
                if st:
                    run.moveto(0.0, st[-1])
                st.clear()
            elif b0 == 5:  # rlineto
                for k in range(0, len(st) - 1, 2):
                    run.lineto(st[k], st[k + 1])
                st.clear()
            elif b0 == 6 or b0 == 7:  # hlineto / vlineto
                horiz = b0 == 6
                for v in st:
                    if horiz:
                        run.lineto(v, 0.0)
                    else:
                        run.lineto(0.0, v)
                    horiz = not horiz
                st.clear()
            elif b0 == 8:  # rrcurveto
                for k in range(0, len(st) - 5, 6):
                    run.curveto(tuple(st[k : k + 6]))
                st.clear()
            elif b0 == 24:  # rcurveline
                k = 0
                while len(st) - k >= 8:
                    run.curveto(tuple(st[k : k + 6]))
                    k += 6
                if len(st) - k >= 2:
                    run.lineto(st[k], st[k + 1])
                st.clear()
            elif b0 == 25:  # rlinecurve
                k = 0
                while len(st) - k >= 8:
                    run.lineto(st[k], st[k + 1])
                    k += 2
                if len(st) - k >= 6:
                    run.curveto(tuple(st[k : k + 6]))
                st.clear()
            elif b0 == 26 or b0 == 27:  # vvcurveto / hhcurveto
                k = 0
                d1 = 0.0
                if len(st) % 4 == 1:
                    d1 = st[0]
                    k = 1
                while len(st) - k >= 4:
                    a, b, c, d = st[k : k + 4]
                    if b0 == 26:
                        run.curveto((d1, a, b, c, 0.0, d))
                    else:
                        run.curveto((a, d1, b, c, d, 0.0))
                    d1 = 0.0
                    k += 4
                st.clear()
            elif b0 == 30 or b0 == 31:  # vhcurveto / hvcurveto
                horiz = b0 == 31
                k = 0
                while len(st) - k >= 4:
                    last = len(st) - k == 5
                    a, b, c, d = st[k : k + 4]
                    e = st[k + 4] if last else 0.0
                    if horiz:
                        run.curveto((a, 0.0, b, c, e if last else 0.0, d))
                    else:
                        run.curveto((0.0, a, b, c, d, e if last else 0.0))
                    horiz = not horiz
                    k += 4
                st.clear()
            elif b0 == 10:  # callsubr
                if st:
                    idx = int(st.pop()) + _bias(len(lsubrs))
                    if 0 <= idx < len(lsubrs):
                        if self._exec(lsubrs[idx], run, lsubrs, depth + 1):
                            return True
            elif b0 == 29:  # callgsubr
                if st:
                    idx = int(st.pop()) + _bias(len(self.gsubrs))
                    if 0 <= idx < len(self.gsubrs):
                        if self._exec(self.gsubrs[idx], run, lsubrs, depth + 1):
                            return True
            elif b0 == 11:  # return
                return False
            elif b0 == 14:  # endchar
                if run.width is None and len(st) in (1, 5):
                    run.width = st[0]
                    st.pop(0)
                if len(st) >= 4:  # seac accent composition
                    adx, ady, bchar, achar = st[-4:]
                    self._seac(run, adx, ady, int(bchar), int(achar))
                st.clear()
                return True
            elif b0 == 12:
                b1 = code[i]
                i += 1
                if b1 == 35:  # flex
                    if len(st) >= 13:
                        run.curveto(tuple(st[0:6]))
                        run.curveto(tuple(st[6:12]))
                    st.clear()
                elif b1 == 34:  # hflex
                    if len(st) >= 7:
                        y0 = run.y
                        run.curveto((st[0], 0.0, st[1], st[2], st[3], 0.0))
                        run.curveto((st[4], 0.0, st[5], y0 - run.y, st[6], 0.0))
                    st.clear()
                elif b1 == 36:  # hflex1
                    if len(st) >= 9:
                        y0 = run.y
                        run.curveto((st[0], st[1], st[2], st[3], st[4], 0.0))
                        run.curveto(
                            (st[5], 0.0, st[6], st[7], st[8], y0 - run.y - st[7])
                        )
                    st.clear()
                elif b1 == 37:  # flex1
                    if len(st) >= 11:
                        x0, y0 = run.x, run.y
                        dx = sum(st[0:10:2])
                        dy = sum(st[1:10:2])
                        run.curveto(tuple(st[0:6]))
                        # final point: (x0+dx, y0+dy) with d6 chosen on the
                        # dominant axis
                        if abs(dx) > abs(dy):
                            run.curveto(
                                (st[6], st[7], st[8], st[9], st[10],
                                 y0 + dy - (run.y + st[7] + st[9])),
                            )
                        else:
                            run.curveto(
                                (st[6], st[7], st[8], st[9],
                                 x0 + dx - (run.x + st[6] + st[8]), st[10]),
                            )
                    st.clear()
                else:
                    # arithmetic/logic ops unused by real fonts — drop args
                    st.clear()
            else:
                st.clear()
        return False

    def _seac(self, run: _GlyphRun, adx, ady, bchar: int, achar: int) -> None:
        """Accent composition: union of base and accent glyph boxes (path
        runs additionally splice in the components' translated
        contours)."""
        is_path = isinstance(run, _PathRun)
        for char, dx, dy in ((bchar, 0.0, 0.0), (achar, adx, ady)):
            name = STANDARD_ENCODING.get(char)
            if not name:
                continue
            gid = self.name_to_gid(name)
            if gid is None:
                continue
            sub = self._interp(gid, _PathRun if is_path else _GlyphRun)
            if sub is not None and sub.any:
                run.add(sub.xmin + dx, sub.ymin + dy)
                run.add(sub.xmax + dx, sub.ymax + dy)
                if is_path:
                    run.contours.extend(
                        [(x + dx, y + dy) for x, y in c]
                        for c in sub.contours
                    )

    # -- public API -------------------------------------------------------

    def glyph_bbox(self, gid: int) -> Optional[Tuple[float, float, float, float]]:
        """Control box in charstring units (normally em-1000)."""
        if gid in self._bbox_cache:
            return self._bbox_cache[gid]
        run = self._interp(gid)
        box = None
        if run is not None and run.any:
            box = (run.xmin, run.ymin, run.xmax, run.ymax)
        self._bbox_cache[gid] = box
        return box

    def glyph_path(
        self, gid: int
    ) -> Optional[List[List[Tuple[float, float]]]]:
        """Flattened outline contours in charstring units: [] for an
        executed-but-blank glyph (a space — no ink, no fallback), None
        for absent/failed gids. Closing edges are implicit (contour end
        connects to its start, PostScript fill semantics). Not cached:
        callers (glyphrender) cache rendered bitmaps per (font, code,
        size), a strictly smaller object."""
        run = self._interp(gid, _PathRun)
        if run is None:
            return None
        return [c for c in run.contours if len(c) >= 3]

    def advance(self, gid: int) -> float:
        if gid in self._width_cache:
            return self._width_cache[gid]
        run = self._interp(gid)
        w = run.width if run is not None and run.width is not None else 0.0
        self._width_cache[gid] = w
        return w

    def font_matrix(self) -> Tuple[float, float, float, float, float, float]:
        fm = self.top.get(1207)
        if fm and len(fm) == 6:
            return tuple(float(v) for v in fm)  # type: ignore[return-value]
        return (0.001, 0.0, 0.0, 0.001, 0.0, 0.0)
