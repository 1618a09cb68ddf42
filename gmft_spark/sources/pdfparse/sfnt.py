"""TrueType (sfnt) font-program parser: glyph bboxes, advances, cmap.

From-scratch implementation of the subset of the public OpenType/TrueType
specification needed for text geometry: ``head`` (unitsPerEm,
indexToLocFormat), ``maxp`` (numGlyphs), ``loca``/``glyf`` (per-glyph
bounding boxes straight from the glyph header), ``hhea``/``hmtx``
(advance widths), and ``cmap`` (formats 0, 4, 6, 12).

All metrics are returned in font units; callers scale by
``1000 / units_per_em`` to get the text-space em-1000 units used by PDF.
"""

from __future__ import annotations

import struct
from typing import Dict, Optional, Tuple


_QUAD_STEPS = 6  # quadratic flattening: fixed, deterministic


def _flatten_quad_contour(pts):
    """TrueType contour (x, y, on_curve) → flattened polygon. Implied
    on-curve midpoints are inserted between consecutive off-curve points;
    each quadratic (on, off, on) is sampled at _QUAD_STEPS."""
    if not pts:
        return []
    # rotate so the contour starts on-curve (synthesize midpoint if none)
    if not any(on for _x, _y, on in pts):
        mid = (
            (pts[0][0] + pts[-1][0]) / 2.0,
            (pts[0][1] + pts[-1][1]) / 2.0,
            True,
        )
        pts = [mid] + pts
    else:
        k = next(i for i, (_x, _y, on) in enumerate(pts) if on)
        pts = pts[k:] + pts[:k]
    # insert implied on-curve midpoints
    expanded = []
    n = len(pts)
    for i in range(n):
        x, y, on = pts[i]
        expanded.append((x, y, on))
        nx, ny, non = pts[(i + 1) % n]
        if not on and not non:
            expanded.append(((x + nx) / 2.0, (y + ny) / 2.0, True))
    poly = [(expanded[0][0], expanded[0][1])]
    i = 0
    m = len(expanded)
    while i < m:
        x0, y0, _ = expanded[i]
        nxt = expanded[(i + 1) % m]
        if nxt[2]:  # straight segment
            if i + 1 < m:
                poly.append((nxt[0], nxt[1]))
            i += 1
        else:  # quadratic: on, off, on
            cx, cy, _ = nxt
            ex, ey, _ = expanded[(i + 2) % m]
            for k in range(1, _QUAD_STEPS + 1):
                t = k / _QUAD_STEPS
                u = 1.0 - t
                poly.append(
                    (
                        u * u * x0 + 2 * u * t * cx + t * t * ex,
                        u * u * y0 + 2 * u * t * cy + t * t * ey,
                    )
                )
            i += 2
    return poly


class TrueTypeFont:
    def __init__(self, data: bytes):
        self.data = data
        self.tables: Dict[str, Tuple[int, int]] = {}
        self.units_per_em = 1000
        self.num_glyphs = 0
        self._loca: Optional[Tuple[int, ...]] = None
        self._advances: Tuple[int, ...] = ()
        self._cmap: Dict[int, int] = {}
        self._bbox_cache: Dict[int, Optional[Tuple[float, float, float, float]]] = {}
        self._parse()

    def _parse(self) -> None:
        data = self.data
        if len(data) < 12:
            raise ValueError("truncated sfnt")
        tag = data[:4]
        off = 0
        if tag == b"ttcf":  # collection: use first font
            off = struct.unpack_from(">I", data, 12)[0]
            tag = data[off : off + 4]
        (num_tables,) = struct.unpack_from(">H", data, off + 4)
        p = off + 12
        for _ in range(num_tables):
            t, _cs, toff, tlen = struct.unpack_from(">4sIII", data, p)
            p += 16
            self.tables[t.decode("latin-1")] = (toff, tlen)

        head = self._table("head")
        idx_fmt = 0
        if head is not None:
            self.units_per_em = struct.unpack_from(">H", head, 18)[0] or 1000
            idx_fmt = struct.unpack_from(">h", head, 50)[0]
        maxp = self._table("maxp")
        if maxp is not None:
            self.num_glyphs = struct.unpack_from(">H", maxp, 4)[0]

        loca = self._table("loca")
        if loca is not None:
            n = self.num_glyphs + 1
            if idx_fmt == 0:
                vals = struct.unpack_from(f">{min(n, len(loca)//2)}H", loca, 0)
                self._loca = tuple(v * 2 for v in vals)
            else:
                vals = struct.unpack_from(f">{min(n, len(loca)//4)}I", loca, 0)
                self._loca = tuple(vals)

        hhea = self._table("hhea")
        hmtx = self._table("hmtx")
        if hhea is not None and hmtx is not None:
            (n_hm,) = struct.unpack_from(">H", hhea, 34)
            n_hm = min(n_hm, len(hmtx) // 4)
            adv = [
                struct.unpack_from(">H", hmtx, i * 4)[0] for i in range(n_hm)
            ]
            self._advances = tuple(adv)

        cm = self._table("cmap")
        if cm is not None:
            self._parse_cmap(cm)

    def _table(self, name: str) -> Optional[bytes]:
        if name not in self.tables:
            return None
        off, ln = self.tables[name]
        return self.data[off : off + ln]

    # -- cmap -------------------------------------------------------------

    def _parse_cmap(self, cm: bytes) -> None:
        (n,) = struct.unpack_from(">H", cm, 2)
        subtables = []
        for i in range(n):
            pid, eid, off = struct.unpack_from(">HHI", cm, 4 + i * 8)
            subtables.append((pid, eid, off))
        # preference: (3,1) unicode BMP > (0,*) > (3,0) symbol > (1,0) mac
        def rank(t):
            pid, eid, _ = t
            if pid == 3 and eid == 1:
                return 0
            if pid == 0:
                return 1
            if pid == 3 and eid == 10:
                return 2
            if pid == 3 and eid == 0:
                return 3
            return 4

        for pid, eid, off in sorted(subtables, key=rank):
            try:
                table = self._parse_cmap_subtable(cm, off)
            except Exception:
                continue
            if table:
                self._cmap = table
                self.cmap_platform = (pid, eid)
                return
        self.cmap_platform = None

    def _parse_cmap_subtable(self, cm: bytes, off: int) -> Dict[int, int]:
        (fmt,) = struct.unpack_from(">H", cm, off)
        out: Dict[int, int] = {}
        if fmt == 0:
            for code in range(256):
                gid = cm[off + 6 + code]
                if gid:
                    out[code] = gid
        elif fmt == 4:
            (segx2,) = struct.unpack_from(">H", cm, off + 6)
            seg = segx2 // 2
            ends = struct.unpack_from(f">{seg}H", cm, off + 14)
            starts = struct.unpack_from(f">{seg}H", cm, off + 16 + segx2)
            deltas = struct.unpack_from(f">{seg}h", cm, off + 16 + 2 * segx2)
            range_off_pos = off + 16 + 3 * segx2
            range_offs = struct.unpack_from(f">{seg}H", cm, range_off_pos)
            for i in range(seg):
                s, e = starts[i], ends[i]
                if s == 0xFFFF:
                    continue
                for code in range(s, min(e, 0xFFFE) + 1):
                    if range_offs[i] == 0:
                        gid = (code + deltas[i]) & 0xFFFF
                    else:
                        gpos = (
                            range_off_pos
                            + i * 2
                            + range_offs[i]
                            + (code - s) * 2
                        )
                        if gpos + 2 > len(cm):
                            continue
                        (gid,) = struct.unpack_from(">H", cm, gpos)
                        if gid:
                            gid = (gid + deltas[i]) & 0xFFFF
                    if gid:
                        out[code] = gid
        elif fmt == 6:
            first, count = struct.unpack_from(">HH", cm, off + 6)
            gids = struct.unpack_from(f">{count}H", cm, off + 10)
            for i, gid in enumerate(gids):
                if gid:
                    out[first + i] = gid
        elif fmt == 12:
            (ngroups,) = struct.unpack_from(">I", cm, off + 12)
            # hostile-input containment: group ranges are attacker-controlled
            # 32-bit values; clamp to the Unicode range and cap total entries
            # so a crafted font can't spin an executor task / build a
            # multi-GB dict (a corrupt font should degrade, not hang)
            for i in range(min(ngroups, 0x10000)):
                if off + 16 + i * 12 + 12 > len(cm):
                    break
                s, e, g = struct.unpack_from(">III", cm, off + 16 + i * 12)
                if s > 0x10FFFF:
                    continue
                e = min(e, 0x10FFFF)
                for c in range(s, e + 1):
                    out[c] = g + (c - s)
                if len(out) > 0x120000:
                    break
        return out

    # -- public API -------------------------------------------------------

    def gid_for_unicode(self, cp: int) -> Optional[int]:
        g = self._cmap.get(cp)
        if g is None and getattr(self, "cmap_platform", None) == (3, 0):
            # symbol font: codes live at 0xF000+
            g = self._cmap.get(0xF000 + cp)
        return g

    def advance(self, gid: int) -> float:
        """Advance width in font units."""
        if not self._advances:
            return 0.0
        if gid < len(self._advances):
            return float(self._advances[gid])
        return float(self._advances[-1])

    def _glyf_bytes(self, gid: int) -> Optional[bytes]:
        if self._loca is None or not (0 <= gid < len(self._loca) - 1):
            return None
        start, end = self._loca[gid], self._loca[gid + 1]
        if end <= start:
            return None
        glyf = self.tables.get("glyf")
        if glyf is None:
            return None
        goff = glyf[0] + start
        return self.data[goff : glyf[0] + min(end, glyf[1])]

    def glyph_path(
        self, gid: int, _depth: int = 0
    ) -> Optional[list]:
        """Flattened outline contours (lists of (x, y) points, font
        units) — simple glyphs' quadratic splines are sampled at fixed
        steps; composite glyphs recurse with their 2×2 transform +
        offset. [] for a legitimately empty glyph (zero-length glyf
        record: a space — no ink, no fallback); None for invalid gids or
        unparseable outlines."""
        if _depth > 4:
            return None
        if self._loca is None or not (0 <= gid < len(self._loca) - 1):
            return None
        if "glyf" not in self.tables:
            return None
        g = self._glyf_bytes(gid)
        if g is None:
            return []  # zero-length glyf record: blank by declaration
        if len(g) < 10:
            return None
        (nc,) = struct.unpack_from(">h", g, 0)
        if nc < 0:
            return self._composite_path(g, _depth)
        try:
            return self._simple_path(g, nc)
        except (struct.error, IndexError):
            return None

    def _simple_path(self, g: bytes, nc: int) -> Optional[list]:
        ends = struct.unpack_from(f">{nc}H", g, 10)
        n_pts = (ends[-1] + 1) if nc else 0
        if n_pts == 0 or n_pts > 10000:
            return None
        (ilen,) = struct.unpack_from(">H", g, 10 + 2 * nc)
        p = 12 + 2 * nc + ilen
        # flags (with repeat compression)
        flags = []
        while len(flags) < n_pts:
            f = g[p]
            p += 1
            flags.append(f)
            if f & 8:  # REPEAT
                r = g[p]
                p += 1
                flags.extend([f] * r)
        flags = flags[:n_pts]
        xs, x = [], 0
        for f in flags:
            if f & 2:  # x short
                d = g[p]
                p += 1
                x += d if f & 16 else -d
            elif not f & 16:
                (d,) = struct.unpack_from(">h", g, p)
                p += 2
                x += d
            xs.append(x)
        ys, y = [], 0
        for f in flags:
            if f & 4:  # y short
                d = g[p]
                p += 1
                y += d if f & 32 else -d
            elif not f & 32:
                (d,) = struct.unpack_from(">h", g, p)
                p += 2
                y += d
            ys.append(y)
        on = [bool(f & 1) for f in flags]
        contours = []
        start = 0
        for e in ends:
            pts = [
                (float(xs[i]), float(ys[i]), on[i])
                for i in range(start, e + 1)
            ]
            start = e + 1
            poly = _flatten_quad_contour(pts)
            if len(poly) >= 3:
                contours.append(poly)
        return contours or None

    def _composite_path(self, g: bytes, depth: int) -> Optional[list]:
        out = []
        p = 10
        while True:
            flags, comp_gid = struct.unpack_from(">HH", g, p)
            p += 4
            if flags & 1:  # ARG_1_AND_2_ARE_WORDS
                a1, a2 = struct.unpack_from(">hh", g, p)
                p += 4
            else:
                a1, a2 = struct.unpack_from(">bb", g, p)
                p += 2
            sx = sy = 1.0
            s01 = s10 = 0.0
            if flags & 8:  # WE_HAVE_A_SCALE (F2Dot14)
                (s,) = struct.unpack_from(">h", g, p)
                p += 2
                sx = sy = s / 16384.0
            elif flags & 0x40:  # X_AND_Y_SCALE
                v = struct.unpack_from(">hh", g, p)
                p += 4
                sx, sy = v[0] / 16384.0, v[1] / 16384.0
            elif flags & 0x80:  # 2x2
                v = struct.unpack_from(">hhhh", g, p)
                p += 8
                sx, s01, s10, sy = (x / 16384.0 for x in v)
            dx, dy = (float(a1), float(a2)) if flags & 2 else (0.0, 0.0)
            sub = self.glyph_path(comp_gid, depth + 1)
            if sub:
                out.extend(
                    [
                        (x * sx + y * s10 + dx, x * s01 + y * sy + dy)
                        for x, y in c
                    ]
                    for c in sub
                )
            if not flags & 0x20:  # MORE_COMPONENTS
                break
        return out or None

    def glyph_bbox(self, gid: int) -> Optional[Tuple[float, float, float, float]]:
        """(xmin, ymin, xmax, ymax) in font units; None for empty glyphs."""
        if gid in self._bbox_cache:
            return self._bbox_cache[gid]
        box = None
        if self._loca is not None and 0 <= gid < len(self._loca) - 1:
            start, end = self._loca[gid], self._loca[gid + 1]
            if end > start:
                glyf = self.tables.get("glyf")
                if glyf is not None:
                    goff = glyf[0] + start
                    if goff + 10 <= len(self.data):
                        _nc, x0, y0, x1, y1 = struct.unpack_from(
                            ">hhhhh", self.data, goff
                        )
                        box = (float(x0), float(y0), float(x1), float(y1))
        self._bbox_cache[gid] = box
        return box
