"""From-scratch WebP-lossless (VP8L) codec — reader + writer twin.

Implements the public VP8L bitstream (RFC 9649): LSB-first bit
packing, canonical prefix codes (simple and code-length-coded forms),
the meta-prefix ("huffman image") groups, the color cache, LZ77
backward references with the 120-entry near-neighbor distance plane
(GENERATED from its ordering rule — sorted by squared offset
distance, then |dx|, positive dx first — and pinned against the
spec's published head entries in tests), and all four transforms:
PREDICTOR (14 modes), COLOR (signed 3.5 fixed-point cross-channel
deltas), SUBTRACT_GREEN, and COLOR_INDEXING (with sub-byte index
packing for palettes <= 16).

The writer emits valid VP8L streams (package-merge length-limited
prefix codes; optional SUBTRACT_GREEN / COLOR / PREDICTOR /
COLOR_INDEXING forward transforms and plane-coded short distances),
so decode(encode(x)) is bit-exact for every mode — the same
encoder-twin evidence model as the other codecs. ANIMATED WebP
(VP8X + ANIM + ANMF framing) decodes with full frame composition
(offsets, dispose-to-background, integer alpha blending) and has its
own writer twin (``encode_webp_anim``). Lossy VP8 ("VP8 " chunks,
still or as animation frames) is the remaining named seam.

Output convention matches the other image codecs: (h, w, 3) uint8 RGB
or (h, w, 4) RGBA when the stream carries meaningful alpha.
Malformed input raises ``ValueError``.
"""

from __future__ import annotations

import heapq
import struct
from typing import List, Optional, Tuple

import numpy as np

__all__ = [
    "decode_webp",
    "decode_webp_frames",
    "encode_webp_lossless",
    "encode_webp_anim",
    "webp_info",
]

_MAX_PIXELS = 64_000_000

# ── distance plane (RFC 9649 §4.2.2: codes 1..120 are near offsets) ──
# (dx, dy) with dy 0..7, dx -7..8, excluding the not-yet-decoded
# half-plane (dy == 0 requires dx > 0), ordered by squared distance,
# then |dx|, positive dx before negative.
_PLANE: List[Tuple[int, int]] = sorted(
    [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if dy > 0 or dx > 0
    ],
    key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0),
)
assert len(_PLANE) == 120

_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


# ── LSB-first bit IO ─────────────────────────────────────────────────


class _Reader:
    __slots__ = ("data", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.bit = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.bit + n
        if (end + 7) // 8 > len(self.data):
            raise ValueError("VP8L bitstream truncated")
        byte0 = self.bit >> 3
        nbytes = ((end + 7) >> 3) - byte0
        window = int.from_bytes(
            self.data[byte0 : byte0 + nbytes], "little"
        )
        val = (window >> (self.bit & 7)) & ((1 << n) - 1)
        self.bit = end
        return val


class _Writer:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.acc |= (val & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


# ── canonical prefix codes ───────────────────────────────────────────


class _Huff:
    """Canonical prefix decoder (DEFLATE-style bit-walk). A code with
    exactly one used symbol decodes with zero bits consumed."""

    __slots__ = ("counts", "symbols", "single")

    def __init__(self, lengths: List[int]):
        max_len = max(lengths) if lengths else 0
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            return
        self.single = None
        # Kraft completeness check
        if sum(1 << (max_len - l) for l, _ in used) != 1 << max_len:
            raise ValueError("incomplete/oversubscribed prefix code")
        used.sort()
        self.counts = [0] * (max_len + 1)
        for l, _ in used:
            self.counts[l] += 1
        self.symbols = [s for _, s in used]

    def read(self, br: _Reader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        first = 0
        index = 0
        for l in range(1, len(self.counts)):
            code |= br.read(1)
            count = self.counts[l]
            if code - first < count:
                return self.symbols[index + code - first]
            index += count
            first = (first + count) << 1
            code <<= 1
        raise ValueError("bad prefix code in VP8L stream")


def _codes_from_lengths(lengths: List[int]) -> List[int]:
    """Canonical code values (MSB-first bit order) per symbol."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for l in lengths:
        if l:
            bl_count[l] += 1
    next_code = [0] * (max_len + 2)
    code = 0
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = [0] * len(lengths)
    for s, l in enumerate(lengths):
        if l:
            out[s] = next_code[l]
            next_code[l] += 1
    return out


def _limited_lengths(freqs: List[int], max_len: int) -> List[int]:
    """Package-merge length-limited prefix code lengths."""
    items = [(f, s) for s, f in enumerate(freqs) if f > 0]
    if not items:
        return [0] * len(freqs)
    if len(items) == 1:
        out = [0] * len(freqs)
        out[items[0][1]] = 1
        return out
    if len(items) > (1 << max_len):
        raise ValueError("alphabet too large for depth limit")
    # package-merge over (weight, {symbol: count}) chains
    level = [(f, {s: 1}) for f, s in items]
    level.sort(key=lambda t: t[0])
    prev = level
    for _ in range(max_len - 1):
        merged = []
        for i in range(0, len(prev) - 1, 2):
            wa, ca = prev[i]
            wb, cb = prev[i + 1]
            cc = dict(ca)
            for k, v in cb.items():
                cc[k] = cc.get(k, 0) + v
            merged.append((wa + wb, cc))
        prev = sorted(
            merged + [(f, {s: 1}) for f, s in items],
            key=lambda t: t[0],
        )
    depth = {s: 0 for _, s in items}
    for _w, cc in prev[: 2 * (len(items) - 1)]:
        for k, v in cc.items():
            depth[k] += v
    out = [0] * len(freqs)
    for s, d in depth.items():
        out[s] = d
    return out


# ── prefix-coded values (lengths and distances) ──────────────────────


def _read_prefixed(br: _Reader, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_of(value: int) -> Tuple[int, int, int]:
    """value (>=1) → (prefix_code, extra_bits, extra_value)."""
    v = value - 1
    if v < 4:
        return v, 0, 0
    code = 4
    while True:
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset <= v < offset + (1 << extra):
            return code, extra, v - offset
        code += 1
        if code >= 40:
            raise ValueError("value out of prefix range")


# ── decoder ──────────────────────────────────────────────────────────


def _read_code_lengths(br: _Reader, alphabet: int) -> List[int]:
    lengths = [0] * alphabet
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        if s0 >= alphabet:
            raise ValueError("simple-code symbol out of range")
        if num_symbols == 1:
            lengths[s0] = 1  # represented as single-symbol (0 bits)
            return lengths
        s1 = br.read(8)
        if s1 >= alphabet:
            raise ValueError("simple-code symbol out of range")
        lengths[s0] = 1
        lengths[s1] = 1
        return lengths
    num_codes = br.read(4) + 4
    if num_codes > len(_CL_ORDER):
        raise ValueError("bad code-length code count")
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl = _Huff(cl_lengths)
    if br.read(1):  # explicit symbol budget
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    symbol = 0
    prev = 8
    while symbol < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl.read(br)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol < alphabet:
                    lengths[symbol] = prev
                    symbol += 1
        elif s == 17:
            symbol += 3 + br.read(3)
        else:
            symbol += 11 + br.read(7)
    if symbol > alphabet:
        raise ValueError("code lengths overflow the alphabet")
    return lengths


class _Group:
    __slots__ = ("green", "red", "blue", "alpha", "dist")

    def __init__(self, br: _Reader, cache_bits: int):
        self.green = _Huff(
            _read_code_lengths(br, 256 + 24 + (1 << cache_bits if cache_bits else 0))
        )
        self.red = _Huff(_read_code_lengths(br, 256))
        self.blue = _Huff(_read_code_lengths(br, 256))
        self.alpha = _Huff(_read_code_lengths(br, 256))
        self.dist = _Huff(_read_code_lengths(br, 40))


def _decode_image(
    br: _Reader, w: int, h: int, level0: bool
) -> Tuple[np.ndarray, List]:
    """Entropy-coded ARGB image → ((h, w, 4) uint8 [a, r, g, b],
    transforms list (level 0 only, in read order))."""
    transforms = []
    if level0:
        seen = set()
        while br.read(1):
            t = br.read(2)
            if t in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(t)
            transforms.append(_read_transform(br, t, w, h))
            if t == 3:  # color indexing shrinks the coded width
                n_colors = transforms[-1][1].shape[0]
                wb = (
                    3 if n_colors <= 2 else
                    2 if n_colors <= 4 else
                    1 if n_colors <= 16 else 0
                )
                w = (w + (1 << wb) - 1) >> wb
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color-cache size")
    # meta prefix groups
    group_map = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.read(1):
        meta_bits = br.read(3) + 2
        gw = (w + (1 << meta_bits) - 1) >> meta_bits
        gh = (h + (1 << meta_bits) - 1) >> meta_bits
        gimg, _ = _decode_image(br, gw, gh, level0=False)
        group_map = (
            gimg[:, :, 1].astype(np.int32) << 8
        ) | gimg[:, :, 2].astype(np.int32)
        n_groups = int(group_map.max()) + 1
    groups = [_Group(br, cache_bits) for _ in range(n_groups)]

    cache = (
        np.zeros(1 << cache_bits, dtype=np.uint32) if cache_bits else None
    )
    n = w * h
    px = np.zeros(n, dtype=np.uint32)
    pos = 0
    while pos < n:
        if group_map is not None:
            y, x = pos // w, pos % w
            g = groups[int(group_map[y >> meta_bits, x >> meta_bits])]
        else:
            g = groups[0]
        s = g.green.read(br)
        if s < 256:  # literal
            red = g.red.read(br)
            blue = g.blue.read(br)
            alpha = g.alpha.read(br)
            val = (
                (alpha << 24) | (red << 16) | (s << 8) | blue
            )
            px[pos] = val
            if cache is not None:
                cache[(0x1E35A7BD * val & 0xFFFFFFFF) >> (32 - cache_bits)] = val
            pos += 1
        elif s < 256 + 24:  # backward reference
            length = _read_prefixed(br, s - 256)
            dcode = _read_prefixed(br, g.dist.read(br))
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _PLANE[dcode - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("backward reference out of window")
            for i in range(length):
                val = int(px[pos - dist])
                px[pos] = val
                if cache is not None:
                    cache[
                        (0x1E35A7BD * val & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = val
                pos += 1
        else:  # color-cache hit
            if cache is None:
                raise ValueError("cache symbol without a color cache")
            idx = s - 256 - 24
            px[pos] = cache[idx]
            pos += 1
    argb = np.zeros((h, w, 4), dtype=np.uint8)
    flat = px.reshape(h, w)
    argb[:, :, 0] = (flat >> 24) & 0xFF
    argb[:, :, 1] = (flat >> 16) & 0xFF
    argb[:, :, 2] = (flat >> 8) & 0xFF
    argb[:, :, 3] = flat & 0xFF
    return argb, transforms


def _read_transform(br: _Reader, t: int, w: int, h: int):
    if t == 0:  # predictor
        bits = br.read(3) + 2
        sw = (w + (1 << bits) - 1) >> bits
        sh = (h + (1 << bits) - 1) >> bits
        img, _ = _decode_image(br, sw, sh, level0=False)
        return (0, bits, img[:, :, 2].astype(np.int32))  # green = mode
    if t == 1:  # color transform
        bits = br.read(3) + 2
        sw = (w + (1 << bits) - 1) >> bits
        sh = (h + (1 << bits) - 1) >> bits
        img, _ = _decode_image(br, sw, sh, level0=False)
        # blue byte = green_to_red, green = green_to_blue, red = red_to_blue
        return (1, bits, img[:, :, 3].astype(np.int32),
                img[:, :, 2].astype(np.int32),
                img[:, :, 1].astype(np.int32))
    if t == 2:  # subtract green
        return (2,)
    # color indexing
    n_colors = br.read(8) + 1
    img, _ = _decode_image(br, n_colors, 1, level0=False)
    pal = img[0].astype(np.int32)  # (n, 4) with left-delta coding
    pal = np.cumsum(pal, axis=0) & 0xFF
    return (3, pal.astype(np.uint8))


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) + b.astype(np.int32)) // 2


def _apply_predictor_inverse(
    argb: np.ndarray, bits: int, modes: np.ndarray
) -> np.ndarray:
    h, w, _ = argb.shape
    out = argb.astype(np.int32)
    black = np.array([255, 0, 0, 0], dtype=np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = black
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                mode = int(modes[y >> bits, x >> bits])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                # flat-memory rule: TR of the last column is the first
                # pixel of the CURRENT row (already reconstructed)
                TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                if mode == 0:
                    pred = black
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    p = L + T - TL
                    pl = int(np.abs(p - L).sum())
                    pt = int(np.abs(p - T).sum())
                    pred = L if pl < pt else T
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:
                    a = _avg2(L, T)
                    d = a - TL
                    half = np.where(d >= 0, d // 2, -((-d) // 2))
                    pred = np.clip(a + half, 0, 255)
                else:
                    raise ValueError(f"bad predictor mode {mode}")
            out[y, x] = (out[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _ctd(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8)t * (int8)c >> 5 (arithmetic)."""
    t8 = np.where(t > 127, t - 256, t)
    c8 = np.where(c > 127, c - 256, c)
    return (t8 * c8) >> 5


def _apply_color_inverse(
    argb: np.ndarray, bits: int, gtr, gtb, rtb
) -> np.ndarray:
    h, w, _ = argb.shape
    ys = np.arange(h) >> bits
    xs = np.arange(w) >> bits
    tg2r = gtr[ys][:, xs]
    tg2b = gtb[ys][:, xs]
    tr2b = rtb[ys][:, xs]
    out = argb.astype(np.int32)
    g = out[:, :, 2]
    out[:, :, 1] = (out[:, :, 1] + _ctd(tg2r, g)) & 0xFF
    out[:, :, 3] = (
        out[:, :, 3] + _ctd(tg2b, g) + _ctd(tr2b, out[:, :, 1])
    ) & 0xFF
    return out.astype(np.uint8)


def _apply_transforms(argb: np.ndarray, transforms, w: int, h: int):
    for t in reversed(transforms):
        if t[0] == 3:  # color indexing
            pal = t[1]
            n_colors = pal.shape[0]
            wb = (
                3 if n_colors <= 2 else
                2 if n_colors <= 4 else
                1 if n_colors <= 16 else 0
            )
            idx_img = argb[:, :, 2].astype(np.int32)  # packed in green
            if wb:
                per = 1 << wb
                ibits = 8 >> wb
                mask = (1 << ibits) - 1
                unpacked = np.zeros((argb.shape[0], idx_img.shape[1] * per), np.int32)
                for k in range(per):
                    unpacked[:, k::per] = (idx_img >> (k * ibits)) & mask
                idx_img = unpacked[:, :w]
            idx_img = np.clip(idx_img, 0, n_colors - 1)
            argb = pal[idx_img]
        elif t[0] == 2:  # subtract green
            out = argb.astype(np.int32)
            g = out[:, :, 2]
            out[:, :, 1] = (out[:, :, 1] + g) & 0xFF
            out[:, :, 3] = (out[:, :, 3] + g) & 0xFF
            argb = out.astype(np.uint8)
        elif t[0] == 1:
            argb = _apply_color_inverse(argb, t[1], t[2], t[3], t[4])
        elif t[0] == 0:
            argb = _apply_predictor_inverse(argb, t[1], t[2])
    return argb


def _riff_chunks(data: bytes):
    """Iterate (fourcc, payload) over a RIFF WEBP container."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (bad RIFF header)")
    pos = 12
    while pos + 8 <= len(data):
        cc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {cc!r} chunk")
        yield cc, body
        pos += 8 + size + (size & 1)


def webp_info(data: bytes) -> dict:
    """Header-only probe of a WebP container (still or animated)."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (bad RIFF header)")
    fourcc = data[12:16]
    if fourcc == b"VP8L":
        if len(data) < 26 or data[20] != 0x2F:
            raise ValueError("bad VP8L signature byte")
        br = _Reader(data[21:26])
        w = br.read(14) + 1
        h = br.read(14) + 1
        alpha = br.read(1)
        version = br.read(3)
        return {
            "format": "VP8L",
            "width": w,
            "height": h,
            "has_alpha": bool(alpha),
            "version": version,
            "n_frames": 1,
        }
    if fourcc == b"VP8X":
        flags = data[20]
        cw = 1 + int.from_bytes(data[24:27], "little")
        ch = 1 + int.from_bytes(data[27:30], "little")
        n_frames = sum(1 for cc, _ in _riff_chunks(data) if cc == b"ANMF")
        return {
            "format": "VP8X",
            "width": cw,
            "height": ch,
            "has_alpha": bool(flags & 0x10),
            "version": 0,
            "n_frames": n_frames,
        }
    return {"format": fourcc.decode("latin-1").strip(), "width": 0,
            "height": 0, "has_alpha": False, "version": -1, "n_frames": 0}


def _decode_vp8l_payload(payload: bytes) -> np.ndarray:
    """A VP8L chunk body → (h, w, 4) uint8 ARGB (post-transform)."""
    br = _Reader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    if w * h > _MAX_PIXELS:
        raise ValueError("WebP dimensions exceed decoder cap")
    # transforms may shrink the coded width (color indexing)
    argb, transforms = _decode_image_with_transforms(br, w, h)
    argb = _apply_transforms(argb, transforms, w, h)
    if argb.shape[0] != h or argb.shape[1] != w:
        raise ValueError("decoded geometry mismatch")
    return argb


def _argb_out(argb: np.ndarray) -> np.ndarray:
    """(h, w, 4) ARGB → display RGB, or RGBA when alpha varies."""
    rgb = argb[:, :, [1, 2, 3]]
    if (argb[:, :, 0] != 255).any():
        return np.ascontiguousarray(
            np.concatenate([rgb, argb[:, :, :1]], axis=2)
        )
    return np.ascontiguousarray(rgb)


def decode_webp(data: bytes) -> np.ndarray:
    """Decode a lossless WebP → (h, w, 3) uint8 RGB, or (h, w, 4)
    RGBA when the alpha channel carries information. Animated (VP8X)
    files decode to their first composed frame. Lossy VP8 is the
    named ffmpeg/PIL seam."""
    info = webp_info(data)
    if info["format"] == "VP8X":
        return decode_webp_frames(data)[0]
    if info["format"] != "VP8L":
        raise NotImplementedError(
            f"WebP {info['format']} (lossy) decode needs libwebp on "
            "executors; install and implement here"
        )
    (size,) = struct.unpack_from("<I", data, 16)
    return _argb_out(_decode_vp8l_payload(data[20 : 20 + size]))


def decode_webp_frames(
    data: bytes, frame_stride: int = 1
) -> List[np.ndarray]:
    """Decode an animated (VP8X/ANIM/ANMF) or still WebP → list of
    composed (h, w, 3|4) uint8 frames, every ``frame_stride``-th
    DISPLAYED frame (composition still walks every frame — animation
    deltas chain, unlike MJPEG samples). ANMF disposal 1 clears the
    frame rect to transparent; blending 0 alpha-composites the frame
    over the canvas."""
    if frame_stride < 1:
        raise ValueError("frame_stride must be >= 1")
    info = webp_info(data)
    if info["format"] == "VP8L":
        return [decode_webp(data)]
    if info["format"] != "VP8X":
        raise NotImplementedError(
            f"WebP {info['format']} (lossy) decode needs libwebp on "
            "executors; install and implement here"
        )
    cw, ch = info["width"], info["height"]
    if cw * ch > _MAX_PIXELS:
        raise ValueError("WebP canvas exceeds decoder cap")
    canvas = np.zeros((ch, cw, 4), dtype=np.int32)  # [a, r, g, b]
    frames: List[np.ndarray] = []
    idx = 0
    for cc, body in _riff_chunks(data):
        if cc != b"ANMF":
            continue
        if len(body) < 16:
            raise ValueError("truncated ANMF header")
        fx = 2 * int.from_bytes(body[0:3], "little")
        fy = 2 * int.from_bytes(body[3:6], "little")
        fw = 1 + int.from_bytes(body[6:9], "little")
        fh = 1 + int.from_bytes(body[9:12], "little")
        flags = body[15]
        sub = None
        pos = 16
        while pos + 8 <= len(body):
            scc = body[pos : pos + 4]
            (ssize,) = struct.unpack_from("<I", body, pos + 4)
            if scc == b"VP8L":
                sub = body[pos + 8 : pos + 8 + ssize]
                break
            if scc == b"VP8 ":
                raise NotImplementedError(
                    "lossy VP8 animation frame needs libwebp"
                )
            pos += 8 + ssize + (ssize & 1)
        if sub is None:
            raise ValueError("ANMF frame carries no image chunk")
        fr = _decode_vp8l_payload(sub).astype(np.int32)
        if fr.shape[0] != fh or fr.shape[1] != fw:
            raise ValueError("ANMF frame geometry mismatch")
        if fy + fh > ch or fx + fw > cw:
            raise ValueError("ANMF frame outside the canvas")
        rect = canvas[fy : fy + fh, fx : fx + fw]
        if flags & 0x02:  # no blend: overwrite
            blended = fr
        else:  # alpha-composite frame over canvas (integer math)
            fa = fr[:, :, :1]
            ca = rect[:, :, :1]
            ca_scaled = ca * (255 - fa) // 255
            out_a = fa + ca_scaled
            num = fr[:, :, 1:] * fa + rect[:, :, 1:] * ca_scaled
            blended = np.concatenate(
                [out_a, num // np.maximum(out_a, 1)], axis=2
            )
        canvas[fy : fy + fh, fx : fx + fw] = blended
        if idx % frame_stride == 0:
            frames.append(_argb_out(canvas.astype(np.uint8)))
        if flags & 0x01:  # dispose to background: clear frame rect
            canvas[fy : fy + fh, fx : fx + fw] = 0
        idx += 1
    if not frames:
        raise ValueError("VP8X container carries no ANMF frames")
    return frames


def _decode_image_with_transforms(br: _Reader, w: int, h: int):
    return _decode_image(br, w, h, level0=True)


# ── encoder twin ─────────────────────────────────────────────────────


def _write_code_lengths(
    bw: _Writer, lengths: List[int]
) -> None:
    """Serialize one prefix code's lengths (simple form when <= 2
    symbols, else through the code-length code)."""
    used = [s for s, l in enumerate(lengths) if l > 0]
    if 1 <= len(used) <= 2 and max(used) < 256:
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        if used[0] < 2 and len(used) == 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        return
    bw.write(0, 1)
    # emit the length stream with zero-run compression (17/18)
    stream: List[Tuple[int, int, int]] = []  # (symbol, extra_val, extra_bits)
    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                take = min(run, 138)
                stream.append((18, take - 11, 7))
                run -= take
            while run >= 3:
                take = min(run, 10)
                stream.append((17, take - 3, 3))
                run -= take
            for _ in range(run):
                stream.append((0, 0, 0))
            i = j
        else:
            stream.append((lengths[i], 0, 0))
            i += 1
    freq = [0] * 19
    for s, _, _ in stream:
        freq[s] += 1
    cl_lengths = _limited_lengths(freq, 7)
    if sum(1 for l in cl_lengths if l) == 1:
        # single-symbol code-length code: declared length must be >= 1
        # but decodes with 0 bits; keep as length 1 for Kraft validity
        pass
    order_pos = {c: i for i, c in enumerate(_CL_ORDER)}
    last = max(
        (order_pos[s] for s in range(19) if cl_lengths[s] > 0),
        default=0,
    )
    num_codes = max(4, last + 1)
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no explicit max_symbol
    cl_codes = _codes_from_lengths(cl_lengths)
    single_cl = sum(1 for l in cl_lengths if l) == 1
    for s, extra_val, extra_bits in stream:
        if not single_cl:
            _write_code_msb(bw, cl_codes[s], cl_lengths[s])
        if extra_bits:
            bw.write(extra_val, extra_bits)


def _write_code_msb(bw: _Writer, code: int, length: int) -> None:
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


class _CodeSet:
    __slots__ = ("lengths", "codes", "single")

    def __init__(self, freqs: List[int]):
        if not any(freqs):
            freqs = list(freqs)
            freqs[0] = 1
        self.lengths = _limited_lengths(freqs, 15)
        self.codes = _codes_from_lengths(self.lengths)
        self.single = sum(1 for l in self.lengths if l) == 1

    def emit(self, bw: _Writer, s: int) -> None:
        if self.single:
            return
        _write_code_msb(bw, self.codes[s], self.lengths[s])


def _encode_image(bw: _Writer, argb: np.ndarray) -> None:
    """Entropy-code a SUB-image (transform data / entropy image): one
    prefix group, all literals, no cache, no meta groups — the exact
    stream shape ``_decode_image(level0=False)`` reads."""
    h, w, _ = argb.shape
    tokens = [
        ("lit", tuple(int(v) for v in argb[y, x]))
        for y in range(h)
        for x in range(w)
    ]
    gfreq = [0] * 280
    rfreq = [0] * 256
    bfreq = [0] * 256
    afreq = [0] * 256
    dfreq = [0] * 40
    for tok in tokens:
        if tok[0] == "lit":
            a, r, g, b = tok[1]
            gfreq[g] += 1
            rfreq[r] += 1
            bfreq[b] += 1
            afreq[a] += 1
        else:
            _k, length, dcode = tok
            gfreq[256 + _prefix_of(length)[0]] += 1
            dfreq[_prefix_of(dcode)[0]] += 1
    bw.write(0, 1)  # no color cache
    codes = []
    for freqs in (gfreq, rfreq, bfreq, afreq, dfreq):
        cs = _CodeSet(freqs)
        _write_code_lengths(bw, cs.lengths)
        codes.append(cs)
    cg, cr, cb, ca, cd = codes
    for tok in tokens:
        if tok[0] == "lit":
            a, r, g, b = tok[1]
            cg.emit(bw, g)
            cr.emit(bw, r)
            cb.emit(bw, b)
            ca.emit(bw, a)
        else:
            _k, length, dcode = tok
            pc, eb, ev = _prefix_of(length)
            cg.emit(bw, 256 + pc)
            if eb:
                bw.write(ev, eb)
            pc, eb, ev = _prefix_of(dcode)
            cd.emit(bw, pc)
            if eb:
                bw.write(ev, eb)


def _lz77_tokens(argb: np.ndarray, w: int, plane: bool) -> List:
    """Greedy single-hash LZ77 over the flat ARGB pixel stream (the
    twin's compression pass — correctness, not ratio, is the goal)."""
    h = argb.shape[0]
    flat = [tuple(int(v) for v in argb[y, x]) for y in range(h) for x in range(argb.shape[1])]
    n = len(flat)
    last_seen: dict = {}
    plane_idx = {
        (dx, dy): i + 1 for i, (dx, dy) in enumerate(_PLANE)
    }
    tokens: List = []
    pos = 0
    while pos < n:
        prev = last_seen.get(flat[pos])
        emitted = False
        if prev is not None and pos - prev <= 1_000_000:
            length = 0
            dist = pos - prev
            while (
                pos + length < n
                and length < 4096
                and flat[pos + length] == flat[pos + length - dist]
            ):
                length += 1
            if length >= 3:
                if plane:
                    dy, dx = divmod(dist, w)
                    if dx > 8:
                        dx -= w
                        dy += 1
                    dcode = plane_idx.get((dx, dy), dist + 120)
                else:
                    dcode = dist + 120
                tokens.append(("copy", length, dcode))
                for k in range(length):
                    last_seen[flat[pos + k]] = pos + k
                pos += length
                emitted = True
        if not emitted:
            tokens.append(("lit", flat[pos]))
            last_seen[flat[pos]] = pos
            pos += 1
    return tokens


def encode_webp_lossless(
    arr: np.ndarray,
    use_lz77: bool = True,
    plane_codes: bool = False,
    subtract_green: bool = False,
    palette: bool = False,
    predictor: Optional[int] = None,
    color_transform: Optional[Tuple[int, int, int]] = None,
    cache_bits: int = 0,
    meta_bits: int = 0,
) -> bytes:
    """Encode (h, w, 3) RGB or (h, w, 4) RGBA uint8 as lossless WebP.
    The knobs exist to exercise every decoder path: ``subtract_green``,
    ``palette`` (color-indexing, auto-packed), ``predictor`` (one
    fixed mode 0..13 for the whole image), ``color_transform`` (one
    fixed (g→r, g→b, r→b) byte triple), ``plane_codes``
    (near-distance codes 1..120), ``cache_bits`` (color cache) and
    ``meta_bits`` (a two-group meta-prefix split)."""
    arr = np.asarray(arr)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("encode_webp_lossless expects (h, w, 3|4)")
    h, w = arr.shape[:2]
    if not (0 < w <= 16384 and 0 < h <= 16384):
        raise ValueError("dimensions out of VP8L range")
    argb = np.zeros((h, w, 4), dtype=np.uint8)
    argb[:, :, 1:4] = arr[:, :, :3]
    argb[:, :, 0] = arr[:, :, 3] if arr.shape[2] == 4 else 255
    has_alpha = bool((argb[:, :, 0] != 255).any())

    bw = _Writer()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version

    coded = argb
    cw = w
    if predictor is not None:
        bw.write(1, 1)
        bw.write(0, 2)  # transform 0
        bits = 4
        bw.write(bits - 2, 3)
        sw = (w + 15) >> 4
        sh = (h + 15) >> 4
        modes = np.zeros((sh, sw, 4), dtype=np.uint8)
        modes[:, :, 0] = 255
        modes[:, :, 2] = predictor
        _encode_image(bw, modes)
        coded = _forward_predictor(coded, bits, predictor)
    if color_transform is not None:
        gtr, gtb, rtb = color_transform
        bw.write(1, 1)
        bw.write(1, 2)
        bits = 4
        bw.write(bits - 2, 3)
        sw = (w + 15) >> 4
        sh = (h + 15) >> 4
        timg = np.zeros((sh, sw, 4), dtype=np.uint8)
        timg[:, :, 0] = 255
        timg[:, :, 3] = gtr  # blue byte = green_to_red
        timg[:, :, 2] = gtb
        timg[:, :, 1] = rtb
        _encode_image(bw, timg)
        coded = _forward_color(coded, gtr, gtb, rtb)
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        out = coded.astype(np.int32)
        g = out[:, :, 2]
        out[:, :, 1] = (out[:, :, 1] - g) & 0xFF
        out[:, :, 3] = (out[:, :, 3] - g) & 0xFF
        coded = out.astype(np.uint8)
    if palette:
        flat = coded.reshape(-1, 4)
        colors, inverse = np.unique(
            flat, axis=0, return_inverse=True
        )
        if colors.shape[0] > 256:
            raise ValueError("palette mode needs <= 256 distinct colors")
        bw.write(1, 1)
        bw.write(3, 2)
        n_colors = colors.shape[0]
        bw.write(n_colors - 1, 8)
        deltas = colors.astype(np.int32).copy()
        deltas[1:] = (deltas[1:] - colors.astype(np.int32)[:-1]) & 0xFF
        _encode_image(bw, deltas.astype(np.uint8).reshape(1, n_colors, 4))
        idx = inverse.reshape(h, w).astype(np.int32)
        wb = (
            3 if n_colors <= 2 else
            2 if n_colors <= 4 else
            1 if n_colors <= 16 else 0
        )
        if wb:
            per = 1 << wb
            ibits = 8 >> wb
            cw = (w + per - 1) >> wb
            packed = np.zeros((h, cw), dtype=np.int32)
            for k in range(per):
                col = idx[:, k::per]
                packed[:, : col.shape[1]] |= col << (k * ibits)
            idx = packed
        else:
            cw = w
        coded = np.zeros((h, cw, 4), dtype=np.uint8)
        coded[:, :, 0] = 255
        coded[:, :, 2] = idx.astype(np.uint8)
    bw.write(0, 1)  # end of transforms

    tokens = (
        _lz77_tokens(coded, cw, plane_codes) if use_lz77 else None
    )
    _encode_main(bw, coded, tokens, cache_bits, meta_bits)
    payload = bw.flush()
    riff_body = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        riff_body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _cache_hash(val: int, bits: int) -> int:
    return (0x1E35A7BD * val & 0xFFFFFFFF) >> (32 - bits)


def encode_webp_anim(
    frames: List[np.ndarray],
    duration_ms: int = 100,
    offsets: Optional[List[Tuple[int, int]]] = None,
    dispose: bool = False,
    blend: bool = False,
    canvas: Optional[Tuple[int, int]] = None,
    loop: int = 0,
) -> bytes:
    """Encode frames as an ANIMATED lossless WebP (VP8X + ANIM + ANMF
    with embedded VP8L chunks). ``offsets`` are per-frame (x, y)
    canvas positions (even values, per the spec's 2-pixel grid);
    ``dispose`` clears each frame's rect afterwards; ``blend``
    alpha-composites instead of overwriting. The decoder twin is
    ``decode_webp_frames``."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    offs = offsets or [(0, 0)] * len(frames)
    if len(offs) != len(frames):
        raise ValueError("offsets/frames length mismatch")
    cw = ch = 0
    for fr, (x, y) in zip(frames, offs):
        if x % 2 or y % 2:
            raise ValueError("frame offsets must be even")
        cw = max(cw, x + fr.shape[1])
        ch = max(ch, y + fr.shape[0])
    if canvas is not None:
        if canvas[0] < cw or canvas[1] < ch:
            raise ValueError("canvas smaller than its frames")
        cw, ch = canvas
    chunks = bytearray()
    has_alpha = any(
        fr.ndim == 3 and fr.shape[2] == 4 and (fr[:, :, 3] != 255).any()
        for fr in frames
    )
    vp8x = bytes(
        [0x02 | (0x10 if has_alpha else 0), 0, 0, 0]
    ) + (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little")
    chunks += b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    anim = struct.pack("<IH", 0, loop)
    chunks += b"ANIM" + struct.pack("<I", len(anim)) + anim
    for fr, (x, y) in zip(frames, offs):
        still = encode_webp_lossless(np.asarray(fr))
        # lift the VP8L chunk out of the still container
        sub = None
        for cc, body in _riff_chunks(still):
            if cc == b"VP8L":
                sub = body
                break
        assert sub is not None
        flags = (0x01 if dispose else 0) | (0 if blend else 0x02)
        head = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (fr.shape[1] - 1).to_bytes(3, "little")
            + (fr.shape[0] - 1).to_bytes(3, "little")
            + int(duration_ms).to_bytes(3, "little")
            + bytes([flags])
        )
        payload = head + b"VP8L" + struct.pack("<I", len(sub)) + sub
        if len(sub) % 2:
            payload += b"\x00"
        chunks += b"ANMF" + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            chunks += b"\x00"
    body = b"WEBP" + bytes(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _encode_main(
    bw: _Writer,
    argb: np.ndarray,
    tokens,
    cache_bits: int = 0,
    meta_bits: int = 0,
) -> None:
    """Level-0 entropy coding: cache bit, meta bit, prefix codes,
    pixels — the decoder's exact read order. ``cache_bits`` rewrites
    literal tokens as cache hits where the running cache matches;
    ``meta_bits`` splits the image into tile-column groups with
    independent prefix codes (a real multi-group stream)."""
    h, w, _ = argb.shape
    if tokens is None:
        tokens = [
            ("lit", tuple(int(v) for v in argb[y, x]))
            for y in range(h)
            for x in range(w)
        ]
    # rewrite tokens against a running color cache (decoder-simulating)
    if cache_bits:
        cache = [None] * (1 << cache_bits)
        new_tokens = []
        produced: List[Tuple[int, int, int, int]] = []
        for tok in tokens:
            if tok[0] == "lit":
                a, r, g, b = tok[1]
                val = (a << 24) | (r << 16) | (g << 8) | b
                idx = _cache_hash(val, cache_bits)
                if cache[idx] == val:
                    new_tokens.append(("cache", idx))
                else:
                    cache[idx] = val
                    new_tokens.append(tok)
                produced.append(tok[1])
            else:
                _k, length, dcode = tok
                dist = (
                    dcode - 120
                    if dcode > 120
                    else max(
                        1,
                        _PLANE[dcode - 1][1] * w + _PLANE[dcode - 1][0],
                    )
                )
                for _ in range(length):
                    px = produced[len(produced) - dist]
                    produced.append(px)
                    a, r, g, b = px
                    val = (a << 24) | (r << 16) | (g << 8) | b
                    cache[_cache_hash(val, cache_bits)] = val
                new_tokens.append(tok)
        tokens = new_tokens
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    # group assignment (tile-column split) + entropy image
    n_groups = 1
    group_of_token: Optional[List[int]] = None
    if meta_bits:
        bw.write(1, 1)
        bw.write(meta_bits - 2, 3)
        gw = (w + (1 << meta_bits) - 1) >> meta_bits
        gh = (h + (1 << meta_bits) - 1) >> meta_bits
        n_groups = min(2, gw) if gw > 1 else 1
        gimg = np.zeros((gh, gw, 4), dtype=np.uint8)
        gimg[:, :, 0] = 255
        for gx in range(gw):
            gimg[:, gx, 2] = gx % n_groups  # green = group index
        _encode_image(bw, gimg)
        group_of_token = []
        pos = 0
        for tok in tokens:
            x = pos % w
            group_of_token.append((x >> meta_bits) % n_groups)
            pos += tok[1] if tok[0] == "copy" else 1
    else:
        bw.write(0, 1)
    galpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    freqs = [
        [[0] * galpha, [0] * 256, [0] * 256, [0] * 256, [0] * 40]
        for _ in range(n_groups)
    ]
    for i, tok in enumerate(tokens):
        gi = group_of_token[i] if group_of_token else 0
        gf, rf, bf, af, df = freqs[gi]
        if tok[0] == "lit":
            a, r, g, b = tok[1]
            gf[g] += 1
            rf[r] += 1
            bf[b] += 1
            af[a] += 1
        elif tok[0] == "cache":
            gf[256 + 24 + tok[1]] += 1
        else:
            _k, length, dcode = tok
            gf[256 + _prefix_of(length)[0]] += 1
            df[_prefix_of(dcode)[0]] += 1
    group_codes = []
    for gi in range(n_groups):
        cs_list = []
        for fr in freqs[gi]:
            cs = _CodeSet(fr)
            _write_code_lengths(bw, cs.lengths)
            cs_list.append(cs)
        group_codes.append(cs_list)
    for i, tok in enumerate(tokens):
        gi = group_of_token[i] if group_of_token else 0
        cg, cr, cb, ca, cd = group_codes[gi]
        if tok[0] == "lit":
            a, r, g, b = tok[1]
            cg.emit(bw, g)
            cr.emit(bw, r)
            cb.emit(bw, b)
            ca.emit(bw, a)
        elif tok[0] == "cache":
            cg.emit(bw, 256 + 24 + tok[1])
        else:
            _k, length, dcode = tok
            pc, eb, ev = _prefix_of(length)
            cg.emit(bw, 256 + pc)
            if eb:
                bw.write(ev, eb)
            pc, eb, ev = _prefix_of(dcode)
            cd.emit(bw, pc)
            if eb:
                bw.write(ev, eb)


def _forward_predictor(
    argb: np.ndarray, bits: int, mode: int
) -> np.ndarray:
    """Residuals for a single fixed predictor mode (encoder twin of
    _apply_predictor_inverse — runs the decoder's own prediction on
    the progressively reconstructed image)."""
    h, w, _ = argb.shape
    src = argb.astype(np.int32)
    res = np.zeros_like(src)
    black = np.array([255, 0, 0, 0], dtype=np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = black
            elif y == 0:
                pred = src[0, x - 1]
            elif x == 0:
                pred = src[y - 1, 0]
            else:
                L = src[y, x - 1]
                T = src[y - 1, x]
                TL = src[y - 1, x - 1]
                # lossless: reconstructed == source, so predicting from
                # src matches the decoder exactly (incl. the TR rule)
                TR = src[y - 1, x + 1] if x + 1 < w else src[y, 0]
                if mode == 0:
                    pred = black
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    p = L + T - TL
                    pl = int(np.abs(p - L).sum())
                    pt = int(np.abs(p - T).sum())
                    pred = L if pl < pt else T
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:
                    a = _avg2(L, T)
                    d = a - TL
                    half = np.where(d >= 0, d // 2, -((-d) // 2))
                    pred = np.clip(a + half, 0, 255)
                else:
                    raise ValueError(f"bad predictor mode {mode}")
            res[y, x] = (src[y, x] - pred) & 0xFF
    return res.astype(np.uint8)


def _forward_color(argb: np.ndarray, gtr: int, gtb: int, rtb: int):
    out = argb.astype(np.int32)
    g = out[:, :, 2]
    red0 = out[:, :, 1].copy()
    out[:, :, 1] = (out[:, :, 1] - _ctd(np.int32(gtr), g)) & 0xFF
    out[:, :, 3] = (
        out[:, :, 3] - _ctd(np.int32(gtb), g) - _ctd(np.int32(rtb), red0)
    ) & 0xFF
    return out.astype(np.uint8)
