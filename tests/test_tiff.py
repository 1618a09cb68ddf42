"""From-scratch TIFF 6.0 codec (kernel/tiff.py).

Evidence model mirrors the other codec suites: bit-exact roundtrips
(every supported compression is lossless), a byte-determinism golden,
an encoder/decoder LZW mirror fuzz across the 9→12-bit width
boundaries and the table-full clear, and the untrusted-input
containment contract (ValueError for malformed streams,
NotImplementedError only for genuine format gaps)."""

import hashlib

import numpy as np
import pytest

from gmft_spark.kernel.tiff import (
    decode_tiff,
    encode_tiff,
    lzw_encode,
    packbits_decode,
    packbits_encode,
    tiff_info,
)
from gmft_spark.sources.pdfparse.objects import _lzw_decode

# 40x56: multi-strip at rows_per_strip=7 leaves a 5-row tail strip
H, W = 40, 56


def _gray() -> np.ndarray:
    return (
        (np.arange(H)[:, None] * 3 + np.arange(W)[None, :] * 7 + 11) % 256
    ).astype(np.uint8)


def _rgb() -> np.ndarray:
    g = _gray().astype(np.int32)
    return np.stack([g, (g + 50) % 256, (g * 3) % 256], axis=2).astype(
        np.uint8
    )


def _bilevel() -> np.ndarray:
    return (
        ((np.arange(33)[:, None] * 5 + np.arange(50)[None, :] * 3) % 7) < 2
    ).astype(np.uint8)


def _prng_bytes(n: int, seed: int) -> bytes:
    out = bytearray()
    c = 0
    while len(out) < n:
        out += hashlib.md5(f"{seed}:{c}".encode()).digest()
        c += 1
    return bytes(out[:n])


# ── LZW encoder mirrors the shared decoder ───────────────────────────


def test_lzw_mirror_fuzz():
    """Roundtrip across sizes that cross every code-width boundary
    (9→10 at ~253 codes, →11, →12) and the 4094-entry clear; both
    high-entropy (md5 stream: one table entry per ~code) and
    low-entropy (long matches) inputs."""
    for n in (0, 1, 5, 300, 4096, 20000, 120000):
        for seed in (1, 2):
            d = _prng_bytes(n, seed)
            assert _lzw_decode(lzw_encode(d)) == d, (n, seed)
        d = (b"abcab" * (n // 5 + 1))[:n]
        assert _lzw_decode(lzw_encode(d)) == d, ("rep", n)
        d = bytes([(i * 7) % 19 for i in range(n)])
        assert _lzw_decode(lzw_encode(d)) == d, ("mod", n)


def test_lzw_single_run():
    # the classic KwKwK corner: w == c throughout
    for n in (2, 3, 100, 5000):
        d = b"\xaa" * n
        assert _lzw_decode(lzw_encode(d)) == d, n


# ── PackBits ─────────────────────────────────────────────────────────


def test_packbits_roundtrip():
    for n in (0, 1, 2, 3, 400, 5000):
        d = _prng_bytes(n, 9)
        assert packbits_decode(packbits_encode(d)) == d
        assert packbits_decode(packbits_encode(bytes(n))) == bytes(n)
    # mixed literal/replicate boundaries
    d = b"ab" + b"c" * 130 + b"de" + b"f" * 3 + b"g"
    assert packbits_decode(packbits_encode(d)) == d


def test_packbits_malformed():
    with pytest.raises(ValueError):
        packbits_decode(b"\x05ab")  # literal run overruns input
    with pytest.raises(ValueError):
        packbits_decode(b"\xfe")  # replicate header missing its byte
    with pytest.raises(ValueError):
        packbits_decode(b"\x00a", expected=5)  # short strip


# ── grayscale / RGB roundtrips ───────────────────────────────────────


@pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("rps", [None, 7])
def test_gray_roundtrip(comp, big_endian, rps):
    g = _gray()
    t = encode_tiff(g, comp, rows_per_strip=rps, big_endian=big_endian)
    assert np.array_equal(decode_tiff(t), g)
    info = tiff_info(t)
    assert (info["width"], info["height"]) == (W, H)
    assert info["n_strips"] == (1 if rps is None else -(-H // 7))


@pytest.mark.parametrize("comp", ["lzw", "packbits"])
def test_gray_predictor_roundtrip(comp):
    g = _gray()
    t = encode_tiff(g, comp, predictor=True, rows_per_strip=9)
    assert np.array_equal(decode_tiff(t), g)


@pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
@pytest.mark.parametrize("pred", [False, True])
def test_rgb_roundtrip(comp, pred):
    if pred and comp == "none":
        pytest.skip("predictor without compression is pointless")
    rgb = _rgb()
    t = encode_tiff(rgb, comp, predictor=pred, rows_per_strip=13)
    assert np.array_equal(decode_tiff(t), rgb)


def test_gray_photometric_zero_inverts():
    g = _gray()
    t = encode_tiff(g, "lzw", photometric=0)
    assert np.array_equal(decode_tiff(t), 255 - g)


# ── bilevel (CCITT + MH) ─────────────────────────────────────────────


@pytest.mark.parametrize("comp", ["g4", "g3", "g32d", "mh"])
@pytest.mark.parametrize("rps", [None, 8])
def test_bilevel_roundtrip(comp, rps):
    bm = _bilevel()
    t = encode_tiff(bm, comp, rows_per_strip=rps)
    # photometric 0: black(1) → luminance 0
    want = np.where(bm > 0, 0, 255).astype(np.uint8)
    assert np.array_equal(decode_tiff(t), want)


@pytest.mark.parametrize("comp", ["g4", "mh"])
def test_bilevel_fill_order_2(comp):
    bm = _bilevel()
    t = encode_tiff(bm, comp, fill_order=2)
    want = np.where(bm > 0, 0, 255).astype(np.uint8)
    assert np.array_equal(decode_tiff(t), want)
    # the stored strip genuinely differs from fill-order-1 bytes
    t1 = encode_tiff(bm, comp)
    assert t1 != t


def test_bilevel_photometric_one_flips():
    bm = _bilevel()
    t = encode_tiff(bm, "g4", photometric=1)
    assert np.array_equal(
        decode_tiff(t), np.where(bm > 0, 255, 0).astype(np.uint8)
    )


def test_fill_order_2_rejected_for_gray():
    with pytest.raises(ValueError):
        encode_tiff(_gray(), "lzw", fill_order=2)


# ── palette ──────────────────────────────────────────────────────────


def test_palette_roundtrip():
    idx = ((np.arange(20)[:, None] + np.arange(30)[None, :]) % 256).astype(
        np.uint8
    )
    cmap = np.stack(
        [
            np.arange(256) * 257,
            (255 - np.arange(256)) * 257,
            (np.arange(256) * 100) % 65536,
        ]
    ).astype(np.uint16)
    t = encode_tiff(idx, "lzw", colormap=cmap, big_endian=True)
    out = decode_tiff(t)
    assert out.shape == (20, 30, 3)
    for c in range(3):
        assert np.array_equal(
            out[:, :, c], (cmap[c] >> 8).astype(np.uint8)[idx]
        )


# ── byte determinism golden ──────────────────────────────────────────


def test_encode_golden():
    """Any drift in the IFD layout, LZW coder, predictor or strip
    framing flips these hashes."""
    t = encode_tiff(_gray(), "lzw", predictor=True, rows_per_strip=7)
    assert hashlib.md5(t).hexdigest() == _GOLDEN_LZW
    t2 = encode_tiff(_bilevel(), "g4", fill_order=2)
    assert hashlib.md5(t2).hexdigest() == _GOLDEN_G4


_GOLDEN_LZW = "e7721dc9b966fdc32fecbc1801a7cf18"
_GOLDEN_G4 = "147def4e2808ff1eafaef1f19489f630"


# ── containment: malformed / unsupported ─────────────────────────────


def test_malformed_rejected():
    g = _gray()
    t = bytearray(encode_tiff(g, "none"))
    with pytest.raises(ValueError):
        decode_tiff(b"XX" + bytes(t[2:]))  # bad byte-order mark
    with pytest.raises(ValueError):
        decode_tiff(bytes(t[:6]))  # truncated header
    bad = bytearray(t)
    bad[4:8] = (len(bad) + 100).to_bytes(4, "little")  # IFD out of range
    with pytest.raises(ValueError):
        decode_tiff(bytes(bad))
    with pytest.raises(ValueError):
        decode_tiff(bytes(t[: len(t) // 2]))  # body truncated


def test_truncated_strip_rejected():
    t = bytearray(encode_tiff(_gray(), "lzw"))
    # find the strip-byte-counts tag (279) and halve the count
    import struct

    ifd_off = struct.unpack_from("<I", t, 4)[0]
    n = struct.unpack_from("<H", t, ifd_off)[0]
    for i in range(n):
        pos = ifd_off + 2 + 12 * i
        tag = struct.unpack_from("<H", t, pos)[0]
        if tag == 279:
            cnt = struct.unpack_from("<I", t, pos + 8)[0]
            struct.pack_into("<I", t, pos + 8, cnt // 2)
    with pytest.raises(ValueError):
        decode_tiff(bytes(t))


def test_unsupported_corners():
    import struct

    t = bytearray(encode_tiff(_gray(), "none"))
    ifd_off = struct.unpack_from("<I", t, 4)[0]
    n = struct.unpack_from("<H", t, ifd_off)[0]

    def patch(tag, value):
        buf = bytearray(t)
        for i in range(n):
            pos = ifd_off + 2 + 12 * i
            if struct.unpack_from("<H", buf, pos)[0] == tag:
                struct.pack_into("<I", buf, pos + 8, value)
        return bytes(buf)

    with pytest.raises(ValueError):
        decode_tiff(patch(259, 999))  # unknown compression id
    with pytest.raises(NotImplementedError):
        decode_tiff(patch(259, 6))  # old-style JPEG-in-TIFF
    with pytest.raises(ValueError):
        decode_tiff(patch(259, 7))  # claims JPEG but strips lack SOI
    # planar=2 on a single-sample image is the chunky layout: still valid
    assert np.array_equal(decode_tiff(patch(284, 2)), _gray())
    with pytest.raises(ValueError):
        decode_tiff(patch(284, 3))  # invalid planar value
    with pytest.raises(ValueError):
        decode_tiff(patch(258, 16))  # claims 16-bit: strips run short
    with pytest.raises(NotImplementedError):
        decode_tiff(patch(258, 4))  # 4-bit samples
    with pytest.raises(ValueError):
        decode_tiff(patch(259, 4))  # CCITT on 8-bit samples


def test_dimension_cap():
    import struct

    t = bytearray(encode_tiff(_gray(), "none"))
    ifd_off = struct.unpack_from("<I", t, 4)[0]
    n = struct.unpack_from("<H", t, ifd_off)[0]
    for i in range(n):
        pos = ifd_off + 2 + 12 * i
        if struct.unpack_from("<H", t, pos)[0] in (256, 257):
            struct.pack_into("<I", t, pos + 8, 100_000)
    with pytest.raises(ValueError):
        decode_tiff(bytes(t))


# ── tiled layout / planar configuration 2 / 16-bit samples ──────────


@pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
@pytest.mark.parametrize("pred", [False, True])
def test_tiled_gray_roundtrip(comp, pred):
    g = _gray()  # 40x56 with 32x16 tiles → 2x2 grid, both edges ragged
    t = encode_tiff(g, comp, predictor=pred, tile=(32, 16))
    assert np.array_equal(decode_tiff(t), g)


@pytest.mark.parametrize("comp", ["lzw", "packbits"])
def test_tiled_rgb_roundtrip(comp):
    rgb = _rgb()
    t = encode_tiff(rgb, comp, tile=(16, 16), big_endian=True)
    assert np.array_equal(decode_tiff(t), rgb)


def test_tiled_bilevel_g4_roundtrip():
    bm = _bilevel()  # 33x50 with 16x16 tiles → ragged edges
    t = encode_tiff(bm, "g4", tile=(16, 16))
    out = decode_tiff(t)
    assert np.array_equal(out, np.where(bm > 0, 0, 255).astype(np.uint8))


def test_tiled_jpeg_flat_blocks_exact():
    g = _flat_blocks(H, W)
    t = encode_tiff(g, "jpeg", tile=(16, 16))
    assert np.array_equal(decode_tiff(t), g)


def test_tile_dims_must_be_multiples_of_16():
    with pytest.raises(ValueError):
        encode_tiff(_gray(), "none", tile=(20, 16))


@pytest.mark.parametrize("comp", ["none", "lzw"])
@pytest.mark.parametrize("pred", [False, True])
def test_planar_rgb_roundtrip(comp, pred):
    rgb = _rgb()
    t = encode_tiff(rgb, comp, predictor=pred, planar=2, rows_per_strip=7)
    assert np.array_equal(decode_tiff(t), rgb)


def test_planar_tiled_roundtrip():
    rgb = _rgb()
    t = encode_tiff(rgb, "packbits", planar=2, tile=(16, 16))
    assert np.array_equal(decode_tiff(t), rgb)


@pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
@pytest.mark.parametrize("pred", [False, True])
@pytest.mark.parametrize("big_endian", [False, True])
def test_sixteen_bit_gray(comp, pred, big_endian):
    g16 = (
        (np.arange(H)[:, None] * 1021 + np.arange(W)[None, :] * 257) % 65536
    ).astype(np.uint16)
    t = encode_tiff(g16, comp, predictor=pred, big_endian=big_endian)
    assert tiff_info(t)["bits_per_sample"] == 16
    assert np.array_equal(decode_tiff(t), (g16 >> 8).astype(np.uint8))


def test_sixteen_bit_rgb_planar_tiled():
    g16 = (
        (np.arange(H)[:, None] * 911 + np.arange(W)[None, :] * 401) % 65536
    ).astype(np.uint16)
    rgb16 = np.stack([g16, g16 * 3, g16 * 7], axis=2).astype(np.uint16)
    t = encode_tiff(rgb16, "lzw", predictor=True, planar=2, tile=(16, 32))
    assert np.array_equal(decode_tiff(t), (rgb16 >> 8).astype(np.uint8))


def test_sixteen_bit_rejects_lossy_and_bilevel():
    g16 = np.zeros((8, 8), dtype=np.uint16)
    with pytest.raises(ValueError):
        encode_tiff(g16, "jpeg")
    with pytest.raises(ValueError):
        encode_tiff(g16, "g4")


# ── JPEG-in-TIFF (new-style compression 7) ───────────────────────────


def _flat_blocks(h: int, w: int) -> np.ndarray:
    """Constant 8x8 blocks: the flat-DC content class that roundtrips
    bit-exact through the q>=90 JPEG path (quant error < 1/2)."""
    by = np.arange(h) // 8
    bx = np.arange(w) // 8
    return ((by[:, None] * 37 + bx[None, :] * 11 + 40) % 200 + 28).astype(
        np.uint8
    )


def test_jpeg_gray_flat_blocks_exact():
    g = _flat_blocks(H, W)
    t = encode_tiff(g, "jpeg", rows_per_strip=16)
    info = tiff_info(t)
    assert info["compression"] == 7
    assert info["n_strips"] == 3
    out = decode_tiff(t)
    assert out.dtype == np.uint8 and out.shape == (H, W)
    assert np.array_equal(out, g)


def test_jpeg_rgb_close():
    rgb = _rgb()
    t = encode_tiff(rgb, "jpeg", quality=95)
    assert tiff_info(t)["photometric"] == 6  # YCbCr
    out = decode_tiff(t)
    assert out.shape == (H, W, 3)
    diff = np.abs(out.astype(np.int16) - rgb.astype(np.int16))
    assert diff.max() <= 24 and diff.mean() < 3.0


def test_jpeg_tables_are_shared_across_strips():
    # one DQT segment total (in the JPEGTables tag), none per strip —
    # 0xFFDB cannot appear in entropy data (FF is stuffed as FF00), so
    # marker counts over the whole file are reliable.
    t = encode_tiff(_flat_blocks(H, W), "jpeg", rows_per_strip=8)
    assert tiff_info(t)["n_strips"] == 5
    assert t.count(b"\xff\xdb") == 1  # gray: single shared DQT
    assert t.count(b"\xff\xc4") == 2  # one DC + one AC DHT, shared
    assert t.count(b"\xff\xc0") == 5  # each strip keeps its own SOF


def test_jpeg_full_streams_without_tables_tag():
    # spec-valid alternative layout: no JPEGTables tag, each strip a
    # complete interchange stream — hand-built IFD exercises that path.
    import struct

    from gmft_spark.kernel.jpeg import encode_jpeg

    g = _flat_blocks(24, 32)
    strips = [encode_jpeg(g[:16], quality=90), encode_jpeg(g[16:], quality=90)]
    out = bytearray(struct.pack("<2sHI", b"II", 42, 0))
    offs = []
    for s in strips:
        offs.append(len(out))
        out += s
        if len(out) & 1:
            out += b"\0"
    entries = [
        (256, 4, 1, [32]),
        (257, 4, 1, [24]),
        (258, 3, 1, [8]),
        (259, 3, 1, [7]),
        (262, 3, 1, [1]),
        (273, 4, 2, offs),
        (277, 3, 1, [1]),
        (278, 4, 1, [16]),
        (279, 4, 2, [len(s) for s in strips]),
    ]
    overflow = []
    for tag, typ, n, vals in entries:
        raw = struct.pack(f"<{n}{'H' if typ == 3 else 'I'}", *vals)
        overflow.append((tag, typ, n, raw))
    packed = []
    for tag, typ, n, raw in overflow:
        if len(raw) > 4:
            off = len(out)
            out += raw
            raw = struct.pack("<I", off)
        packed.append((tag, typ, n, raw.ljust(4, b"\0")))
    ifd = len(out)
    out += struct.pack("<H", len(packed))
    for tag, typ, n, v4 in packed:
        out += struct.pack("<HHI", tag, typ, n) + v4
    out += struct.pack("<I", 0)
    struct.pack_into("<I", out, 4, ifd)
    assert np.array_equal(decode_tiff(bytes(out)), g)


def test_jpeg_unsupported_combinations():
    with pytest.raises(ValueError):
        encode_tiff(_gray(), "jpeg", predictor=True)
    with pytest.raises(ValueError):
        encode_tiff(
            _gray(),
            "jpeg",
            colormap=np.zeros((3, 256), dtype=np.uint16),
        )
    # RGB-stored JPEG (photometric 2 + 3 components) is a decode seam
    t = encode_tiff(_rgb(), "jpeg", photometric=2)
    with pytest.raises(NotImplementedError):
        decode_tiff(t)


# ── multimodal seam ──────────────────────────────────────────────────


def test_real_decode_tiff_image():
    from gmft_spark.operators.multimodal import _gray_hist, _real_decode

    g = _gray()
    for payload in (
        encode_tiff(g, "lzw", predictor=True),
        encode_tiff(g, "packbits", big_endian=True),
    ):
        feat, n = _real_decode(payload, "image")
        assert n == 1
        assert np.allclose(feat, _gray_hist(g))
    # lossy-but-flat JPEG strips decode to the exact source pixels
    fb = _flat_blocks(H, W)
    feat, n = _real_decode(encode_tiff(fb, "jpeg", rows_per_strip=16), "image")
    assert n == 1
    assert np.allclose(feat, _gray_hist(fb))
