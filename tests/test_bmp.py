"""From-scratch BMP codec (kernel/bmp.py).

Evidence model mirrors the other codec suites: bit-exact roundtrips
across every supported depth/row-order/compression (RLE4 roundtrips
cover both its encoded alternating-nibble runs and absolute mode),
hand-built streams for decoder-only features (RLE8/RLE4
delta/early-EOB escapes), and the untrusted-input containment contract
(ValueError for malformed streams, NotImplementedError only for
genuine format gaps)."""

import struct

import numpy as np
import pytest

from gmft_spark.kernel.bmp import bmp_info, decode_bmp, encode_bmp

H, W = 21, 37  # odd width: every sub-byte depth exercises row padding


def _rgb() -> np.ndarray:
    g = (np.arange(H)[:, None] * 5 + np.arange(W)[None, :] * 11) % 256
    return np.stack([g, (g + 85) % 256, (g * 3) % 256], axis=2).astype(
        np.uint8
    )


def _gray() -> np.ndarray:
    return ((np.arange(H)[:, None] * 7 + np.arange(W)[None, :]) % 256).astype(
        np.uint8
    )


@pytest.mark.parametrize("bits", [24, 32])
@pytest.mark.parametrize("top_down", [False, True])
def test_truecolor_roundtrip(bits, top_down):
    rgb = _rgb()
    b = encode_bmp(rgb, bits=bits, top_down=top_down)
    info = bmp_info(b)
    assert (info["width"], info["height"]) == (W, H)
    assert info["top_down"] == top_down
    assert np.array_equal(decode_bmp(b), rgb)


@pytest.mark.parametrize("top_down", [False, True])
def test_gray8_roundtrip(top_down):
    g = _gray()
    out = decode_bmp(encode_bmp(g, bits=8, top_down=top_down))
    assert np.array_equal(out, np.stack([g, g, g], axis=2))


def test_palette8_roundtrip():
    idx = (_gray() % 5).astype(np.uint8)
    pal = np.array(
        [[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9], [77, 1, 200]],
        dtype=np.uint8,
    )
    out = decode_bmp(encode_bmp(idx, bits=8, palette=pal))
    assert np.array_equal(out, pal[idx])


def test_4bit_roundtrip():
    idx = (_gray() % 16).astype(np.uint8)
    out = decode_bmp(encode_bmp(idx, bits=4))
    g16 = np.arange(0, 256, 1, dtype=np.uint8)[: 1 << 4]
    pal = np.stack([g16, g16, g16], axis=1)
    assert np.array_equal(out, pal[idx])


def test_1bit_roundtrip():
    bm = ((_gray() & 1) == 1).astype(np.uint8)
    out = decode_bmp(encode_bmp(bm, bits=1))
    expect = np.repeat(
        np.where(bm[:, :, None] > 0, 255, 0).astype(np.uint8), 3, axis=2
    )
    assert np.array_equal(out, expect)


@pytest.mark.parametrize("top_down", [False, True])
def test_rle8_roundtrip(top_down):
    g = (_gray() // 32 * 32).astype(np.uint8)  # runs to compress
    b = encode_bmp(g, bits=8, rle=True, top_down=top_down)
    assert bmp_info(b)["compression"] == 1
    assert np.array_equal(decode_bmp(b), np.stack([g, g, g], axis=2))


@pytest.mark.parametrize("top_down", [False, True])
def test_rle4_roundtrip(top_down):
    # quantized gradient: long alternating and solid runs plus literal
    # stretches → both encoded and absolute modes appear in the stream
    idx = ((_gray() // 24) % 16).astype(np.uint8)
    b = encode_bmp(idx, bits=4, rle=True, top_down=top_down)
    assert bmp_info(b)["compression"] == 2
    g16 = np.arange(16, dtype=np.uint8)
    pal = np.stack([g16, g16, g16], axis=1)
    assert np.array_equal(decode_bmp(b), pal[idx])


def test_rle4_roundtrip_fuzz():
    rng = np.random.default_rng(414)
    for _ in range(40):
        h = int(rng.integers(1, 9))
        w = int(rng.integers(1, 40))
        # mix solid runs, alternating pairs, and noise
        kind = int(rng.integers(0, 3))
        if kind == 0:
            idx = rng.integers(0, 16, size=(h, w)).astype(np.uint8)
        elif kind == 1:
            idx = np.tile(
                rng.integers(0, 16, size=(h, 2)).astype(np.uint8),
                (1, (w + 1) // 2),
            )[:, :w]
        else:
            idx = np.repeat(
                rng.integers(0, 16, size=(h, (w + 4) // 5)), 5, axis=1
            )[:, :w].astype(np.uint8)
        out = decode_bmp(encode_bmp(idx, bits=4, rle=True))
        assert np.array_equal(out[:, :, 0], idx), (h, w, kind)


def test_rle4_hand_built_escapes():
    # alternating encoded run, absolute run (odd count, word pad),
    # delta skip, early EOB — the decoder-only escape paths
    body = bytes(
        [
            5, 0x7_3,     # 5 px alternating 7,3,7,3,7
            0, 3, 0x12, 0x30,  # absolute: nibbles 1,2,3 (2 B, aligned)
            0, 2, 1, 1,   # delta: x += 1, y += 1
            2, 0x9_0 | 0x4,  # 2 px: 9 then 4
            0, 1,         # end of bitmap
        ]
    )
    quads = np.zeros((16, 4), dtype=np.uint8)
    quads[:, :3] = np.arange(16, dtype=np.uint8)[:, None] * 16
    data_off = 14 + 40 + 64
    info = struct.pack(
        "<IiiHHIIiiII", 40, 12, -3, 1, 4, 2, len(body), 0, 0, 16, 0
    )
    head = struct.pack(
        "<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off
    )
    out = decode_bmp(head + info + quads.tobytes() + body)
    assert out.shape == (3, 12, 3)
    row0 = out[0, :, 0] // 16
    assert list(row0[:8]) == [7, 3, 7, 3, 7, 1, 2, 3]
    assert (row0[8:] == 0).all()
    # delta moved the pen from (8, 0) to (9, 1)
    row1 = out[1, :, 0] // 16
    assert list(row1[9:11]) == [9, 4]
    assert (out[2] == 0).all()


def test_rle8_delta_and_early_eob():
    # hand-built stream: run, delta skip (filled with palette 0), EOB
    # before the last rows (remainder stays index 0)
    body = bytes(
        [
            3, 7,        # 3 px of color 7 at (0..2, row 0)
            0, 2, 2, 1,  # delta: x += 2, y += 1 → (5, row 1)
            2, 9,        # 2 px of color 9
            0, 1,        # end of bitmap
        ]
    )
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[7] = (10, 20, 30)
    pal[9] = (40, 50, 60)
    quads = np.zeros((256, 4), dtype=np.uint8)
    quads[:, :3] = pal[:, ::-1]
    data_off = 14 + 40 + 1024
    info = struct.pack(
        "<IiiHHIIiiII", 40, 8, -4, 1, 8, 1, len(body), 0, 0, 256, 0
    )
    head = struct.pack(
        "<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off
    )
    out = decode_bmp(head + info + quads.tobytes() + body)
    assert out.shape == (4, 8, 3)
    assert np.array_equal(out[0, 0], (10, 20, 30))
    assert np.array_equal(out[0, 2], (10, 20, 30))
    assert np.array_equal(out[1, 5], (40, 50, 60))
    assert np.array_equal(out[1, 6], (40, 50, 60))
    assert (out[2:] == 0).all()


def test_v5_header_sizes_parse():
    # re-frame a 24-bit file with a 124-byte (V5) info header
    rgb = _rgb()
    b = encode_bmp(rgb)
    (old_off,) = struct.unpack_from("<I", b, 10)
    extra = 124 - 40
    body = b[14:54] + b"\x00" * extra + b[54:]
    body = bytearray(body)
    struct.pack_into("<I", body, 0, 124)
    head = struct.pack(
        "<2sIHHI", b"BM", 14 + len(body), 0, 0, old_off + extra
    )
    assert np.array_equal(decode_bmp(head + bytes(body)), rgb)


def test_canonical_bitfields_32bit():
    rgb = _rgb()
    b = bytearray(encode_bmp(rgb, bits=32))
    struct.pack_into("<I", b, 30, 3)  # BI_BITFIELDS
    # masks live where the palette would start (canonical 888)
    masked = bytes(b[:54]) + struct.pack("<III", 0xFF0000, 0xFF00, 0xFF)
    # shift data offset past the masks
    out = bytearray(masked + bytes(b[54:]))
    struct.pack_into("<I", out, 10, 54 + 12)
    assert np.array_equal(decode_bmp(bytes(out)), rgb)
    # non-canonical masks are a named seam
    bad = bytearray(out)
    struct.pack_into("<III", bad, 54, 0xFF, 0xFF00, 0xFF0000)
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(bad))


def test_os2_core_header_decodes():
    # hand-built BITMAPCOREHEADER file: 12-byte header, BGR-triple
    # palette, 8-bit indices, bottom-up rows
    idx = (_gray() % 5).astype(np.uint8)
    pal = np.array(
        [[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9], [77, 1, 200]],
        dtype=np.uint8,
    )
    n = 5
    stride = (W + 3) // 4 * 4
    rows = np.zeros((H, stride), dtype=np.uint8)
    rows[:, :W] = idx[::-1]
    pal_bytes = pal[:, ::-1].tobytes()  # RGB → BGR triples
    data_off = 14 + 12 + 3 * 256  # core palettes are 2^bits entries
    full_pal = np.zeros((256, 3), dtype=np.uint8)
    full_pal[:n] = pal[:, ::-1]
    core = struct.pack("<IHHHH", 12, W, H, 1, 8)
    head = struct.pack(
        "<2sIHHI", b"BM", data_off + rows.size, 0, 0, data_off
    )
    b = head + core + full_pal.tobytes() + rows.tobytes()
    info = bmp_info(b)
    assert (info["width"], info["height"], info["bits"]) == (W, H, 8)
    assert np.array_equal(decode_bmp(b), pal[idx])
    # 24-bit core file
    rgb = _rgb()
    stride24 = (3 * W + 3) // 4 * 4
    rows24 = np.zeros((H, stride24), dtype=np.uint8)
    rows24[:, : 3 * W] = rgb[::-1, :, ::-1].reshape(H, 3 * W)
    core24 = struct.pack("<IHHHH", 12, W, H, 1, 24)
    head24 = struct.pack(
        "<2sIHHI", b"BM", 14 + 12 + rows24.size, 0, 0, 14 + 12
    )
    assert np.array_equal(
        decode_bmp(head24 + core24 + rows24.tobytes()), rgb
    )
    # unknown in-between header size stays a named seam
    weird = bytearray(head + core + full_pal.tobytes() + rows.tobytes())
    struct.pack_into("<I", weird, 14, 16)
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(weird))


def test_containment():
    with pytest.raises(ValueError):
        decode_bmp(b"BMshort")
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + b"\x00" * 60)
    good = encode_bmp(_rgb())
    with pytest.raises(ValueError):
        decode_bmp(good[:70])  # pixel data truncated
    huge = bytearray(good)
    struct.pack_into("<ii", huge, 18, 100_000, 100_000)
    with pytest.raises(ValueError):
        decode_bmp(bytes(huge))
    rle4 = bytearray(encode_bmp(_gray(), bits=8, rle=True))
    struct.pack_into("<I", rle4, 30, 2)  # BI_RLE4 claimed on 8-bit px
    with pytest.raises(ValueError):
        decode_bmp(bytes(rle4))
    with pytest.raises(ValueError):
        encode_bmp((_gray() & 1).astype(np.uint8), bits=1, rle=True)
    with pytest.raises(ValueError):
        encode_bmp(_rgb(), bits=8)  # RGB into a palette depth
    with pytest.raises(ValueError):
        encode_bmp(_gray(), bits=4)  # values overflow 4-bit palette
    with pytest.raises(ValueError):
        encode_bmp(_gray(), bits=24)
    with pytest.raises(ValueError):
        encode_bmp(_rgb(), rle=True)


def test_real_decode_bmp_image():
    from gmft_spark.operators.multimodal import _gray_hist, _real_decode

    g = _gray()
    feat, n = _real_decode(encode_bmp(g, bits=8), "image")
    assert n == 1
    assert np.allclose(feat, _gray_hist(np.stack([g, g, g], axis=2)))
