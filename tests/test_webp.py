"""From-scratch WebP-lossless / VP8L codec (kernel/webp.py).

Evidence model mirrors the other codec suites: bit-exact roundtrips
across every decoder feature (plain literals, LZ77 with and without
the near-distance plane, all four transforms, every predictor mode,
color cache, meta-prefix groups, sub-byte palette packing, RGBA), the
distance-plane table pinned against the spec's published entries, and
the untrusted-input containment contract."""

import struct

import numpy as np
import pytest

from gmft_spark.kernel.webp import (
    _PLANE,
    decode_webp,
    encode_webp_lossless,
    webp_info,
)

H, W = 29, 37


def _gray() -> np.ndarray:
    return ((np.arange(H)[:, None] * 5 + np.arange(W)[None, :] * 3) % 256).astype(
        np.uint8
    )


def _grad() -> np.ndarray:
    g = _gray().astype(np.int32)
    return np.stack([g, (g + 80) % 256, (g * 3) % 256], axis=2).astype(
        np.uint8
    )


def _runs() -> np.ndarray:
    r = (_gray() // 32 * 32).astype(np.uint8)
    return np.stack([r, r, 255 - r], axis=2).astype(np.uint8)


def test_distance_plane_matches_spec():
    # head of the published table (RFC 9649) and the d^2 = 25 tie run
    assert _PLANE[:10] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2),
        (2, 0), (1, 2), (-1, 2), (2, 1), (-2, 1),
    ]
    assert _PLANE[34:40] == [
        (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    ]
    assert len(_PLANE) == 120
    assert all(dy > 0 or dx > 0 for dx, dy in _PLANE)


def test_plain_roundtrip_and_info():
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
    b = encode_webp_lossless(rgb, use_lz77=False)
    info = webp_info(b)
    assert (info["format"], info["width"], info["height"]) == ("VP8L", W, H)
    assert not info["has_alpha"]
    assert np.array_equal(decode_webp(b), rgb)


@pytest.mark.parametrize("plane", [False, True])
def test_lz77_roundtrip_compresses(plane):
    img = _runs()
    b = encode_webp_lossless(img, plane_codes=plane)
    assert len(b) < len(encode_webp_lossless(img, use_lz77=False)) // 3
    assert np.array_equal(decode_webp(b), img)


@pytest.mark.parametrize("mode", list(range(14)))
def test_every_predictor_mode(mode):
    img = _grad()
    b = encode_webp_lossless(img, predictor=mode, use_lz77=False)
    assert np.array_equal(decode_webp(b), img)


@pytest.mark.parametrize(
    "ct", [(32, 0, 0), (0, 44, 0), (0, 0, 200), (190, 33, 77)]
)
def test_color_transform(ct):
    img = _grad()
    b = encode_webp_lossless(img, color_transform=ct, use_lz77=False)
    assert np.array_equal(decode_webp(b), img)


def test_subtract_green():
    img = _grad()
    b = encode_webp_lossless(img, subtract_green=True)
    assert np.array_equal(decode_webp(b), img)


@pytest.mark.parametrize("ncol", [2, 4, 14, 60])
def test_palette_all_packings(ncol):
    idx = _gray() % ncol
    img = np.stack(
        [(idx * 17) % 256, (idx * 43) % 256, (idx * 91) % 256], axis=2
    ).astype(np.uint8)
    b = encode_webp_lossless(img, palette=True, use_lz77=False)
    assert np.array_equal(decode_webp(b), img)


def test_color_cache_and_meta_groups():
    img = _runs()
    for kwargs in (
        {"cache_bits": 6, "use_lz77": False},
        {"cache_bits": 8},
        {"meta_bits": 3, "use_lz77": False},
        {"meta_bits": 4, "cache_bits": 5},
        {
            "meta_bits": 3,
            "cache_bits": 4,
            "subtract_green": True,
            "plane_codes": True,
        },
    ):
        b = encode_webp_lossless(img, **kwargs)
        assert np.array_equal(decode_webp(b), img), kwargs


def test_rgba_roundtrip():
    g = _gray()
    rgba = np.concatenate(
        [_grad(), ((g.astype(np.int32) * 2) % 256).astype(np.uint8)[..., None]],
        axis=2,
    )
    b = encode_webp_lossless(rgba)
    assert webp_info(b)["has_alpha"]
    out = decode_webp(b)
    assert out.shape == (H, W, 4)
    assert np.array_equal(out, rgba)
    # all-opaque alpha collapses to RGB on decode
    opaque = rgba.copy()
    opaque[:, :, 3] = 255
    assert decode_webp(encode_webp_lossless(opaque)).shape == (H, W, 3)


def test_one_pixel_and_one_column():
    for shape in ((1, 1, 3), (5, 1, 3), (1, 7, 3)):
        img = (np.arange(np.prod(shape)) % 256).astype(np.uint8).reshape(shape)
        assert np.array_equal(
            decode_webp(encode_webp_lossless(img)), img
        )


def test_containment():
    with pytest.raises(ValueError):
        decode_webp(b"RIFFxxxxNOPE")
    good = encode_webp_lossless(_grad())
    with pytest.raises(ValueError):
        decode_webp(good[:40])  # truncated bitstream
    # lossy VP8 is a named seam, not bad data
    lossy = bytearray(good)
    lossy[12:16] = b"VP8 "
    with pytest.raises(NotImplementedError):
        decode_webp(bytes(lossy))
    # bad signature byte
    bad = bytearray(good)
    bad[20] = 0x2E
    with pytest.raises(ValueError):
        decode_webp(bytes(bad))
    # hostile dimensions
    huge = bytearray(good)
    # width-1 / height-1 live in the 28 bits after the signature byte
    packed = (16383) | (16383 << 14)
    struct.pack_into("<I", huge, 21, packed | (huge[24] >> 4 << 28))
    with pytest.raises(ValueError):
        decode_webp(bytes(huge))
    with pytest.raises(ValueError):
        encode_webp_lossless(np.zeros((2, 2), dtype=np.uint8))


# ── animated WebP (VP8X / ANIM / ANMF) ───────────────────────────────


def _anim_frame(k):
    g = (
        (np.arange(20)[:, None] * 5 + np.arange(28)[None, :] * 3 + 29 * k)
        % 256
    ).astype(np.uint8)
    return np.stack(
        [g, (g.astype(int) + 50) % 256, (g.astype(int) * 3) % 256], axis=2
    ).astype(np.uint8)


def test_anim_roundtrip_and_stride():
    from gmft_spark.kernel.webp import decode_webp_frames, encode_webp_anim

    frames = [_anim_frame(k) for k in range(5)]
    b = encode_webp_anim(frames, duration_ms=80)
    info = webp_info(b)
    assert (info["format"], info["n_frames"]) == ("VP8X", 5)
    out = decode_webp_frames(b)
    assert len(out) == 5
    assert all(np.array_equal(a, e) for a, e in zip(out, frames))
    # decode_webp on an animation = first composed frame
    assert np.array_equal(decode_webp(b), frames[0])
    # stride samples DISPLAYED frames but still composes every delta
    assert len(decode_webp_frames(b, frame_stride=2)) == 3


def test_anim_offsets_dispose_and_blend():
    from gmft_spark.kernel.webp import decode_webp_frames, encode_webp_anim

    base = _anim_frame(0)
    patch = _anim_frame(9)[:8, :12]
    b = encode_webp_anim(
        [base, patch, _anim_frame(1)],
        offsets=[(0, 0), (6, 4), (0, 0)],
        canvas=(28, 20),
    )
    out = decode_webp_frames(b)
    exp1 = base.copy()
    exp1[4:12, 6:18] = patch
    assert np.array_equal(out[1], exp1)
    assert np.array_equal(out[2], _anim_frame(1))
    # dispose: an offset frame on a cleared canvas → transparent RGBA
    b2 = encode_webp_anim(
        [patch], offsets=[(6, 4)], canvas=(28, 20), dispose=True
    )
    o = decode_webp_frames(b2)[0]
    assert o.shape == (20, 28, 4)
    assert np.array_equal(o[4:12, 6:18, :3], patch)
    assert (o[:4, :, 3] == 0).all()  # outside the rect: transparent
    # blend: semi-transparent overlay composites with integer math
    rgba = np.concatenate(
        [patch, np.full((8, 12, 1), 128, np.uint8)], axis=2
    )
    b3 = encode_webp_anim(
        [base, rgba], offsets=[(0, 0), (6, 4)], canvas=(28, 20), blend=True
    )
    got = decode_webp_frames(b3)[1][4:12, 6:18, :3].astype(np.int64)
    fa, ca = 128, 255 * (255 - 128) // 255
    exp = (
        patch.astype(np.int64) * fa + base[4:12, 6:18].astype(np.int64) * ca
    ) // (fa + ca)
    assert np.abs(got - exp).max() == 0


def test_anim_containment():
    from gmft_spark.kernel.webp import decode_webp_frames, encode_webp_anim

    with pytest.raises(ValueError):
        encode_webp_anim([])
    with pytest.raises(ValueError):
        encode_webp_anim([_anim_frame(0)], offsets=[(1, 0)])  # odd offset
    with pytest.raises(ValueError):
        encode_webp_anim([_anim_frame(0)], canvas=(4, 4))  # too small
    b = bytearray(encode_webp_anim([_anim_frame(0)]))
    with pytest.raises(ValueError):
        decode_webp_frames(bytes(b[:40]))  # truncated chunk
    # a lossy frame inside the animation is a named seam
    i = bytes(b).find(b"VP8L", 30)
    lossy = bytes(b[:i]) + b"VP8 " + bytes(b[i + 4 :])
    with pytest.raises(NotImplementedError):
        decode_webp_frames(lossy)


def test_real_decode_webp_video_modality():
    from gmft_spark.kernel.webp import encode_webp_anim
    from gmft_spark.operators.multimodal import _real_decode

    frames = [_anim_frame(k) for k in range(6)]
    feat, n = _real_decode(encode_webp_anim(frames), "video")
    assert n == 2  # 6 frames at the default stride 4 → ceil(6/4)
    assert abs(sum(feat) - 1.0) < 1e-3


def test_real_decode_webp_image():
    from gmft_spark.operators.multimodal import _gray_hist, _real_decode

    img = _grad()
    feat, n = _real_decode(encode_webp_lossless(img), "image")
    assert n == 1
    assert np.allclose(feat, _gray_hist(img))
