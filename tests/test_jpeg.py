"""From-scratch baseline JPEG codec (kernel/jpeg.py).

Evidence model mirrors the PNG codec's: roundtrip error bounds on the
lossy path, byte-level determinism goldens (any arithmetic drift in the
DCT/quantizer/Huffman coder flips the pinned hashes), decoder coverage
of subsampling + restart markers via the encoder's own options, and the
shared untrusted-input containment contract (ValueError for malformed
streams, NotImplementedError only for genuine format gaps)."""

import hashlib

import numpy as np
import pytest

from gmft_spark.kernel.jpeg import (
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    probe_jpeg,
)

# 41x53 exercises edge-block padding on both axes (neither a multiple
# of 8 nor, for the 420 path, of 16)
H, W = 41, 53


def _gray() -> np.ndarray:
    return (
        (np.arange(H)[:, None] * 3 + np.arange(W)[None, :] * 5) % 256
    ).astype(np.uint8)


def _rgb_smooth() -> np.ndarray:
    r = ((np.arange(H)[:, None] + np.arange(W)[None, :]) % 256).astype(
        np.uint8
    )
    return np.stack([r, (r // 2 + 30).astype(np.uint8), 255 - r], axis=-1)


def test_zigzag_is_the_spec_scan():
    assert sorted(_ZIGZAG.tolist()) == list(range(64))
    # the T.81 scan's first diagonal sweeps, row-major flat indices
    assert _ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    # scan 61 = cell (6,7), 62 = (7,6), 63 = (7,7) per the T.81 figure
    assert _ZIGZAG[-3:].tolist() == [55, 62, 63]


def test_gray_roundtrip_error_bounds():
    x = _gray()
    y = decode_jpeg(encode_jpeg(x, quality=92))
    assert y.shape == x.shape and y.dtype == np.uint8
    err = np.abs(y.astype(int) - x.astype(int))
    assert err.max() <= 16
    assert err.mean() < 1.5


def test_flat_block_is_lossless():
    # a constant plane is pure DC; DC quantization of an exact multiple
    # reconstructs exactly
    f = np.full((16, 16), 128, np.uint8)
    assert (decode_jpeg(encode_jpeg(f, quality=90)) == 128).all()


def test_rgb_444_roundtrip():
    x = _rgb_smooth()
    y = decode_jpeg(encode_jpeg(x, quality=92))
    assert y.shape == x.shape
    err = np.abs(y.astype(int) - x.astype(int))
    assert err.mean() < 2.0 and err.max() <= 32


def test_rgb_420_roundtrip_smooth_chroma():
    x = _rgb_smooth()
    y = decode_jpeg(encode_jpeg(x, quality=92, subsampling="420"))
    assert y.shape == x.shape
    err = np.abs(y.astype(int) - x.astype(int))
    assert err.max() <= 12 and err.mean() < 1.5


def test_restart_markers_do_not_change_pixels():
    x = _gray()
    base = decode_jpeg(encode_jpeg(x, quality=92))
    with_rst = decode_jpeg(encode_jpeg(x, quality=92, restart_interval=3))
    assert (base == with_rst).all()
    rgb = _rgb_smooth()
    base3 = decode_jpeg(encode_jpeg(rgb, quality=92))
    rst3 = decode_jpeg(encode_jpeg(rgb, quality=92, restart_interval=2))
    assert (base3 == rst3).all()


def test_encode_decode_determinism_goldens():
    x = _gray()
    b = encode_jpeg(x, quality=92)
    assert (
        hashlib.sha256(b).hexdigest()
        == "05742f123ed2fb6f3d106d2d95a42dc1628dc70221e56436b77e383142732efb"
    )
    assert (
        hashlib.sha256(decode_jpeg(b).tobytes()).hexdigest()
        == "07719290ea7d86cc719e9f6aaba383e84418c32588c96fd329ee67583c1e337e"
    )


def test_probe_reads_header_only():
    b = encode_jpeg(_gray(), quality=80)
    assert probe_jpeg(b) == {
        "width": W,
        "height": H,
        "n_components": 1,
        "progressive": False,
    }
    b3 = encode_jpeg(_rgb_smooth(), quality=80, subsampling="420")
    info = probe_jpeg(b3)
    assert (info["width"], info["height"], info["n_components"]) == (W, H, 3)


def test_containment_contract():
    b = encode_jpeg(_gray())
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02\x03")  # not a JPEG
    with pytest.raises(ValueError):
        decode_jpeg(b[: len(b) // 2])  # truncated entropy stream
    with pytest.raises(ValueError):
        # garbage entropy bytes: flip a run in the middle of the scan
        decode_jpeg(b[:-40] + b"\xaa" * 38 + b[-2:])
    # a baseline stream relabeled SOF2 is MALFORMED progressive (its
    # single scan claims Ss=0/Se=63, illegal for a progressive DC scan)
    prog = b.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert probe_jpeg(prog)["progressive"] is True
    with pytest.raises(ValueError):
        decode_jpeg(prog)


def test_hostile_sof_dimensions_capped():
    b = bytearray(encode_jpeg(_gray()))
    i = b.find(b"\xff\xc0")
    # SOF payload: len(2) prec(1) H(2) W(2) — claim a 16384x16384 image
    b[i + 5 : i + 9] = (1 << 14).to_bytes(2, "big") * 2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(b))


def test_decoder_rejects_bad_huffman_stream():
    # a DHT with too few symbols for its counts is malformed, not fatal
    b = bytearray(encode_jpeg(_gray()))
    i = b.find(b"\xff\xc4")
    # shrink the declared segment length so symbol bytes go missing
    with pytest.raises(ValueError):
        decode_jpeg(bytes(b[: i + 8]))


# --- progressive (SOF2) -------------------------------------------------
# Correctness anchor: progressive and baseline encoding of the SAME
# image at the SAME quality quantize to identical coefficient stores,
# so both decodes must be pixel-identical. Any drift in the scan-script
# emitters or the successive-approximation decode breaks the equality.

from gmft_spark.kernel.jpeg import encode_jpeg_progressive  # noqa: E402


def test_progressive_probe_and_marker():
    data = encode_jpeg_progressive(_gray(), quality=85)
    info = probe_jpeg(data)
    assert info == {
        "width": W,
        "height": H,
        "n_components": 1,
        "progressive": True,
    }


def test_progressive_equals_baseline_gray():
    for q in (30, 50, 85, 95):
        base = decode_jpeg(encode_jpeg(_gray(), quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(_gray(), quality=q))
        assert np.array_equal(base, prog), f"quality {q}"


def test_progressive_equals_baseline_color():
    rgb = _rgb_smooth()
    for sub in ("444", "420"):
        base = decode_jpeg(encode_jpeg(rgb, quality=80, subsampling=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(rgb, quality=80, subsampling=sub)
        )
        assert np.array_equal(base, prog), sub


def test_progressive_random_sweep():
    """Random content at odd geometries — exercises EOB runs spanning
    blocks, ZRL-in-refinement, buffered correction bits, and the
    non-interleaved used-vs-padded block grids."""
    rng = np.random.default_rng(11)
    for _ in range(6):
        h = int(rng.integers(8, 70))
        w = int(rng.integers(8, 70))
        gray = rng.integers(0, 256, (h, w)).astype(np.uint8)
        for q in (50, 90):
            assert np.array_equal(
                decode_jpeg(encode_jpeg(gray, quality=q)),
                decode_jpeg(encode_jpeg_progressive(gray, quality=q)),
            ), (h, w, q)
    for _ in range(3):
        h = int(rng.integers(9, 50))
        w = int(rng.integers(9, 50))
        rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        for sub in ("444", "420"):
            assert np.array_equal(
                decode_jpeg(encode_jpeg(rgb, quality=60, subsampling=sub)),
                decode_jpeg(
                    encode_jpeg_progressive(rgb, quality=60, subsampling=sub)
                ),
            ), (h, w, sub)


def test_progressive_smooth_and_flat():
    # smooth gradients → long EOB runs; flat → DC-only blocks
    smooth = (np.add.outer(np.arange(64), np.arange(96)) // 4).astype(
        np.uint8
    )
    flat = np.full((40, 56), 77, np.uint8)
    for img in (smooth, flat):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img, quality=85)),
            decode_jpeg(encode_jpeg_progressive(img, quality=85)),
        )


def test_progressive_determinism_golden():
    data = encode_jpeg_progressive(_gray(), quality=85)
    assert (
        hashlib.sha256(data).hexdigest()
        == "6c7082acd2e3f4110a4d4cb67858dbb0454cbfb1b9fdeaf098863c258ffd5844"
    )


def test_progressive_truncated_scan_is_value_error():
    data = encode_jpeg_progressive(_gray(), quality=85)
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) * 2 // 3])
