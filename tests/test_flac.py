"""From-scratch FLAC codec (kernel/flac.py).

Evidence model mirrors the other codec suites: bit-exact roundtrips
(FLAC is lossless) across every subframe type the writer rotates
through — CONSTANT, FIXED 0-2, LPC, wasted bits, multi-partition Rice,
the all-zero escape, and all four stereo decorrelations — plus
hand-corrupted streams for the containment contract (the decoder
verifies header CRC-8, frame CRC-16, and the STREAMINFO MD5)."""

import numpy as np
import pytest

from gmft_spark.kernel.flac import decode_flac, encode_flac, flac_info


def _smooth(n, seed=0):
    t = np.arange(n)
    return (
        2000 * np.sin(t / 29 + seed) + 600 * np.sin(t / 7 + seed * 3)
    ).astype(np.int64)


def test_mono_roundtrip_compresses():
    s = _smooth(3000)
    b = encode_flac(s, 8000)
    out, rate, bps = decode_flac(b)
    assert (rate, bps) == (8000, 16)
    assert np.array_equal(out[:, 0], s)
    assert len(b) < s.size * 2 // 2  # predictive coding actually pays


def test_stereo_rotates_all_modes():
    # block_size 512 over 3000 samples → 6 frames → frame index mod 4
    # covers independent, left/side, side/right, mid/side; mod 5 == 4
    # covers the LPC subframe
    L = _smooth(3000, 1)
    R = (L * 4 // 5) + _smooth(3000, 2) // 8
    st = np.stack([L, R], axis=1)
    b = encode_flac(st, 44100, block_size=512)
    out, rate, _ = decode_flac(b)
    assert rate == 44100
    assert np.array_equal(out, st)


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_bit_depths(bps):
    rng = np.random.default_rng(bps)
    lim = 1 << (bps - 1)
    s = rng.integers(-lim, lim, size=2000)
    b = encode_flac(s, 16000, bps=bps)
    out, _, got_bps = decode_flac(b)
    assert got_bps == bps
    assert np.array_equal(out[:, 0], s)


def test_special_shapes():
    for s in [
        np.full(700, 31),                       # constant
        np.zeros(1300, dtype=np.int64),         # all-zero escape
        np.arange(-600, 600) * 16,              # wasted bits + fixed
        np.array([5]),                          # single sample
        np.r_[np.zeros(512), _smooth(512)],     # zero frame then signal
    ]:
        out, _, _ = decode_flac(encode_flac(s, 8000))
        assert np.array_equal(out[:, 0], s.astype(np.int64)), s[:4]


def test_roundtrip_fuzz():
    rng = np.random.default_rng(99)
    for trial in range(25):
        n = int(rng.integers(1, 5000))
        ch = int(rng.integers(1, 3))
        kind = trial % 3
        if kind == 0:
            s = rng.integers(-32768, 32768, size=(n, ch))
        elif kind == 1:
            base = np.cumsum(rng.integers(-50, 51, size=(n, ch)), axis=0)
            s = np.clip(base, -30000, 30000)
        else:
            s = (
                np.round(
                    8000 * np.sin(np.arange(n) / (1 + trial))
                ).astype(np.int64)[:, None]
                * np.ones((1, ch), dtype=np.int64)
            )
        b = encode_flac(s, 8000 + trial)
        out, rate, _ = decode_flac(b)
        assert rate == 8000 + trial
        assert np.array_equal(out, np.asarray(s).reshape(n, ch)), (
            trial,
            n,
            ch,
        )


def test_info_probe():
    s = np.stack([_smooth(2500), _smooth(2500, 5)], axis=1)
    info = flac_info(encode_flac(s, 22050))
    assert info["sample_rate"] == 22050
    assert info["channels"] == 2
    assert info["bits_per_sample"] == 16
    assert info["total_samples"] == 2500


def test_containment():
    good = bytearray(encode_flac(_smooth(1200), 8000))
    with pytest.raises(ValueError):
        decode_flac(b"NOTF" + bytes(good[4:]))
    with pytest.raises(ValueError):
        decode_flac(bytes(good[:40]))  # truncated mid-metadata/frame
    # flip one bit in the audio payload → a frame CRC-16 (or the MD5)
    # must catch it
    corrupt = bytearray(good)
    corrupt[-10] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(corrupt))
    # corrupt the frame header → CRC-8 catches it
    hdr_corrupt = bytearray(good)
    # find the first frame: after fLaC + 4-byte block header + 34 bytes
    off = 4 + 4 + 34
    hdr_corrupt[off + 2] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(hdr_corrupt))
    # MD5 mismatch: rewrite STREAMINFO md5 field
    md5_corrupt = bytearray(good)
    md5_corrupt[4 + 4 + 18] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(md5_corrupt))
    with pytest.raises(ValueError):
        encode_flac(np.array([40000]), 8000)  # overflows 16-bit
    with pytest.raises(ValueError):
        encode_flac(np.zeros((0,)), 8000)


def test_every_frame_crc_verified():
    # deterministic sweep: flipping ANY single payload byte at or past
    # the first frame must raise (CRC-8, CRC-16, or MD5)
    s = _smooth(600)
    good = encode_flac(s, 8000, block_size=256)
    start = 4 + 4 + 34
    for i in range(start, len(good), 7):
        bad = bytearray(good)
        bad[i] ^= 0x04
        try:
            out, _, _ = decode_flac(bytes(bad))
        except ValueError:
            continue
        # escaped detection would mean corruption decoded silently
        raise AssertionError(f"byte {i} flip went undetected")


def test_streaminfo_block_sizes_exclude_short_last_block():
    """RFC 9639: a shorter final block does not count toward min/max
    block size — min != max would mark a fixed-blocking stream as
    variable-blocksize (review fix)."""
    s = _smooth(2500)  # 1024, 1024, 452
    info = flac_info(encode_flac(s, 8000, block_size=1024))
    assert info["min_block_size"] == info["max_block_size"] == 1024
    # a single sub-block stream is its own (equal) size
    short = flac_info(encode_flac(_smooth(300), 8000, block_size=1024))
    assert short["min_block_size"] == short["max_block_size"] == 300
