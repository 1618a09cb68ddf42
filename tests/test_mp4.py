"""From-scratch ISO-BMFF (MP4) MJPEG container (kernel/mp4.py).

Evidence model mirrors the AVI suite: per-frame pixel equality against
the bare JPEG codec (the container must be a transparent wrapper),
stride-sampling semantics, sample-table resolution through probe, and
the untrusted-input containment contract."""

import struct

import numpy as np
import pytest

from gmft_spark.kernel.jpeg import decode_jpeg, encode_jpeg
from gmft_spark.kernel.mp4 import decode_mp4_frames, encode_mp4, probe_mp4


def _frames(n=7, h=24, w=32):
    return [
        (
            (np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 2 + k * 29)
            % 256
        ).astype(np.uint8)
        for k in range(n)
    ]


def test_roundtrip_matches_bare_jpeg():
    frames = _frames()
    p = encode_mp4(frames, fps=8, quality=88)
    dec = decode_mp4_frames(p)
    assert len(dec) == len(frames)
    for k, f in enumerate(frames):
        assert np.array_equal(dec[k], decode_jpeg(encode_jpeg(f, 88))), k


def test_flat_frames_exact():
    flat = [
        np.full((16, 24), (17 * k + 5) % 256, dtype=np.uint8)
        for k in range(5)
    ]
    p = encode_mp4(flat, fps=4, quality=90)
    dec = decode_mp4_frames(p)
    for k, px in enumerate(dec):
        assert px.min() == px.max() == (17 * k + 5) % 256, k


def test_stride_sampling():
    frames = _frames(9)
    p = encode_mp4(frames, fps=8)
    full = decode_mp4_frames(p)
    s3 = decode_mp4_frames(p, frame_stride=3)
    assert len(s3) == 3
    assert np.array_equal(s3[1], full[3])
    assert np.array_equal(s3[2], full[6])
    with pytest.raises(ValueError):
        decode_mp4_frames(p, frame_stride=0)


def test_probe():
    p = encode_mp4(_frames(7), fps=8)
    info = probe_mp4(p)
    assert info == {
        "codec": "jpeg",
        "width": 32,
        "height": 24,
        "n_frames": 7,
        "duration_ms": 875,
    }


def test_rgb_frames():
    g = _frames(3)
    rgb = [np.stack([f, f, f], axis=2) for f in g]
    p = encode_mp4(rgb, fps=5, quality=85)
    dec = decode_mp4_frames(p)
    assert dec[0].ndim == 3 and dec[0].shape == (24, 32, 3)


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_mp4([], fps=5)
    with pytest.raises(ValueError):
        encode_mp4(
            [np.zeros((8, 8), np.uint8), np.zeros((8, 9), np.uint8)]
        )


def test_malformed_rejected():
    p = encode_mp4(_frames(3), fps=5)
    with pytest.raises(ValueError):
        decode_mp4_frames(b"\x00" * 20)  # no ftyp
    with pytest.raises(ValueError):
        decode_mp4_frames(p[: len(p) // 2])  # moov truncated away
    # corrupt a sample-table box size
    bad = bytearray(p)
    i = bad.find(b"stsz")
    struct.pack_into(">I", bad, i - 4, 4)  # shrink stsz to nothing
    with pytest.raises(ValueError):
        decode_mp4_frames(bytes(bad))


def test_foreign_codec_is_a_seam():
    p = bytearray(encode_mp4(_frames(3), fps=5))
    i = p.find(b"jpeg", p.find(b"stsd"))
    p[i : i + 4] = b"avc1"
    with pytest.raises(NotImplementedError):
        decode_mp4_frames(bytes(p))
    # probe still resolves the tables without decoding
    assert probe_mp4(bytes(p))["codec"] == "avc1"


def test_hostile_sample_count_capped():
    p = bytearray(encode_mp4(_frames(3), fps=5))
    i = p.find(b"stsz")
    struct.pack_into(">I", p, i + 12, 1 << 20)  # claim 1M samples
    with pytest.raises(ValueError):
        decode_mp4_frames(bytes(p))


def test_real_decode_mp4_video():
    from gmft_spark.operators.multimodal import _gray_hist, _real_decode

    frames = _frames(8)
    p = encode_mp4(frames, fps=8, quality=88)
    feat, n = _real_decode(p, "video", frame_stride=4)
    assert n == 2  # ceil(8/4)
    want = np.mean(
        [
            _gray_hist(decode_jpeg(encode_jpeg(frames[k], 88)))
            for k in (0, 4)
        ],
        axis=0,
    )
    assert np.allclose(feat, want)


def test_mdhd_version1_timescale_duration():
    """mdhd v1 shifts timescale/duration past the 64-bit times (review
    fix: v0 offsets read garbage there)."""
    import numpy as np
    import struct as _s

    from gmft_spark.kernel.mp4 import encode_mp4, probe_mp4

    frames = [np.full((8, 8), 90, dtype=np.uint8)] * 4
    data = bytearray(encode_mp4(frames, fps=8))
    i = bytes(data).find(b"mdhd")
    body = i + 4
    # v0 body: ver/flags(4) ctime(4) mtime(4) timescale(4) dur(4) ...
    (ts,) = _s.unpack_from(">I", data, body + 12)
    (dur,) = _s.unpack_from(">I", data, body + 16)
    lang_rest = bytes(data[body + 20 : body + 24])
    # rebuild as v1: ver=1, 64-bit ctime/mtime, same timescale, 64-bit dur
    v1 = (
        b"\x01\x00\x00\x00"
        + b"\x00" * 16
        + _s.pack(">I", ts)
        + _s.pack(">Q", dur)
        + lang_rest
    )
    old_size = _s.unpack_from(">I", data, i - 4)[0]
    new_box = _s.pack(">I", 8 + len(v1)) + b"mdhd" + v1
    out = bytearray(bytes(data[: i - 4]) + new_box + bytes(data[i - 4 + old_size :]))
    # fix ancestor box sizes (moov/trak/mdia) for the size delta
    delta = len(new_box) - old_size
    for fourcc in (b"moov", b"trak", b"mdia"):
        j = bytes(out).find(fourcc)
        sz = _s.unpack_from(">I", out, j - 4)[0]
        _s.pack_into(">I", out, j - 4, sz + delta)
    info = probe_mp4(bytes(out))
    assert info["duration_ms"] == probe_mp4(bytes(data))["duration_ms"]
    assert info["n_frames"] == 4


def test_bad_stsc_first_chunk_zero_rejected():
    import numpy as np
    import struct as _s

    from gmft_spark.kernel.mp4 import encode_mp4, probe_mp4

    frames = [np.full((8, 8), 90, dtype=np.uint8)] * 3
    data = bytearray(encode_mp4(frames, fps=8))
    i = bytes(data).find(b"stsc")
    # first run's first_chunk field sits 8 bytes into the body
    _s.pack_into(">I", data, i + 4 + 8, 0)
    import pytest as _pt

    with _pt.raises(ValueError):
        probe_mp4(bytes(data))
