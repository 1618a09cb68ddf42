"""From-scratch GIF87a/89a codec (kernel/gif.py).

Evidence model mirrors the other codec suites: exact roundtrips (GIF is
lossless), an encoder/decoder mirror fuzz for the GIF LZW variant
(LSB-first, variable minimum code size, no early change), interlace and
palette coverage, frame composition semantics (rects, transparency,
disposal), a byte-determinism golden, and the untrusted-input
containment contract."""

import hashlib
import struct

import numpy as np
import pytest

from gmft_spark.kernel.gif import (
    decode_gif_frames,
    encode_gif,
    gif_lzw_decode,
    gif_lzw_encode,
    probe_gif,
)

H, W = 40, 56


def _gray():
    return (
        (np.arange(H)[:, None] * 3 + np.arange(W)[None, :] * 7) % 256
    ).astype(np.uint8)


def _prng_bytes(n, seed):
    out = bytearray()
    c = 0
    while len(out) < n:
        out += hashlib.md5(f"{seed}:{c}".encode()).digest()
        c += 1
    return bytes(out[:n])


# ── LZW mirror ───────────────────────────────────────────────────────


@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_gif_lzw_mirror(mcs):
    lim = 1 << mcs
    for n in (0, 1, 7, 500, 6000, 60000):
        d = bytes(b % lim for b in _prng_bytes(n, mcs))
        assert gif_lzw_decode(gif_lzw_encode(d, mcs), mcs, n) == d
        d = bytes((i * 3) % lim for i in range(n))
        assert gif_lzw_decode(gif_lzw_encode(d, mcs), mcs, n) == d
        d = bytes([5 % lim]) * n
        assert gif_lzw_decode(gif_lzw_encode(d, mcs), mcs, n) == d


def test_gif_lzw_short_stream_rejected():
    enc = gif_lzw_encode(b"\x01\x02\x03", 8)
    with pytest.raises(ValueError):
        gif_lzw_decode(enc, 8, 10)  # claims more pixels than encoded


# ── roundtrips ───────────────────────────────────────────────────────


def test_single_frame_gray():
    g = _gray()
    p = encode_gif([g])
    fr = decode_gif_frames(p)
    assert len(fr) == 1 and fr[0].shape == (H, W, 3)
    for c in range(3):  # identity gray ramp: index == every channel
        assert np.array_equal(fr[0][:, :, c], g)


def test_interlaced_equals_progressive():
    g = _gray()
    assert np.array_equal(
        decode_gif_frames(encode_gif([g], interlace=True))[0],
        decode_gif_frames(encode_gif([g]))[0],
    )


def test_palette_roundtrip():
    g = _gray()
    pal = np.stack(
        [
            np.arange(256),
            255 - np.arange(256),
            (np.arange(256) * 7) % 256,
        ],
        axis=1,
    ).astype(np.uint8)
    out = decode_gif_frames(encode_gif([g], palette=pal))[0]
    assert np.array_equal(out, pal[g])


def test_animation_and_stride():
    g = _gray().astype(int)
    frames = [((g + 31 * k) % 256).astype(np.uint8) for k in range(7)]
    p = encode_gif(frames, delay_cs=5)
    assert probe_gif(p) == {
        "width": W,
        "height": H,
        "n_frames": 7,
        "duration_ms": 350,
    }
    full = decode_gif_frames(p)
    assert len(full) == 7
    for k in range(7):
        assert np.array_equal(full[k][:, :, 0], frames[k]), k
    s3 = decode_gif_frames(p, frame_stride=3)
    assert len(s3) == 3 and np.array_equal(s3[1], full[3])
    with pytest.raises(ValueError):
        decode_gif_frames(p, frame_stride=0)


# ── composition semantics (hand-built container) ─────────────────────


def _hand_gif(blocks: bytes, w=8, h=8) -> bytes:
    pal = bytes(range(256)) * 0  # built below
    pal = b"".join(bytes([i, i, i]) for i in range(256))
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
        + pal
        + blocks
        + b"\x3b"
    )


def _frame_block(idx: np.ndarray, fx, fy, gce: bytes = b"") -> bytes:
    fh, fw = idx.shape
    body = gif_lzw_encode(idx.astype(np.uint8).tobytes(), 8)
    sub = b""
    pos = 0
    while pos < len(body):
        chunk = body[pos : pos + 255]
        sub += bytes([len(chunk)]) + chunk
        pos += 255
    sub += b"\x00"
    return (
        gce
        + b"\x2c"
        + struct.pack("<HHHHB", fx, fy, fw, fh, 0)
        + b"\x08"
        + sub
    )


def test_frame_rect_composites_onto_canvas():
    base = np.full((8, 8), 10, np.uint8)
    patch = np.full((3, 4), 200, np.uint8)
    p = _hand_gif(_frame_block(base, 0, 0) + _frame_block(patch, 2, 1))
    frames = decode_gif_frames(p)
    assert len(frames) == 2
    want = np.full((8, 8), 10, np.uint8)
    want[1:4, 2:6] = 200
    assert np.array_equal(frames[1][:, :, 0], want)


def test_transparency_preserves_underlying_pixels():
    base = np.full((8, 8), 10, np.uint8)
    patch = np.full((8, 8), 200, np.uint8)
    patch[::2] = 7  # index 7 declared transparent
    gce = b"\x21\xf9\x04" + struct.pack("<BHBB", 0x01, 0, 7, 0)
    p = _hand_gif(_frame_block(base, 0, 0) + _frame_block(patch, 0, 0, gce))
    out = decode_gif_frames(p)[1][:, :, 0]
    assert np.array_equal(out[::2], np.full((4, 8), 10, np.uint8))
    assert np.array_equal(out[1::2], np.full((4, 8), 200, np.uint8))


def test_disposal_restore_background_and_previous():
    base = np.full((8, 8), 10, np.uint8)
    patch = np.full((2, 2), 200, np.uint8)
    tail = np.full((1, 1), 99, np.uint8)
    # disposal 2: patch region cleared to background before next frame
    gce2 = b"\x21\xf9\x04" + struct.pack("<BHBB", 0x08, 0, 0, 0)
    p = _hand_gif(
        _frame_block(base, 0, 0)
        + _frame_block(patch, 3, 3, gce2)
        + _frame_block(tail, 0, 0)
    )
    last = decode_gif_frames(p)[2][:, :, 0]
    assert (last[3:5, 3:5] == 0).all()  # restored to background
    assert last[0, 0] == 99
    # disposal 3: canvas restored to pre-frame state
    gce3 = b"\x21\xf9\x04" + struct.pack("<BHBB", 0x0C, 0, 0, 0)
    p = _hand_gif(
        _frame_block(base, 0, 0)
        + _frame_block(patch, 3, 3, gce3)
        + _frame_block(tail, 0, 0)
    )
    last = decode_gif_frames(p)[2][:, :, 0]
    assert (last[3:5, 3:5] == 10).all()  # patch undone
    assert last[0, 0] == 99


# ── golden + containment ─────────────────────────────────────────────


def test_encode_golden():
    p = encode_gif([_gray()], interlace=True)
    assert hashlib.md5(p).hexdigest() == _GOLDEN


_GOLDEN = "baedf2954b8167c911e8196ff9a4b8bb"


def test_malformed_rejected():
    g = _gray()
    p = encode_gif([g])
    with pytest.raises(ValueError):
        decode_gif_frames(b"NOTAGIF" + p[7:])
    with pytest.raises(ValueError):
        decode_gif_frames(p[:20])
    with pytest.raises(ValueError):
        decode_gif_frames(p[: len(p) // 2])
    # frame rect outside the logical screen (descriptor sits right
    # after the 6-byte signature + 7-byte LSD + 768-byte palette)
    bad = bytearray(p)
    i = 6 + 7 + 768
    assert bad[i] == 0x2C
    struct.pack_into("<H", bad, i + 1, 60)  # fx=60 > W=56
    with pytest.raises(ValueError):
        decode_gif_frames(bytes(bad))


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_gif([])
    with pytest.raises(ValueError):
        encode_gif(
            [np.zeros((4, 4), np.uint8), np.zeros((4, 5), np.uint8)]
        )
    with pytest.raises(ValueError):
        encode_gif([np.zeros((4, 4), np.uint8)], palette=np.zeros((2, 3)))


# ── multimodal seams ─────────────────────────────────────────────────


def test_real_decode_gif_image_and_video():
    from gmft_spark.operators.multimodal import _gray_hist, _real_decode

    g = _gray()
    frames = [((g.astype(int) + 31 * k) % 256).astype(np.uint8) for k in range(6)]
    p = encode_gif(frames)
    feat, n = _real_decode(p, "image")
    assert n == 1
    first = decode_gif_frames(p)[0]
    assert np.allclose(feat, _gray_hist(first))
    feat, n = _real_decode(p, "video", frame_stride=2)
    assert n == 3
    sampled = decode_gif_frames(p, frame_stride=2)
    want = np.mean([_gray_hist(f) for f in sampled], axis=0)
    assert np.allclose(feat, want)
