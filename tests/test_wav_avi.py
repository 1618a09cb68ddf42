"""From-scratch WAVE PCM and MJPEG-AVI codecs (kernel/wav.py,
kernel/avi.py) — lossless PCM roundtrips, container metadata probes,
frame-stride sampling, and the shared containment contract."""

import numpy as np
import pytest

from gmft_spark.kernel.avi import decode_avi_frames, encode_avi, probe_avi
from gmft_spark.kernel.wav import decode_wav, encode_wav, probe_wav


def _sine(n=4000, freq=440.0, rate=16000, amp=6000.0) -> np.ndarray:
    t = np.arange(n, dtype=np.float64)
    return (amp * np.sin(2.0 * np.pi * freq * t / rate)).astype(np.int16)


def _frames(k=5, h=24, w=32):
    return [
        (
            (np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 2 + i * 29)
            % 256
        ).astype(np.uint8)
        for i in range(k)
    ]


def test_wav_mono_16bit_lossless():
    s = _sine()
    dec, rate = decode_wav(encode_wav(s, 16000))
    assert rate == 16000 and dec.shape == (4000, 1)
    assert (dec[:, 0] == s).all()


def test_wav_stereo_lossless():
    s = _sine()
    st = np.stack([s, -s], axis=1).astype(np.int16)
    dec, rate = decode_wav(encode_wav(st, 8000))
    assert rate == 8000 and (dec == st).all()


def test_wav_8bit_quantizes_not_breaks():
    s = _sine()
    dec, _ = decode_wav(encode_wav(s, 16000, bits=8))
    # 8-bit storage: error bounded by one quantization step (256)
    assert np.abs(dec[:, 0].astype(int) - s.astype(int)).max() < 256


def test_wav_probe_and_odd_length_padding():
    s = _sine(n=1001)
    b = encode_wav(s, 22050, bits=8)  # odd data size → pad byte
    assert probe_wav(b) == {
        "channels": 1,
        "sample_rate": 22050,
        "bits": 8,
        "n_samples": 1001,
        "duration_ms": 45,
    }
    dec, rate = decode_wav(b)
    assert dec.shape == (1001, 1) and rate == 22050


@pytest.mark.parametrize("bits", [24, 32])
def test_wav_wide_pcm_lossless(bits):
    s = _sine()
    st = np.stack([s, -s], axis=1).astype(np.int16)
    dec, rate = decode_wav(encode_wav(st, 44100, bits=bits))
    assert rate == 44100 and (dec == st).all()


def test_wav_float32_lossless_and_clipped():
    s = _sine()
    b = encode_wav(s, 16000, bits=32, audio_format="float")
    dec, _ = decode_wav(b)
    assert (dec[:, 0] == s).all()  # int16/32768 floats are exact
    # out-of-range float samples clip at full scale
    import struct as _s

    hot = bytearray(b)
    i = hot.find(b"data") + 8
    hot[i : i + 8] = _s.pack("<2f", 2.0, -3.0)
    dec2, _ = decode_wav(bytes(hot))
    assert dec2[0, 0] == 32767 and dec2[1, 0] == -32768


def test_wav_extensible_routes_subformat():
    import struct as _s

    s = _sine()
    base = encode_wav(s, 16000, bits=24)
    data_chunk = base[base.find(b"data") :]
    # WAVE_FORMAT_EXTENSIBLE: cbSize=22, SubFormat GUID leads with the
    # real format code (1 = PCM)
    ext = _s.pack("<HHI", 22, 24, 4) + _s.pack("<H", 1) + b"\x00" * 14
    fmt = _s.pack("<HHIIHH", 0xFFFE, 1, 16000, 48000, 3, 24) + ext
    body = b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt + data_chunk
    dec, rate = decode_wav(b"RIFF" + _s.pack("<I", len(body)) + body)
    assert rate == 16000 and (dec[:, 0] == s).all()


def test_g711_code_space_identity():
    """decode(code) re-encodes to the same code for every one of the
    256 code points — the standard G.711 consistency property."""
    from gmft_spark.kernel.wav import (
        _alaw_decode,
        _alaw_encode,
        _mulaw_decode,
        _mulaw_encode,
    )

    codes = np.arange(256, dtype=np.uint8)
    a_round = _alaw_encode(_alaw_decode(codes))
    assert (a_round == codes).all()
    m_round = _mulaw_encode(_mulaw_decode(codes))
    # µ-law's negative zero (0x7F) decodes to 0, which re-encodes as
    # positive zero (0xFF) — the one canonical exception
    ok = (m_round == codes) | (codes == 0x7F)
    assert ok.all() and m_round[0x7F] == 0xFF


@pytest.mark.parametrize("fmt", ["mulaw", "alaw"])
def test_g711_wav_roundtrip_bounded_error(fmt):
    s = _sine()
    st = np.stack([s, -s], axis=1).astype(np.int16)
    b = encode_wav(st, 8000, bits=8, audio_format=fmt)
    assert probe_wav(b)["bits"] == 8
    dec, rate = decode_wav(b)
    assert rate == 8000 and dec.shape == st.shape
    err = np.abs(dec.astype(np.int32) - st.astype(np.int32))
    # companding error is proportional to magnitude (segment size)
    bound = np.abs(st.astype(np.int32)) // 8 + 80
    assert (err <= bound).all()
    # re-encoding the decoded signal is a fixpoint (codes are stable)
    b2 = encode_wav(dec, 8000, bits=8, audio_format=fmt)
    dec2, _ = decode_wav(b2)
    assert (dec2 == dec).all()


@pytest.mark.parametrize("channels", [1, 2])
def test_ima_adpcm_roundtrip(channels):
    s = _sine(n=1000)
    arr = (
        s if channels == 1 else np.stack([s, (-s) // 2], axis=1)
    ).astype(np.int16)
    b = encode_wav(arr, 16000, bits=4, audio_format="adpcm")
    info = probe_wav(b)
    assert info["bits"] == 4 and info["channels"] == channels
    dec, rate = decode_wav(b)
    assert rate == 16000
    # fact chunk trims the padded tail block to the true length
    assert dec.shape == (1000, channels)
    ref = arr.reshape(1000, channels).astype(np.int32)
    err = np.abs(dec.astype(np.int32) - ref)
    # the first samples carry the step-adaptation transient (idx starts
    # at 0); once the step has ramped, tracking error is tight
    assert err[100:].max() < 500 and err.mean() < 300


@pytest.mark.parametrize("channels", [1, 2])
def test_ms_adpcm_roundtrip(channels):
    s = _sine(n=1200)
    arr = (
        s if channels == 1 else np.stack([s, (-s) // 3], axis=1)
    ).astype(np.int16)
    b = encode_wav(arr, 22050, bits=4, audio_format="msadpcm")
    info = probe_wav(b)
    assert info["bits"] == 4 and info["channels"] == channels
    dec, rate = decode_wav(b)
    assert rate == 22050
    assert dec.shape == (1200, channels)  # fact-trimmed
    ref = arr.reshape(1200, channels).astype(np.int32)
    err = np.abs(dec.astype(np.int32) - ref)
    # header carries two verbatim samples per block; the 4-bit body
    # tracks within the adapted delta after the initial settle
    assert err[50:].max() < 1500 and err.mean() < 400


def test_ms_adpcm_containment():
    import struct as _s

    from gmft_spark.kernel.wav import _ms_decode_blocks

    bad = bytes([9]) + b"\x00" * 10  # predictor index out of range
    with pytest.raises(ValueError):
        _ms_decode_blocks(bad, 1, 11)
    with pytest.raises(ValueError):
        _ms_decode_blocks(b"", 1, 5)  # block smaller than its header
    # declared ADPCM with a PCM-sized block alignment is malformed
    b = bytearray(encode_wav(_sine(64), 8000))
    i = b.find(b"fmt ")
    b[i + 8] = 2
    _s.pack_into("<H", b, i + 8 + 12, 2)  # block_align 2 <= header 7
    b[i + 8 + 14] = 4  # bits
    with pytest.raises(ValueError):
        decode_wav(bytes(b))


def test_ima_adpcm_state_and_stream_shape():
    from gmft_spark.kernel.wav import _ima_decode_blocks, _ima_step

    # spec vector: from (pred=0, idx=0, step=7), nibble 0 adds step>>3
    assert _ima_step(0, 0, 0) == (0, 0)
    assert _ima_step(0, 0, 4) == (7, 2)  # +step, index += 2
    assert _ima_step(0, 0, 12) == (-7, 2)  # sign bit subtracts
    # clamping: index floors at 0, prediction clips to int16
    assert _ima_step(32767, 88, 7)[0] == 32767 - 0  # nibble 7 < 8: adds
    assert _ima_step(0, 0, 8) == (0, 0)
    # a malformed step index in a block header is contained
    import struct as _s

    bad = _s.pack("<hBB", 0, 99, 0) + b"\x00" * 4
    with pytest.raises(ValueError):
        _ima_decode_blocks(bad, 1, 8)


def test_wav_containment():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav(encode_wav(_sine(), 16000)[:30])  # truncated chunk
    # genuinely foreign coding (MPEG-in-WAV) is a format gap
    b = bytearray(encode_wav(_sine(128), 16000))
    i = b.find(b"fmt ")
    b[i + 8] = 85  # MPEG layer 3 format code
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(b))
    # float claimed at 16 bits is malformed, not a gap
    b[i + 8] = 3
    with pytest.raises(ValueError):
        decode_wav(bytes(b))
    with pytest.raises(ValueError):
        encode_wav(_sine(16), bits=24, audio_format="float")
    with pytest.raises(ValueError):
        encode_wav(_sine(16), bits=12)


def test_avi_probe_metadata():
    av = encode_avi(_frames(7), fps=5, quality=92)
    assert probe_avi(av) == {
        "width": 32,
        "height": 24,
        "n_frames": 7,
        "fps": 5.0,
        "duration_ms": 1400,
    }


def test_avi_frame_stride_sampling():
    frames = _frames(7)
    av = encode_avi(frames, fps=8, quality=92)
    got = decode_avi_frames(av, frame_stride=2)
    assert len(got) == 4  # frames 0, 2, 4, 6
    for g, f in zip(got, frames[::2]):
        assert g.shape == f.shape
        # the mod-256 wrap in the pattern is a sharp edge → ringing
        assert np.abs(g.astype(int) - f.astype(int)).max() <= 16
    # stride 1 decodes everything
    assert len(decode_avi_frames(av, frame_stride=1)) == 7


def test_avi_deterministic_bytes():
    a = encode_avi(_frames(3), fps=10)
    b = encode_avi(_frames(3), fps=10)
    assert a == b


def test_avi_containment():
    with pytest.raises(ValueError):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")  # not AVI
    av = encode_avi(_frames(3), fps=10)
    with pytest.raises(ValueError):
        decode_avi_frames(av[: len(av) // 2])  # truncated movi
    with pytest.raises(ValueError):
        decode_avi_frames(av, frame_stride=0)
    with pytest.raises(ValueError):
        encode_avi([], fps=10)
    with pytest.raises(ValueError):
        encode_avi([_frames(1)[0], np.zeros((8, 8), np.uint8)])


def test_avi_rec_grouped_movi_decodes():
    """The standard VfW interleaving wraps frame chunks in 'LIST rec '
    groups inside movi — the reader must recurse (review fix: such
    files used to decode to ZERO frames silently)."""
    from gmft_spark.kernel.avi import _chunk, _list

    frames = [
        np.full((8, 8), 40 * (i + 1), dtype=np.uint8) for i in range(3)
    ]
    plain = encode_avi(frames, fps=5)
    ref = decode_avi_frames(plain)
    # rebuild: same headers, but each 00dc chunk wrapped in its own rec
    movi_start = plain.find(b"movi")
    from gmft_spark.kernel.jpeg import encode_jpeg

    jpegs = [encode_jpeg(f, quality=85) for f in frames]
    new_movi = _list(
        b"movi",
        b"".join(_list(b"rec ", _chunk(b"00dc", j)) for j in jpegs),
    )
    # splice: everything up to the movi LIST header start, then new movi
    movi_list_hdr = plain.rfind(b"LIST", 0, movi_start)
    rebuilt = plain[:movi_list_hdr] + new_movi
    rebuilt = rebuilt[:4] + (len(rebuilt) - 8).to_bytes(4, "little") + rebuilt[8:]
    out = decode_avi_frames(rebuilt)
    assert len(out) == 3
    for a, b in zip(out, ref):
        assert np.array_equal(a, b)


def test_avi_second_stream_chunks_ignored():
    from gmft_spark.kernel.avi import _chunk, _list
    from gmft_spark.kernel.jpeg import encode_jpeg

    f0 = np.full((8, 8), 50, dtype=np.uint8)
    other = encode_jpeg(np.full((8, 8), 200, dtype=np.uint8), quality=85)
    plain = encode_avi([f0], fps=5)
    movi_start = plain.find(b"movi")
    movi_list_hdr = plain.rfind(b"LIST", 0, movi_start)
    new_movi = _list(
        b"movi",
        _chunk(b"00dc", encode_jpeg(f0, quality=85))
        + _chunk(b"01dc", other),  # a 2nd stream must not interleave
    )
    rebuilt = plain[:movi_list_hdr] + new_movi
    rebuilt = rebuilt[:4] + (len(rebuilt) - 8).to_bytes(4, "little") + rebuilt[8:]
    out = decode_avi_frames(rebuilt)
    assert len(out) == 1
    assert abs(int(out[0].mean()) - 50) < 3
