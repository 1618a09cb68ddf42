"""From-scratch RIFF/WAVE PCM codec — the audio half of the multimodal
decode seam (operators/multimodal.py previously raised
``NotImplementedError`` for every audio payload).

Pure-spec implementation (RIFF container + PCM sample frames, the
public WAVE format): encoder emits canonical 8/16/24/32-bit PCM and
32-bit IEEE-float files for deterministic test corpora; decoder parses
arbitrary chunk layouts (skipping LIST/fact/etc.), handles PCM
(format 1), IEEE float (format 3) and WAVE_FORMAT_EXTENSIBLE (0xFFFE,
routed by its SubFormat code), normalizing everything to int16 — with
the same untrusted-input containment contract as
kernel/raster.decode_png and kernel/jpeg.decode_jpeg — hostile sizes
capped, every malformed stream a ``ValueError``."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav", "probe_wav"]

_MAX_SAMPLES = 1 << 26  # containment: ~64M samples (~256 MB mono f32)


def encode_wav(
    samples: np.ndarray,
    sample_rate: int = 16000,
    bits: int = 16,
    audio_format: str = "pcm",
) -> bytes:
    """Encode audio from int16 samples: (n,) mono or (n, channels).
    ``audio_format='pcm'`` with ``bits`` 8 (unsigned, offset 128),
    16 (int16 LE), 24 (int16 << 8, 3-byte LE) or 32 (int16 << 16);
    ``audio_format='float'`` (bits must be 32) writes IEEE float32 at
    int16/32768 scale. Every depth roundtrips the int16 input exactly
    through ``decode_wav``."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("samples must be (n,) or (n, channels)")
    n, ch = arr.shape
    if audio_format not in ("pcm", "float"):
        raise ValueError("audio_format must be 'pcm' or 'float'")
    if audio_format == "float":
        if bits != 32:
            raise ValueError("float WAVE is 32-bit")
        payload = (arr.astype(np.float32) / 32768.0).astype("<f4").tobytes()
        block = 4 * ch
        fmt_code = 3
    elif bits == 16:
        payload = arr.astype("<i2").tobytes()
        block = 2 * ch
        fmt_code = 1
    elif bits == 8:
        payload = ((arr.astype(np.int32) >> 8) + 128).astype(
            np.uint8
        ).tobytes()
        block = ch
        fmt_code = 1
    elif bits == 24:
        wide = (arr.astype(np.int32) << 8).astype("<i4").tobytes()
        b = np.frombuffer(wide, dtype=np.uint8).reshape(-1, 4)
        payload = np.ascontiguousarray(b[:, :3]).tobytes()
        block = 3 * ch
        fmt_code = 1
    elif bits == 32:
        payload = (arr.astype(np.int32) << 16).astype("<i4").tobytes()
        block = 4 * ch
        fmt_code = 1
    else:
        raise ValueError("bits must be 8, 16, 24 or 32")
    fmt = struct.pack(
        "<HHIIHH", fmt_code, ch, sample_rate, sample_rate * block,
        block, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    if len(payload) % 2:
        body += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _parse_chunks(data: bytes):
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAVE file (bad RIFF header)")
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {cid!r} chunk")
        yield cid, body
        pos += 8 + size + (size % 2)  # word alignment


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode WAVE bytes → (int16 array (n, channels), sample_rate).
    PCM 8/16/24/32-bit and IEEE float32 all normalize to int16 (wider
    depths keep their top 16 bits; float is clipped at full scale).
    WAVE_FORMAT_EXTENSIBLE routes by its SubFormat code. Genuinely
    foreign codings (ADPCM, µ-law...) raise ``NotImplementedError``
    (a format gap, not bad data)."""
    fmt = None
    fmt_body = b""
    payload = None
    try:
        for cid, body in _parse_chunks(data):
            if cid == b"fmt ":
                if len(body) < 16:
                    raise ValueError("truncated fmt chunk")
                fmt = struct.unpack("<HHIIHH", body[:16])
                fmt_body = body
            elif cid == b"data":
                payload = body
    except struct.error as ex:
        raise ValueError(f"corrupt WAVE: {ex}") from ex
    if fmt is None or payload is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, ch, rate, _brate, _align, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: SubFormat GUID
        if len(fmt_body) < 26:
            raise ValueError("truncated extensible fmt chunk")
        (audio_format,) = struct.unpack("<H", fmt_body[24:26])
    if ch < 1 or ch > 16:
        raise ValueError("hostile channel count")
    if audio_format == 3:  # IEEE float
        if bits != 32:
            raise ValueError("float WAVE must be 32-bit")
        f = np.frombuffer(
            payload[: len(payload) - len(payload) % (4 * ch)], dtype="<f4"
        ).astype(np.float64)
        flat = np.clip(
            np.round(f * 32768.0), -32768, 32767
        ).astype(np.int16)
    elif audio_format != 1:
        raise NotImplementedError(
            f"non-PCM WAVE format {audio_format} not implemented"
        )
    elif bits == 16:
        flat = np.frombuffer(
            payload[: len(payload) - len(payload) % (2 * ch)], dtype="<i2"
        ).astype(np.int16)
    elif bits == 8:
        flat = (
            (
                np.frombuffer(
                    payload[: len(payload) - len(payload) % ch],
                    dtype=np.uint8,
                ).astype(np.int16)
                - 128
            )
            << 8
        )
    elif bits == 24:
        b = np.frombuffer(
            payload[: len(payload) - len(payload) % (3 * ch)],
            dtype=np.uint8,
        ).reshape(-1, 3)
        wide = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        wide = (wide ^ 0x800000) - 0x800000  # sign-extend 24 bits
        flat = (wide >> 8).astype(np.int16)
    elif bits == 32:
        flat = (
            np.frombuffer(
                payload[: len(payload) - len(payload) % (4 * ch)],
                dtype="<i4",
            )
            >> 16
        ).astype(np.int16)
    else:
        raise NotImplementedError(f"{bits}-bit PCM not implemented")
    if flat.size > _MAX_SAMPLES:
        raise ValueError("audio too large")
    n = flat.size // ch
    return flat[: n * ch].reshape(n, ch), int(rate)


def probe_wav(data: bytes) -> dict:
    """Header-only metadata: channels / rate / bits / duration_ms."""
    fmt = None
    data_size = None
    for cid, body in _parse_chunks(data):
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data_size = len(body)
        if fmt is not None and data_size is not None:
            break
    if fmt is None or data_size is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, ch, rate, _brate, _align, bits = fmt
    block = max(1, ch * (bits // 8))
    n = data_size // block
    return {
        "channels": int(ch),
        "sample_rate": int(rate),
        "bits": int(bits),
        "n_samples": int(n),
        "duration_ms": int(round(1000.0 * n / max(1, rate))),
    }
