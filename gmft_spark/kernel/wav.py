"""From-scratch RIFF/WAVE PCM codec — the audio half of the multimodal
decode seam (operators/multimodal.py previously raised
``NotImplementedError`` for every audio payload).

Pure-spec implementation (RIFF container + PCM sample frames, the
public WAVE format): encoder emits canonical 8/16-bit PCM files for
deterministic test corpora; decoder parses arbitrary chunk layouts
(skipping LIST/fact/etc.), with the same untrusted-input containment
contract as kernel/raster.decode_png and kernel/jpeg.decode_jpeg —
hostile sizes capped, every malformed stream a ``ValueError``."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav", "probe_wav"]

_MAX_SAMPLES = 1 << 26  # containment: ~64M samples (~256 MB mono f32)


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, bits: int = 16
) -> bytes:
    """Encode PCM audio. ``samples``: int16 array, (n,) mono or
    (n, channels). ``bits``: 16 (int16 LE) or 8 (unsigned, offset 128)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("samples must be (n,) or (n, channels)")
    n, ch = arr.shape
    if bits == 16:
        payload = arr.astype("<i2").tobytes()
        block = 2 * ch
    elif bits == 8:
        payload = ((arr.astype(np.int32) >> 8) + 128).astype(
            np.uint8
        ).tobytes()
        block = ch
    else:
        raise ValueError("bits must be 8 or 16")
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, bits
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
    """Decode PCM WAVE bytes → (int16 array (n, channels), sample_rate).
    8-bit samples are widened to int16; non-PCM formats raise
    ``NotImplementedError`` (a format gap, not bad data)."""
    fmt = None
    payload = None
    try:
        for cid, body in _parse_chunks(data):
            if cid == b"fmt ":
                if len(body) < 16:
                    raise ValueError("truncated fmt chunk")
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                payload = body
    except struct.error as ex:
        raise ValueError(f"corrupt WAVE: {ex}") from ex
    if fmt is None or payload is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, ch, rate, _brate, _align, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(
            f"non-PCM WAVE format {audio_format} not implemented"
        )
    if ch < 1 or ch > 16:
        raise ValueError("hostile channel count")
    if bits == 16:
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
