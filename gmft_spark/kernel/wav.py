"""From-scratch RIFF/WAVE PCM codec — the audio half of the multimodal
decode seam (operators/multimodal.py previously raised
``NotImplementedError`` for every audio payload).

Pure-spec implementation (RIFF container, public WAVE formats):
encoder emits canonical 8/16/24/32-bit PCM, 32-bit IEEE-float, G.711
µ-law/A-law, and IMA/Microsoft ADPCM files for deterministic test
corpora; decoder parses arbitrary chunk layouts (skipping LIST etc.),
handles PCM (format 1), MS-ADPCM (2), IEEE float (3), A-law (6),
µ-law (7), IMA ADPCM (17) — both ADPCMs fact-chunk-trimmed — and
WAVE_FORMAT_EXTENSIBLE (0xFFFE, routed by its SubFormat code),
normalizing everything to int16 — with the same
untrusted-input containment contract as kernel/raster.decode_png and
kernel/jpeg.decode_jpeg — hostile sizes capped, every malformed
stream a ``ValueError``."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav", "probe_wav"]

_MAX_SAMPLES = 1 << 26  # containment: ~64M samples (~256 MB mono f32)


# ── IMA/DVI ADPCM (format 17, public IMA spec) ───────────────────────

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(pred: int, idx: int, nibble: int) -> tuple:
    """One IMA ADPCM state update (shared by encoder and decoder — the
    encoder simulates the decoder so the pair never drifts)."""
    step = _IMA_STEPS[idx]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX[nibble & 7]))
    return pred, idx


def _ima_encode_nibble(sample: int, pred: int, idx: int) -> int:
    step = _IMA_STEPS[idx]
    delta = sample - pred
    n = 0
    if delta < 0:
        n = 8
        delta = -delta
    if delta >= step:
        n |= 4
        delta -= step
    if delta >= step >> 1:
        n |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        n |= 1
    return n


def _ima_decode_blocks(
    payload: bytes, ch: int, block_align: int
) -> np.ndarray:
    """IMA ADPCM data chunk → (n, ch) int16. Block layout: per-channel
    4-byte header (predictor int16, step index, reserved), then 4-byte
    nibble words round-robin across channels, low nibble first."""
    if block_align < 4 * ch or (block_align - 4 * ch) % (4 * ch):
        raise ValueError("bad ADPCM block alignment")
    spb = (block_align - 4 * ch) * 2 // ch + 1
    words = (block_align - 4 * ch) // (4 * ch)
    out = []
    for b0 in range(0, len(payload) - block_align + 1, block_align):
        block = payload[b0 : b0 + block_align]
        preds = []
        idxs = []
        chans = []
        for c in range(ch):
            pred, idx, _r = struct.unpack_from("<hBB", block, 4 * c)
            if idx > 88:
                raise ValueError("bad ADPCM step index")
            preds.append(pred)
            idxs.append(idx)
            chans.append([pred])
        pos = 4 * ch
        for _w in range(words):
            for c in range(ch):
                for byte in block[pos : pos + 4]:
                    for nib in (byte & 0xF, byte >> 4):
                        preds[c], idxs[c] = _ima_step(
                            preds[c], idxs[c], nib
                        )
                        chans[c].append(preds[c])
                pos += 4
        frame = np.stack(
            [np.array(chans[c][:spb], dtype=np.int16) for c in range(ch)],
            axis=1,
        )
        out.append(frame)
    if not out:
        return np.zeros((0, ch), dtype=np.int16)
    return np.concatenate(out, axis=0)


def _ima_encode_blocks(
    arr: np.ndarray, words_per_channel: int = 31
) -> tuple:
    """(n, ch) int16 → (payload bytes, block_align, samples_per_block).
    Step index persists across blocks (each block header snapshots it,
    exactly what the decoder reads)."""
    n, ch = arr.shape
    spb = words_per_channel * 8 + 1
    block_align = 4 * ch + 4 * ch * words_per_channel
    out = bytearray()
    idxs = [0] * ch
    pos = 0
    while pos < n:
        take = arr[pos : pos + spb]
        if take.shape[0] < spb:  # pad the tail block by repetition
            pad = np.repeat(take[-1:], spb - take.shape[0], axis=0)
            take = np.concatenate([take, pad], axis=0)
        preds = []
        for c in range(ch):
            pred = int(take[0, c])
            out += struct.pack("<hBB", pred, idxs[c], 0)
            preds.append(pred)
        nibs = [[] for _ in range(ch)]
        for s in range(1, spb):
            for c in range(ch):
                nib = _ima_encode_nibble(int(take[s, c]), preds[c], idxs[c])
                preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                nibs[c].append(nib)
        per_word = 8
        for w in range(words_per_channel):
            for c in range(ch):
                grp = nibs[c][w * per_word : (w + 1) * per_word]
                for k in range(0, 8, 2):
                    out.append(grp[k] | (grp[k + 1] << 4))
        pos += spb
    return bytes(out), block_align, spb


# ── Microsoft ADPCM (format 2, public RIFF spec) ─────────────────────

_MS_COEFS = [
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232),
]
_MS_ADAPT = [
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
]


def _ms_decode_blocks(
    payload: bytes, ch: int, block_align: int
) -> np.ndarray:
    """MS-ADPCM data chunk → (n, ch) int16. Block: per-channel
    predictor index (u8), then per-channel delta (i16), sample1 (i16),
    sample2 (i16); body nibbles alternate channels, HIGH nibble first."""
    head = 7 * ch
    if block_align <= head:
        raise ValueError("bad MS-ADPCM block alignment")
    spb = (block_align - head) * 2 // ch + 2
    out = []
    for b0 in range(0, len(payload) - block_align + 1, block_align):
        block = payload[b0 : b0 + block_align]
        coef = []
        for c in range(ch):
            ip = block[c]
            if ip >= len(_MS_COEFS):
                raise ValueError("bad MS-ADPCM predictor index")
            coef.append(_MS_COEFS[ip])
        delta = list(
            struct.unpack_from(f"<{ch}h", block, ch)
        )
        s1 = list(struct.unpack_from(f"<{ch}h", block, 3 * ch))
        s2 = list(struct.unpack_from(f"<{ch}h", block, 5 * ch))
        chans = [[s2[c], s1[c]] for c in range(ch)]
        c = 0
        for byte in block[head:]:
            for nib in (byte >> 4, byte & 0xF):
                signed = nib - 16 if nib & 8 else nib
                c1, c2 = coef[c]
                pred = (s1[c] * c1 + s2[c] * c2) // 256 + signed * delta[c]
                pred = max(-32768, min(32767, pred))
                chans[c].append(pred)
                s2[c], s1[c] = s1[c], pred
                delta[c] = max(16, (_MS_ADAPT[nib] * delta[c]) // 256)
                c = (c + 1) % ch
        frame = np.stack(
            [np.array(chans[k][:spb], dtype=np.int16) for k in range(ch)],
            axis=1,
        )
        out.append(frame)
    if not out:
        return np.zeros((0, ch), dtype=np.int16)
    return np.concatenate(out, axis=0)


def _ms_encode_blocks(
    arr: np.ndarray, body_bytes: int = 124
) -> tuple:
    """(n, ch) int16 → (payload, block_align, samples_per_block). Uses
    predictor 0 (coef 256/0 — previous-sample prediction) with the
    standard delta adaptation; the encoder runs the decoder's exact
    update so the pair never drifts."""
    n, ch = arr.shape
    if body_bytes % ch:
        body_bytes += ch - body_bytes % ch
    block_align = 7 * ch + body_bytes
    spb = body_bytes * 2 // ch + 2
    out = bytearray()
    pos = 0
    while pos < n:
        take = arr[pos : pos + spb]
        if take.shape[0] < spb:
            pad = np.repeat(take[-1:], spb - take.shape[0], axis=0)
            take = np.concatenate([take, pad], axis=0)
        s2 = [int(take[0, c]) for c in range(ch)]
        s1 = [int(take[1, c]) for c in range(ch)]
        delta = [
            max(16, abs(int(take[2, c]) - s1[c]) // 4 or 16)
            for c in range(ch)
        ]
        out += bytes([0] * ch)  # predictor index 0 per channel
        out += struct.pack(f"<{ch}h", *delta)
        out += struct.pack(f"<{ch}h", *s1)
        out += struct.pack(f"<{ch}h", *s2)
        nibs = []
        state = [list(x) for x in zip(s1, s2, delta)]
        for s in range(2, spb):
            for c in range(ch):
                cs1, cs2, cd = state[c]
                pred = (cs1 * 256 + cs2 * 0) // 256
                err = int(take[s, c]) - pred
                nib = max(-8, min(7, int(round(err / cd)))) & 0xF
                signed = nib - 16 if nib & 8 else nib
                val = max(-32768, min(32767, pred + signed * cd))
                state[c] = [
                    val,
                    cs1,
                    max(16, (_MS_ADAPT[nib] * cd) // 256),
                ]
                nibs.append(nib)
        for i in range(0, len(nibs), 2):
            out.append((nibs[i] << 4) | nibs[i + 1])
        pos += spb
    return bytes(out), block_align, spb


# ── G.711 µ-law / A-law companding (ITU-T G.711, public formulas) ────


def _mulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 → µ-law code bytes (bias 0x84, clip 32635)."""
    x = x.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(mag)).astype(np.int32) - 7).clip(0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def _mulaw_decode(c: np.ndarray) -> np.ndarray:
    c = (~c.astype(np.int32)) & 0xFF
    sign = c & 0x80
    exp = (c >> 4) & 7
    mant = c & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign > 0, -mag, mag).astype(np.int16)


def _alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 → A-law code bytes (even-bit inversion 0x55). Exact
    inverse of ``_alaw_decode``'s midpoint cells: segment s >= 1 covers
    [256 << (s-1), 512 << (s-1)) in steps of 16 << (s-1)."""
    x = x.astype(np.int32)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 0x7FFF)
    seg = (np.floor(np.log2(np.maximum(mag, 1))).astype(np.int32) - 7).clip(
        0, 7
    )
    small = mag < 256
    mant = np.where(small, mag >> 4, (mag >> (seg + 3)) & 0x0F)
    code = np.where(small, mant, (seg << 4) | mant)
    return ((sign | code) ^ 0x55).astype(np.uint8)


def _alaw_decode(c: np.ndarray) -> np.ndarray:
    a = c.astype(np.int32) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 7
    mag = np.where(
        seg == 0,
        t + 8,
        np.where(seg == 1, t + 0x108, (t + 0x108) << (seg - 1).clip(0)),
    )
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


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
    int16/32768 scale — every PCM/float depth roundtrips the int16
    input exactly through ``decode_wav``. ``'mulaw'`` / ``'alaw'``
    (bits must be 8) write G.711 companded codes; ``'adpcm'`` /
    ``'msadpcm'`` (bits must be 4) write IMA / Microsoft ADPCM blocks
    with a fact chunk carrying the true sample count — all lossy,
    bounded-error codings."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("samples must be (n,) or (n, channels)")
    n, ch = arr.shape
    if audio_format not in (
        "pcm", "float", "mulaw", "alaw", "adpcm", "msadpcm",
    ):
        raise ValueError(
            "audio_format must be 'pcm', 'float', 'mulaw', 'alaw', "
            "'adpcm' or 'msadpcm'"
        )
    fmt_extra = b""
    fact = b""
    if audio_format == "adpcm":
        if bits != 4:
            raise ValueError("IMA ADPCM WAVE is 4-bit")
        payload, block, spb = _ima_encode_blocks(arr.astype(np.int16))
        fmt_code = 17
        fmt_extra = struct.pack("<HH", 2, spb)
        fact = b"fact" + struct.pack("<II", 4, n)
    elif audio_format == "msadpcm":
        if bits != 4:
            raise ValueError("MS-ADPCM WAVE is 4-bit")
        payload, block, spb = _ms_encode_blocks(arr.astype(np.int16))
        fmt_code = 2
        coefs = b"".join(
            struct.pack("<hh", a, b) for a, b in _MS_COEFS
        )
        fmt_extra = struct.pack("<HHH", 32, spb, len(_MS_COEFS)) + coefs
        fact = b"fact" + struct.pack("<II", 4, n)
    elif audio_format in ("mulaw", "alaw"):
        if bits != 8:
            raise ValueError("G.711 companded WAVE is 8-bit")
        enc = _mulaw_encode if audio_format == "mulaw" else _alaw_encode
        payload = enc(arr.astype(np.int16)).tobytes()
        block = ch
        fmt_code = 7 if audio_format == "mulaw" else 6
    elif audio_format == "float":
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
    spb_div = spb if audio_format in ("adpcm", "msadpcm") else 1
    fmt = struct.pack(
        "<HHIIHH", fmt_code, ch, sample_rate,
        sample_rate * block // spb_div, block, bits,
    ) + fmt_extra
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + fact
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
    PCM 8/16/24/32-bit, IEEE float32, G.711 µ-law/A-law (formats 7/6),
    MS-ADPCM (format 2) and IMA ADPCM (format 17), both
    fact-chunk-trimmed, all normalize to int16 (wider depths keep
    their top 16 bits; float is clipped at full scale).
    WAVE_FORMAT_EXTENSIBLE routes by its SubFormat code. Genuinely
    foreign codings (MP3-in-WAV, GSM...) raise ``NotImplementedError``
    (a format gap, not bad data)."""
    fmt = None
    fmt_body = b""
    payload = None
    n_fact = None
    try:
        for cid, body in _parse_chunks(data):
            if cid == b"fmt ":
                if len(body) < 16:
                    raise ValueError("truncated fmt chunk")
                fmt = struct.unpack("<HHIIHH", body[:16])
                fmt_body = body
            elif cid == b"data":
                payload = body
            elif cid == b"fact" and len(body) >= 4:
                (n_fact,) = struct.unpack("<I", body[:4])
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
    elif audio_format in (6, 7):  # G.711 A-law / µ-law
        if bits != 8:
            raise ValueError("G.711 WAVE must be 8-bit")
        codes = np.frombuffer(
            payload[: len(payload) - len(payload) % ch], dtype=np.uint8
        )
        dec = _alaw_decode if audio_format == 6 else _mulaw_decode
        flat = dec(codes)
    elif audio_format in (2, 17):  # MS-ADPCM / IMA ADPCM
        if bits != 4:
            raise ValueError("ADPCM WAVE must be 4-bit")
        head = 7 * ch if audio_format == 2 else 4 * ch
        if _align <= head:
            raise ValueError("bad ADPCM block alignment")
        extra = 2 if audio_format == 2 else 1
        spb = (_align - head) * 2 // ch + extra
        est = (len(payload) // _align) * spb * ch
        if est > 1 << 22:  # sequential python decode: tighter cap
            raise ValueError("audio too large")
        dec = _ms_decode_blocks if audio_format == 2 else _ima_decode_blocks
        out = dec(payload, ch, _align)
        if n_fact is not None:
            out = out[:n_fact]
        return np.ascontiguousarray(out), int(rate)
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
    head = (7 if audio_format == 2 else 4) * max(1, ch)
    if audio_format in (2, 17) and ch >= 1 and _align > head:
        extra = 2 if audio_format == 2 else 1
        spb = (_align - head) * 2 // ch + extra
        n = (data_size // _align) * spb
    else:
        block = max(1, ch * (bits // 8))
        n = data_size // block
    return {
        "channels": int(ch),
        "sample_rate": int(rate),
        "bits": int(bits),
        "n_samples": int(n),
        "duration_ms": int(round(1000.0 * n / max(1, rate))),
    }
