"""Deliberately naive transcription of the word-segmentation semantics
(the pdfium textpage rules documented in
``gmft_spark/sources/pdfparse/textpage.py``), written loop-by-loop with
no fast paths, no caches and no vectorization — the double-entry
bookkeeping twin that tests/test_segmentation_oracle.py diffs against
the production implementation on randomized char streams (same pattern
as tests/reference_oracle.py for the extraction kernel)."""

from __future__ import annotations

import math

CONTROL = {chr(c) for c in (0x02, 0x03, 0x93, 0x94, 0x96, 0x97, 0x98)}
LINE_BASE_EM = 0.35


def _along(ch, x, y):
    return x * ch.dir[0] + y * ch.dir[1]


def _cross(ch, x, y):
    return -x * ch.dir[1] + y * ch.dir[0]


def _box_cross(ch):
    x0, y0, x1, y1 = ch.box
    ux, uy = ch.dir
    vals = [
        -x0 * uy + y0 * ux,
        -x1 * uy + y0 * ux,
        -x0 * uy + y1 * ux,
        -x1 * uy + y1 * ux,
    ]
    return min(vals), max(vals)


def _vext(ch):
    if ch.box is not None:
        return _box_cross(ch)
    t = _cross(ch, ch.ox, ch.oy)
    return (t, t + 0.6 * max(ch.fs, 1e-6))


def _is_space(ch):
    return ch.space or (ch.uni != "" and ch.uni.isspace())


def _space_w(font) -> float:
    try:
        if font is not None and font.is_word_space(32):
            return float(font.width(32)) / 1000.0
    except Exception:
        pass
    return 0.0


def _object_stats(chars):
    """Per show-op object: first char origin, charspace (Tc) estimate,
    CalculateBaseSpace."""
    first, tc, kerns, counts = {}, {}, {}, {}
    prev_of = {}
    for ch in chars:
        oid = ch.obj_id
        if oid not in first:
            first[oid] = (ch.ox, ch.oy)
        counts[oid] = counts.get(oid, 0) + 1
        if oid not in tc and not ch.space:
            tc[oid] = _along(ch, ch.adv[0], ch.adv[1]) - _along(
                ch, ch.fadv[0], ch.fadv[1]
            )
        p = prev_of.get(oid)
        if p is not None:
            k = _along(ch, ch.ox, ch.oy) - _along(
                p, p.ox + p.adv[0], p.oy + p.adv[1]
            )
            if abs(k) > 1e-6:
                kerns.setdefault(oid, []).append(k)
        prev_of[oid] = ch
    base = {}
    for oid in counts:
        t = tc.get(oid, 0.0)
        ks = kerns.get(oid, [])
        n_items = counts[oid] + len(ks)
        if n_items < 3 or abs(t) <= 1e-4:
            base[oid] = 0.0
            continue
        b = t
        for k in ks:
            b = min(b, k + t)
        if b < 0.0 or (n_items == 3 and ks):
            b = 0.0
        base[oid] = b
    return first, tc, base


def _intra_split(ch, spacing, ws):
    if spacing <= 0.0:
        return False
    fs = max(ch.fs, 1e-6)
    t = 0.0
    if ws > 0.0:
        t = ws * fs
        t = 0.0 if t > fs / 3.0 else t / 2.0
    if t == 0.0:
        w = math.hypot(ch.fadv[0], ch.fadv[1])
        if w <= 0.0:
            return False
        if w < 0.3 * fs:
            t = w / 2.0
        elif w < 0.5 * fs:
            t = w / 4.0
        elif w < 0.7 * fs:
            t = w / 5.0
        else:
            t = w / 6.0
    return spacing >= t


def _baseline_split(prev, ch, dt, first):
    wp = math.hypot(prev.fadv[0], prev.fadv[1])
    wc = math.hypot(ch.fadv[0], ch.fadv[1])
    thr = min(wp, wc) / 4.0
    if thr <= 0.0:
        return False
    fx = first.get(prev.obj_id)
    pos_x = (
        abs(_along(ch, ch.ox, ch.oy) - _along(ch, fx[0], fx[1]))
        if fx is not None
        else 0.0
    )
    if dt > 2.0 * thr or dt < -3.0 * thr:
        return abs(dt) > pos_x
    return False


def segment_words_naive(chars, height):
    first, tc, base = _object_stats(chars)
    words = []
    text = []
    box = None
    line = None
    prev = None

    def flush():
        nonlocal text, box
        t = "".join(text)
        if t and box is not None:
            words.append((box[0], height - box[3], box[2], height - box[1], t))
            box = None
        text = []

    for ch in chars:
        if _is_space(ch):
            flush()
            prev = ch
            continue
        lo, hi = _vext(ch)
        if line is None or prev is None:
            line = [lo, hi]
        else:
            fs = max(prev.fs, ch.fs, 1e-6)
            dot = prev.dir[0] * ch.dir[0] + prev.dir[1] * ch.dir[1]
            overlap = min(hi, line[1]) - max(lo, line[0])
            dt = _cross(ch, ch.ox, ch.oy) - _cross(prev, prev.ox, prev.oy)
            if not (
                dot > 0.9
                and (overlap > 0.0 or abs(dt) <= LINE_BASE_EM * fs)
            ):
                if (
                    len(text) >= 2
                    and text[-1] in ("-", "­")
                    and text[-2][-1:].isalpha()
                ):
                    text[-1] = "￾"
                else:
                    flush()
                line = [lo, hi]
            else:
                if prev.obj_id == ch.obj_id:
                    kern = _along(ch, ch.ox, ch.oy) - _along(
                        prev, prev.ox + prev.adv[0], prev.oy + prev.adv[1]
                    )
                    spacing = (
                        kern
                        + tc.get(ch.obj_id, 0.0)
                        - base.get(ch.obj_id, 0.0)
                    )
                    split = _intra_split(ch, spacing, _space_w(ch.font))
                elif _baseline_split(prev, ch, dt, first):
                    split = True
                else:
                    pen = _along(ch, ch.ox, ch.oy) - _along(
                        prev, prev.ox + prev.fadv[0], prev.oy + prev.fadv[1]
                    )
                    wp = math.hypot(prev.fadv[0], prev.fadv[1])
                    wc = math.hypot(ch.fadv[0], ch.fadv[1])
                    thr = max(wp, wc) / 4.0
                    if thr <= 0.0:
                        thr = 0.125 * max(prev.fs, 1e-6)
                    split = pen > thr or pen < -1.0 * max(
                        prev.fs, ch.fs, 1e-6
                    )
                if split:
                    flush()
                line[0] = min(line[0], lo)
                line[1] = max(line[1], hi)
        # accumulate (control chars: box merges, no text)
        b = ch.box if ch.box is not None else (ch.ox, ch.oy, ch.ox, ch.oy)
        if box is None:
            box = list(b)
        else:
            box[0] = min(box[0], b[0])
            box[1] = min(box[1], b[1])
            box[2] = max(box[2], b[2])
            box[3] = max(box[3], b[3])
        if not (len(ch.uni) == 1 and ch.uni in CONTROL):
            text.append(ch.uni)
        prev = ch
    flush()
    return words
