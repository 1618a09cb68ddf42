"""Unit pins for the pdfium textpage arithmetic in
``gmft_spark/sources/pdfparse/textpage.py``.

Each rule was reverse-engineered from the reference's committed goldens
(see the golden suites for the end-to-end evidence); these tests pin the
arithmetic itself on synthetic chars so a future tweak that flips a
threshold or comparison direction fails here with a readable message,
not as an opaque golden diff.
"""

from __future__ import annotations

import pytest

from gmft_spark.sources.pdfparse.content import Char
from gmft_spark.sources.pdfparse.textpage import (
    SegConfig,
    _baseline_break,
    _intra_space_split,
    segment_words,
)

HEIGHT = 200.0


def mk(
    uni,
    ox,
    oy,
    adv,
    fadv=None,
    fs=10.0,
    obj_id=0,
    font=None,
    box=None,
    space=False,
):
    return Char(
        uni=uni,
        box=box if box is not None else (ox, oy, ox + adv * 0.9, oy + fs * 0.7),
        ox=ox,
        oy=oy,
        adv=(adv, 0.0),
        fs=fs,
        space=space,
        code=ord(uni[:1] or "?"),
        font=font,
        obj_id=obj_id,
        dir=(1.0, 0.0),
        fadv=(fadv if fadv is not None else adv, 0.0),
    )


class TestIntraSpacing:
    """spacing = TJ kern + Tc − baseSpace vs per-char NormalizeThreshold."""

    def test_normalize_threshold_bands(self):
        # thresholds: w<0.3fs → w/2, <0.5fs → w/4, <0.7fs → w/5, else w/6
        fs = 10.0
        for w, div in ((2.0, 2), (4.0, 4), (6.0, 5), (8.0, 6)):
            ch = mk("x", 0, 0, w, fadv=w, fs=fs)
            t = w / div
            assert _intra_space_split(ch, t + 1e-9, 0.0), (w, div)
            assert not _intra_space_split(ch, t - 1e-9, 0.0), (w, div)

    def test_space_glyph_branch_half_width(self):
        # a sane space glyph (≤ fs/3) halves: threshold = w_s*fs/2
        ch = mk("x", 0, 0, 6.0, fs=10.0)
        assert _intra_space_split(ch, 1.26, 0.25)  # thr = 0.25*10/2 = 1.25
        assert not _intra_space_split(ch, 1.24, 0.25)

    def test_oversized_space_glyph_falls_back_to_char_width(self):
        # w_s*fs > fs/3 → space branch zeroes out → char-width band
        ch = mk("x", 0, 0, 6.0, fs=10.0)  # 0.6fs → /5 = 1.2
        assert _intra_space_split(ch, 1.21, 0.4)
        assert not _intra_space_split(ch, 1.19, 0.4)

    def test_negative_spacing_never_splits(self):
        ch = mk("x", 0, 0, 6.0)
        assert not _intra_space_split(ch, -5.0, 0.0)

    def test_letterspaced_words_via_base_space(self):
        """Tc letterspacing cancelled by in-word kerns: word gaps (no
        kern → spacing = Tc) split, kerned interiors don't — the pdf3
        ')inzeolites' shape."""
        font = object()
        tc = 2.0
        chars = []
        x = 0.0
        # 'ab cd': Tc=+2 on every advance; kern −2 inside words only
        layout = [("a", True), ("b", False), ("c", True), ("d", False)]
        # kern_inside: 'b' and 'd' are preceded by an in-word kern
        for i, (u, word_start) in enumerate(layout):
            w = 5.0
            if i > 0:
                x += tc  # Tc gap (part of adv below)
                if not word_start:
                    x -= tc  # in-word kern cancels the letterspacing
            chars.append(
                mk(u, x, 0.0, w + tc, fadv=w, fs=10.0, obj_id=1, font=font)
            )
            x += w
        words = segment_words(chars, HEIGHT, SegConfig())
        assert [w[4] for w in words] == ["ab", "cd"]


class TestBaselineBreak:
    """Rise > 2×thr / drop < −3×thr (thr = min fadv / 4), gated on
    |Δy| > x-distance from the previous OBJECT's start."""

    def setup_method(self):
        self.obj_first = {1: (0.0, 0.0)}

    def test_rise_splits_when_exceeding_x_distance(self):
        prev = mk("(", 0.0, 0.0, 2.9, obj_id=1)
        ch = mk("a", 2.89, 2.9, 2.6, obj_id=2)  # rise 2.9 > pos_x 2.89
        assert _baseline_break(prev, ch, 2.9, self.obj_first)

    def test_rise_rescued_by_long_previous_object(self):
        self.obj_first[1] = (-10.0, 0.0)
        prev = mk("(", 0.0, 0.0, 2.9, obj_id=1)
        ch = mk("a", 2.89, 2.9, 2.6, obj_id=2)  # pos_x 12.89 > 2.9
        assert not _baseline_break(prev, ch, 2.9, self.obj_first)

    def test_drop_needs_three_thresholds(self):
        prev = mk("2", 0.0, 3.4, 2.98, obj_id=1)
        self.obj_first[1] = (0.0, 3.4)
        ch = mk(")", 2.97, 0.0, 2.83, obj_id=2)
        # thr = min(2.98, 2.83)/4 = 0.7075; drop −3.4 < −2.12 and
        # 3.4 > pos_x 2.97 → split (the pdf2 'kg/m2 )' shape)
        assert _baseline_break(prev, ch, -3.4, self.obj_first)
        # a drop just inside 3×thr stays merged
        assert not _baseline_break(prev, ch, -2.0, self.obj_first)

    def test_asymmetry_rise_2x_drop_3x(self):
        prev = mk("x", 0.0, 0.0, 4.0, obj_id=1)
        ch = mk("y", 0.5, 0.0, 4.0, obj_id=2)
        thr = 1.0  # min(4,4)/4
        assert _baseline_break(prev, ch, 2.0 * thr + 1e-6, self.obj_first)
        assert not _baseline_break(prev, ch, 2.0 * thr - 1e-6, self.obj_first)
        assert _baseline_break(prev, ch, -(3.0 * thr) - 1e-6, self.obj_first)
        assert not _baseline_break(prev, ch, -(3.0 * thr) + 1e-6, self.obj_first)


class TestControlChars:
    def test_control_char_contributes_box_but_no_text(self):
        font = object()
        a = mk("A", 0.0, 0.0, 5.0, obj_id=1, font=font)
        ctrl = mk("\x02", 5.0, 0.0, 3.0, obj_id=1, font=font,
                  box=(5.0, 0.0, 8.0, 7.0))
        b = mk("B", 8.0, 0.0, 5.0, obj_id=1, font=font)
        words = segment_words([a, ctrl, b], HEIGHT, SegConfig())
        assert len(words) == 1
        x0, _, x1, _, text = words[0]
        assert text == "AB"
        assert x1 >= 8.0  # control char's box merged into the envelope

    def test_empty_flush_retains_box_for_next_word(self):
        """The reference binding's accumulator bug: a whitespace flush
        with no pending text KEEPS the bbox, widening the next word
        (golden 'NO2 18.5' columns depend on it)."""
        font = object()
        ctrl = mk("\x02", 0.0, 0.0, 3.0, obj_id=1, font=font,
                  box=(0.0, 0.0, 3.0, 7.0))
        sp = mk(" ", 3.0, 0.0, 2.0, obj_id=1, font=font, space=True)
        b = mk("B", 50.0, 0.0, 5.0, obj_id=2, font=font,
               box=(50.0, 0.0, 55.0, 7.0))
        words = segment_words([ctrl, sp, b], HEIGHT, SegConfig())
        assert len(words) == 1
        x0, _, x1, _, text = words[0]
        assert text == "B"
        assert x0 == 0.0 and x1 == 55.0  # stale control-char box carried


class TestInterObjectPen:
    def test_gap_beyond_fadv_quarter_of_wider_char(self):
        font = object()
        a = mk("a", 0.0, 0.0, 5.0, obj_id=1, font=font)
        thr = 5.0 / 4.0
        b_split = mk("b", 5.0 + thr + 0.01, 0.0, 4.0, obj_id=2, font=font)
        b_merge = mk("b", 5.0 + thr - 0.01, 0.0, 4.0, obj_id=2, font=font)
        assert [w[4] for w in segment_words([a, b_split], HEIGHT, SegConfig())] == ["a", "b"]
        assert [w[4] for w in segment_words([a, b_merge], HEIGHT, SegConfig())] == ["ab"]

    def test_tc_never_pollutes_inter_object_pen(self):
        """Letterspaced adv (Tc baked in) must not shift the boundary:
        the pen measures from origin + FONT-width advance."""
        font = object()
        a = mk("a", 0.0, 0.0, 8.0, fadv=5.0, obj_id=1, font=font)
        b = mk("b", 6.0, 0.0, 4.0, fadv=4.0, obj_id=2, font=font)
        # gap beyond fadv = 1.0 < thr 1.25 → merge (real-pen gap would
        # be −2.0 and the old adv-based rule mis-joined such layouts)
        assert [w[4] for w in segment_words([a, b], HEIGHT, SegConfig())] == ["ab"]
