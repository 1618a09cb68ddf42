"""Differential oracle: the production ``segment_words`` (fast paths,
caches, run-walking prepass) must agree exactly with the naive loop
transcription in tests/reference_segmenter.py on randomized char
streams AND on every real page of the reference corpus."""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings, strategies as st

from gmft_spark.sources.pdfparse.content import Char
from gmft_spark.sources.pdfparse.textpage import SegConfig, segment_words
from tests.reference_segmenter import segment_words_naive

HEIGHT = 300.0


class FakeFont:
    def __init__(self, space_w: float):
        self._sw = space_w

    def is_word_space(self, code: int) -> bool:
        return code == 32 and self._sw > 0

    def width(self, code: int) -> float:
        return self._sw * 1000.0


FONTS = [FakeFont(0.0), FakeFont(0.25), FakeFont(0.5)]


@st.composite
def char_streams(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    chars = []
    x = 0.0
    y = draw(st.floats(min_value=0, max_value=100))
    obj_id = 0
    font_i = draw(st.integers(0, 2))
    for _ in range(n):
        kind = draw(
            st.sampled_from(
                ["char", "char", "char", "space", "gap", "newobj",
                 "script", "newline", "ctrl"]
            )
        )
        if kind == "newline":
            y += draw(st.floats(min_value=5, max_value=20))
            x = draw(st.floats(min_value=0, max_value=10))
            obj_id += 1
            continue
        if kind == "newobj":
            obj_id += 1
            font_i = draw(st.integers(0, 2))
        if kind == "gap":
            x += draw(st.floats(min_value=0.1, max_value=8))
            continue
        fs = draw(st.sampled_from([5.0, 7.0, 10.0]))
        w = draw(st.floats(min_value=1.0, max_value=8.0))
        tc = draw(st.sampled_from([0.0, 0.0, 1.5, -0.5]))
        dy = 0.0
        if kind == "script":
            dy = draw(st.floats(min_value=-4.0, max_value=4.0))
            obj_id += 1
        uni = "\x02" if kind == "ctrl" else draw(
            st.sampled_from("abcXY9-.(")
        )
        is_sp = kind == "space"
        if is_sp:
            uni = " "
        oy = y + dy
        chars.append(
            Char(
                uni=uni,
                box=(x, oy, x + w * 0.9, oy + fs * 0.7),
                ox=x,
                oy=oy,
                adv=(w + tc, 0.0),
                fs=fs,
                space=is_sp,
                code=32 if is_sp else ord(uni),
                font=FONTS[font_i],
                obj_id=obj_id,
                dir=(1.0, 0.0),
                fadv=(w, 0.0),
            )
        )
        x += w + tc
        kern = draw(st.sampled_from([0.0, 0.0, 0.0, -1.5, 2.2]))
        x += kern
    return chars


@settings(max_examples=300, deadline=None, derandomize=True)
@given(char_streams())
def test_production_matches_naive_transcription(chars):
    got = segment_words(chars, HEIGHT, SegConfig())
    exp = segment_words_naive(chars, HEIGHT)
    assert got == exp


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/data/pdfs"),
    reason="reference corpus not present",
)
def test_real_corpus_pages_match_naive():
    from gmft_spark.sources.pdfparse import ParsedPDF

    import glob

    for fn in sorted(glob.glob("/root/reference/data/pdfs/*.pdf")):
        doc = ParsedPDF(open(fn, "rb").read())
        for n in range(len(doc)):
            chars = doc.page_chars(n)
            _w, height = doc.page_size(n)
            got = segment_words(chars, height, SegConfig())
            exp = segment_words_naive(chars, height)
            assert got == exp, f"{fn} page {n}"
