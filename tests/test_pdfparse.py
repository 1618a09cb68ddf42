"""Tests for the from-scratch PDF word extractor.

The strict fixture is the reference's own committed golden
(tiny_pdfium.tsv: 31 words with full float precision, extracted by
pypdfium2). Our pure-Python parser must reproduce text, order, and all
four coordinates of every word.
"""

import os

import pytest

from gmft_spark.sources.pdfparse import ParsedPDF

REF = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus not present"
)


def _golden_tiny_words():
    out = []
    with open(f"{REF}/test/references/tiny_pdfium.tsv") as f:
        for line in f:
            p = line.rstrip("\n").split("\t")
            out.append((float(p[0]), float(p[1]), float(p[2]), float(p[3]), p[4]))
    return out


class TestTinyGoldenWords:
    def test_word_boxes_match_reference_binding(self):
        with open(f"{REF}/pdfs/tiny.pdf", "rb") as f:
            doc = ParsedPDF(f.read())
        assert len(doc) == 1
        w, h = doc.page_size(0)
        assert (w, h) == (612.0, 792.0)
        words = doc.page_words(0)
        golden = _golden_tiny_words()
        assert [g[4] for g in golden] == [w[4] for w in words]
        for mine, gold in zip(words, golden):
            for i in range(4):
                # golden carries float32-precision reprs; we are exact to
                # well below a thousandth of a point
                assert abs(mine[i] - gold[i]) < 1e-3, (mine, gold)


class TestCorpusSmoke:
    @pytest.mark.parametrize("name,npages", [("1", 20), ("7", 7), ("8", 13)])
    def test_pages_and_words_nonempty(self, name, npages):
        with open(f"{REF}/pdfs/{name}.pdf", "rb") as f:
            doc = ParsedPDF(f.read())
        assert len(doc) == npages
        words = doc.page_words(0)
        assert len(words) > 50
        # sane geometry: boxes within page, positive extent
        w, h = doc.page_size(0)
        for x0, y0, x1, y1, text in words:
            assert x1 >= x0 and y1 >= y0
            assert -50 < x0 < w + 50 and -50 < y0 < h + 50
            assert text
