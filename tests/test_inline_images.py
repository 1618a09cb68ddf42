"""Inline images (BI/ID/EI) and the LZW/RunLength data filters.

Reference behavior: pdfium paints inline images exactly like Image
XObjects (same CTM unit-square mapping); PDF spec table 91 defines the
abbreviated inline keys and filter names this parser normalizes.
"""

import zlib

import numpy as np
import pytest

from gmft_spark.sources.pdfparse import ParsedPDF
from gmft_spark.sources.pdfparse.images import decode_image, render_page_full
from gmft_spark.sources.pdfparse.objects import (
    Stream,
    _lzw_decode,
    decode_stream,
)


def _mini_pdf(content: bytes) -> bytes:
    """A one-page PDF around the given content stream. The parser's
    object scanner indexes `N G obj` directly, so a classic xref is
    not required for these tests."""
    objs = [
        b"1 0 obj\n<</Type/Catalog/Pages 2 0 R>>\nendobj\n",
        b"2 0 obj\n<</Type/Pages/Kids[3 0 R]/Count 1>>\nendobj\n",
        b"3 0 obj\n<</Type/Page/Parent 2 0 R/MediaBox[0 0 200 100]"
        b"/Contents 4 0 R/Resources<<>>>>\nendobj\n",
        b"4 0 obj\n<</Length %d>>\nstream\n%b\nendstream\nendobj\n"
        % (len(content), content),
    ]
    body = b"%PDF-1.4\n" + b"".join(objs)
    return body + b"\ntrailer\n<</Root 1 0 R/Size 5>>\n%%EOF\n"


def _img_of(doc, page=0):
    ims = doc.page_images(page)
    assert len(ims) == 1
    return ims[0]


def test_lzw_filter_roundtrip_via_encoder_twin():
    # PDF-spec LZW with the TIFF early-change convention; encoder twin
    # lives in the test to keep the production path decode-only
    def enc(data, early=1):
        table = {bytes([i]): i for i in range(256)}
        nxt, width = 258, 9
        out, acc, nb = bytearray(), 0, 0

        def emit(code, w=None):
            nonlocal acc, nb
            acc = (acc << width) | code
            nb += width
            while nb >= 8:
                nb -= 8
                out.append((acc >> nb) & 0xFF)

        emit(256)
        w = b""
        for b in data:
            c = bytes([b])
            if w + c in table:
                w += c
                continue
            emit(table[w])
            if nxt < 4096:
                table[w + c] = nxt
                nxt += 1
                if nxt + early - 1 >= (1 << width) and width < 12:
                    width += 1
            else:
                emit(256)
                table = {bytes([i]): i for i in range(256)}
                nxt, width = 258, 9
            w = c
        if w:
            emit(table[w])
        emit(257)
        if nb:
            out.append((acc << (8 - nb)) & 0xFF)
        return bytes(out)

    import itertools
    import random

    # width-growth boundaries incl. the 4096 CLEAR restart
    for n in (100, 1200, 9000, 20000):
        data = bytes(
            itertools.islice(
                (b for p in itertools.product(range(256), repeat=2)
                 for b in p),
                n,
            )
        )
        assert _lzw_decode(enc(data)) == data
    rng = random.Random(2)
    for _ in range(15):
        data = bytes(
            rng.choice(b"abcdXYZ\x00\xff")
            for _ in range(rng.randint(0, 5000))
        )
        for early in (0, 1):
            assert _lzw_decode(enc(data, early), early) == data
    with pytest.raises(ValueError):
        _lzw_decode(b"\xff\xff\xff\xff")  # code out of any table


def test_lzw_stream_filter_with_tiff_predictor():
    # TIFF predictor 2 = per-row horizontal differencing
    rows = np.array([[10, 5, 250, 6], [100, 200, 30, 40]], dtype=np.uint8)
    diff = rows.copy()
    diff[:, 1:] = rows[:, 1:] - rows[:, :-1]
    st = Stream(
        {"Filter": "FlateDecode",
         "DecodeParms": {"Predictor": 2, "Columns": 4, "Colors": 1,
                         "BitsPerComponent": 8}},
        zlib.compress(diff.tobytes()),
    )
    assert decode_stream(st) == rows.tobytes()


def test_inline_image_uncompressed_exact_length():
    # raw samples deliberately contain b'EI ' — the exact-length path
    # must not terminate early on it
    pix = bytearray(range(64, 64 + 8))
    pix[2:5] = b"EI "  # hostile bytes inside the sample data
    content = (
        b"q 40 0 0 20 10 30 cm BI /W 4 /H 2 /BPC 8 /CS /G ID "
        + bytes(pix)
        + b" EI Q BT ET"
    )
    doc = ParsedPDF(_mini_pdf(content))
    st, ctm = _img_of(doc)
    assert ctm == (40.0, 0.0, 0.0, 20.0, 10.0, 30.0)
    assert st.dict["Width"] == 4 and st.dict["Height"] == 2
    luma, alpha = decode_image(doc.pdf, st)
    assert luma.shape == (2, 4)
    assert luma.tobytes() == bytes(pix)


def test_inline_image_filters_expand_abbreviations():
    pix = bytes(range(16, 16 + 12))
    # AHx
    hexed = pix.hex().encode()
    c1 = (b"BI /W 4 /H 3 /BPC 8 /CS /G /F /AHx ID " + hexed + b"> EI")
    # Fl
    c2 = (b"BI /W 4 /H 3 /BPC 8 /CS /G /F /Fl ID "
          + zlib.compress(pix) + b" EI")
    for content in (c1, c2):
        doc = ParsedPDF(_mini_pdf(b"q " + content + b" Q"))
        st, _ = _img_of(doc)
        luma, _ = decode_image(doc.pdf, st)
        assert luma.tobytes() == pix, content[:24]


def test_inline_image_mask_stencil():
    content = (
        b"q 8 0 0 2 0 0 cm BI /W 8 /H 2 /IM true ID "
        + bytes([0b10101010, 0b01010101])
        + b" EI Q"
    )
    doc = ParsedPDF(_mini_pdf(content))
    st, _ = _img_of(doc)
    luma, alpha = decode_image(doc.pdf, st)
    assert alpha is not None and alpha.shape == (2, 8)
    # default Decode: sample 0 paints
    assert alpha[0].tolist() == [False, True] * 4
    assert alpha[1].tolist() == [True, False] * 4


def test_inline_image_composites_into_page_render():
    # a solid black 2x2 image stretched over a 40x20 rect at (10, 30)
    content = (
        b"q 40 0 0 20 10 30 cm BI /W 2 /H 2 /BPC 8 /CS /G ID "
        + b"\x00\x00\x00\x00" + b" EI Q"
    )
    doc = ParsedPDF(_mini_pdf(content))
    full = render_page_full(doc, 0)
    ys, xs = np.nonzero(full < 128)
    assert xs.min() == 10 and xs.max() == 49
    # page height 100, rect y in [30, 50) user space → rows [50, 70)
    assert ys.min() == 50 and ys.max() == 69


def test_malformed_inline_image_is_skipped_and_text_survives():
    # W=0 is malformed: the image is dropped but the interpreter
    # resynchronizes at EI and keeps processing operators
    content = (
        b"BI /W 0 /H 2 /BPC 8 /CS /G ID \x00\x00 EI "
        b"q 8 0 0 2 0 0 cm BI /W 8 /H 2 /IM true ID "
        + bytes([0, 255]) + b" EI Q"
    )
    doc = ParsedPDF(_mini_pdf(content))
    ims = doc.page_images(0)
    assert len(ims) == 1  # only the well-formed one
    assert ims[0][0].dict["Width"] == 8
