"""Text-from-pixels (kernel/ocr.py + glyphrender OCR): deterministic
template recognition over glyph-rendered pages — the reference's
external-OCR seam (gmft/detectors/img2table.py) closed for documents
with embedded fonts.

Oracle: the parser's own text (page_words) for the SAME bytes — the OCR
sees only pixels, so agreement is a genuine round trip
(text → outlines → ink → text)."""

import collections

import numpy as np
import pytest

from gmft_spark.kernel.ocr import (
    TemplateLibrary,
    assemble_text,
    connected_component,
    ocr_page,
)
from gmft_spark.sources.pdfparse import ParsedPDF
from gmft_spark.sources.pdfparse.glyphrender import (
    build_template_library,
    ocr_pdf_page,
)

PDFS = "/root/reference/data/pdfs"


# -- kernel unit behavior ----------------------------------------------------


def _bm(rows):
    return np.array([[c == "#" for c in r] for r in rows], dtype=bool)


def test_multi_part_glyph_claims_in_one_verification():
    """An 'i'-like template (dot + body, disconnected) claims both parts
    without any merge heuristic."""
    lib = TemplateLibrary()
    tmpl = _bm(["##", "..", "##", "##"])
    lib.add(tmpl, "i", adv=3.0)
    page = np.zeros((8, 8), dtype=bool)
    page[2:6, 3:5] = tmpl
    out = ocr_page(page, lib)
    assert [g[4] for g in out] == ["i"]


def test_touching_pair_decodes_left_to_right():
    """Two templates rendered flush (touching ink) decode as two glyphs:
    the left anchor claims the first, the remnant anchors the second."""
    lib = TemplateLibrary()
    a = _bm(["#.", "##"])
    b = _bm(["##", ".#"])
    lib.add(a, "a", adv=2.0)
    lib.add(b, "b", adv=2.0)
    page = np.zeros((4, 8), dtype=bool)
    page[1:3, 1:3] = a
    page[1:3, 3:5] = b  # flush: b starts where a ends
    out = ocr_page(page, lib)
    assert [g[4] for g in out] == ["a", "b"]


def test_unknown_ink_claims_component_as_replacement_char():
    lib = TemplateLibrary()
    lib.add(_bm(["##", "##"]), "o", adv=2.0)
    page = np.zeros((6, 6), dtype=bool)
    page[1:4, 1:4] = _bm(["#.#", ".#.", "#.#"])  # matches nothing
    out = ocr_page(page, lib)
    assert [g[4] for g in out] == ["�"]
    # the whole component was claimed (no repeated partial claims)
    assert len(out) == 1


def test_pen_based_spaces_not_ink_gaps():
    """A thin glyph with a wide advance ('1') followed flush-by-pen must
    NOT produce a space, while a true pen gap must."""
    lib = TemplateLibrary()
    one = _bm(["#", "#", "#", "#"])
    lib.add(one, "1", adv=6.0)  # wide advance, 1px ink
    page = np.zeros((8, 40), dtype=bool)
    page[2:6, 2] = True   # pen at 2, next pen = 8
    page[2:6, 8] = True   # flush by pen → same word
    page[2:6, 20] = True  # pen gap 6 past previous pen → space
    glyphs = ocr_page(page, lib)
    assert assemble_text(glyphs) == "11 1"


def test_connected_component_respects_claims():
    ink = np.zeros((4, 4), dtype=bool)
    ink[1, 1] = ink[1, 3] = True
    ink[2, 2] = True  # bridges (1,1)↔(1,3) diagonally
    claimed = np.zeros_like(ink)
    claimed[2, 2] = True  # claimed bridge cuts the component
    comp = connected_component(ink, claimed, 1, 1)
    assert comp[1, 1] and not comp[2, 2] and not comp[1, 3]


# -- document round trips ----------------------------------------------------


@pytest.fixture(scope="module")
def tiny():
    return ParsedPDF(open(f"{PDFS}/tiny.pdf", "rb").read())


def test_tiny_roundtrip_word_exact(tiny):
    text = ocr_pdf_page(tiny, 0, scale=2.0)
    assert text.split() == [w[4] for w in tiny.page_words(0)]
    # and the line structure survives
    assert text.splitlines()[0] == "Simple document"


def _char_accuracy(doc, lib, page):
    text = ocr_pdf_page(doc, page, scale=2.0, lib=lib)
    ref = collections.Counter(
        c for w in doc.page_words(page) for c in w[4]
    )
    got = collections.Counter(c for c in text if not c.isspace())
    return sum((ref & got).values()) / max(sum(ref.values()), 1)


def test_academic_page_char_accuracy():
    """Dense real-world page (1.pdf p0: rotated spine text, unmappable
    glyphs, tight kerning): ≥99% of reference characters recovered from
    pixels alone."""
    doc = ParsedPDF(open(f"{PDFS}/1.pdf", "rb").read())
    lib = build_template_library(doc, scale=2.0, pages=[0])
    assert _char_accuracy(doc, lib, 0) >= 0.99


def test_tatr_doc_min_page_accuracy():
    doc = ParsedPDF(open(f"{PDFS}/tatr.pdf", "rb").read())
    lib = build_template_library(doc, scale=2.0)
    accs = [_char_accuracy(doc, lib, p) for p in range(len(doc))]
    assert min(accs) >= 0.98
    assert sum(accs) / len(accs) >= 0.99


# -- Spark operator ----------------------------------------------------------


def test_ocr_pdf_pages_operator(spark):
    from pyspark.sql import functions as F

    from gmft_spark.operators.ocr import ocr_pdf_pages

    rows = [
        ("tiny.pdf", open(f"{PDFS}/tiny.pdf", "rb").read()),
        ("corrupt.pdf", b"%PDF-1.4 nothing"),
    ]
    df = spark.createDataFrame(rows, "doc_name string, payload binary")
    out = ocr_pdf_pages(df, scale=2.0).toPandas()
    err = out[out["doc_name"] == "corrupt.pdf"]
    assert len(err) == 1 and err.iloc[0]["page_no"] == -1
    tiny = out[out["doc_name"] == "tiny.pdf"].iloc[0]
    assert tiny["n_unknown"] == 0
    assert tiny["text"].split()[:2] == ["Simple", "document"]
    assert tiny["n_glyphs"] > 100


# -- image-only table extraction ---------------------------------------------


def test_image_only_table_extraction_reproduces_golden_table(spark):
    """THE image-only niche, end-to-end from pixels: render tiny.pdf,
    detect ink blocks, derive dividers (width-filtered gutters), OCR the
    cells — the ONE extracted table must equal the reference's known
    tiny.pdf table exactly, and the text paragraphs must be rejected
    (no dividers / low occupancy), all without reading a single word
    box from the content stream."""
    from gmft_spark.operators.ocr import extract_tables_from_images

    df = spark.createDataFrame(
        [("tiny.pdf", open(f"{PDFS}/tiny.pdf", "rb").read())],
        "doc_name string, payload binary",
    )
    out = extract_tables_from_images(df).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["n_rows"], row["n_cols"]) == (4, 3)
    assert row["csv"].strip().splitlines() == [
        "Name,Celsius,Fahrenheit",
        "Water Freezing Point,0,32",
        "Water Boiling Point,100,212",
        "Body Temperature,37,98.6",
    ]


def test_column_divider_width_filter_rejects_paragraphs():
    import numpy as np

    from gmft_spark.kernel.ocr import column_dividers

    # a "paragraph": uniform word gaps of 3px — no divider qualifies
    para = np.zeros((10, 60), dtype=bool)
    for x0 in range(2, 56, 8):
        para[2:8, x0 : x0 + 5] = True
    assert column_dividers(para) == []
    # a "table": word gaps of 3px plus one 20px gutter
    tab = np.zeros((10, 80), dtype=bool)
    for x0 in (2, 10, 18):
        tab[2:8, x0 : x0 + 5] = True
    tab[2:8, 45:70] = True
    divs = column_dividers(tab)
    assert len(divs) == 1 and 23 <= divs[0] <= 45
