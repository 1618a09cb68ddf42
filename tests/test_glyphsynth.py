"""Synthetic CFF glyph suite (sources/glyphsynth.py) — the closed-form
ink twin behind the glyph_render_parity gate query. The from-scratch
CFF writer must parse back through the REAL font loader and the
rendered page ink must equal the formula sum exactly (pixel-aligned
integer rectangles under nonzero-winding center sampling)."""

import numpy as np
import pytest

from gmft_spark.sources.glyphsynth import (
    N_GLYPHS,
    build_rect_cff,
    expected_ink,
    glyph_parity_pdf,
    pen_for,
    rect_for,
)


def test_cff_parses_through_real_loader():
    from gmft_spark.sources.pdfparse.cff import CFFFont

    rects = [(5, 7), (32, 33), (4, 3)]
    font = CFFFont(build_rect_cff(rects))
    assert font.num_glyphs == 4  # .notdef + 3
    for i, (w, h) in enumerate(rects):
        gid = font.name_to_gid(f"r{i}")
        assert gid == i + 1
        path = font.glyph_path(gid)
        assert path is not None and len(path) == 1
        xs = [p[0] for p in path[0]]
        ys = [p[1] for p in path[0]]
        assert (min(xs), min(ys), max(xs), max(ys)) == (0, 0, w, h)
        assert font.advance(gid) == 48
    # .notdef executes blank: contours present but markless
    assert font.glyph_path(0) == []


@pytest.mark.parametrize("doc_id", [0, 3, 17, 255, 4096])
def test_page_ink_is_closed_form(doc_id):
    from gmft_spark.sources.pdfparse import ParsedPDF
    from gmft_spark.sources.pdfparse.glyphrender import render_page_glyphs

    doc = ParsedPDF(glyph_parity_pdf(doc_id))
    assert len(doc) == 1
    assert len(doc.page_chars(0)) == N_GLYPHS
    arr = render_page_glyphs(doc, 0, scale=1.0)
    assert int((arr == 0).sum()) == expected_ink(doc_id)


def test_grid_precludes_overlap_and_clipping():
    # the closed-form ink claim requires disjoint, unclipped rects for
    # EVERY doc_id: bound the formulas, don't sample them
    w_max = 4 + 28
    h_max = 3 + 30
    assert w_max < 48 and h_max < 60  # cell pitch
    for j in range(N_GLYPHS):
        x, y = pen_for(j)
        assert 0 <= x and x + w_max <= 612
        assert h_max <= y <= 792  # blit rows [y_flip - h, y_flip)


def test_formula_bounds_match_docstring():
    vals = [rect_for(d, j) for d in range(64) for j in range(N_GLYPHS)]
    assert max(w for w, _ in vals) <= 32
    assert max(h for _, h in vals) <= 33
    assert min(w for w, _ in vals) >= 4
    assert min(h for _, h in vals) >= 3
