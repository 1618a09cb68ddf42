"""Embedded-image decode + page compositing (sources/pdfparse/images.py).

Reference behavior: pdfium's FPDF_RenderPageBitmap paints Image
XObjects under the CTM in content order; gmft's rasterized pipeline
consumes that bitmap. The corpus counts and golden ink values below
were measured once against the reference PDFs and pinned.
"""

import zlib

import numpy as np
import pytest

from gmft_spark.kernel.jpeg import decode_jpeg, encode_jpeg
from gmft_spark.sources.pdfparse import ParsedPDF
from gmft_spark.sources.pdfparse.images import (
    _unpack_samples,
    composite_image,
    decode_image,
    draw_page_images,
    render_page_full,
)
from gmft_spark.sources.pdfparse.objects import Stream

PDF_DIR = "/root/reference/data/pdfs"

# image XObject Do-placements per corpus document (content order,
# forms recursed) — pinned against a one-time hand count
PLACEMENTS = {
    "1.pdf": 3, "2.pdf": 6, "3.pdf": 6, "4.pdf": 4, "5.pdf": 9,
    "6.pdf": 4, "7.pdf": 1, "8.pdf": 4, "9.pdf": 18, "tatr.pdf": 5,
    "tiny.pdf": 0,
}


class _Ident:
    """Resolver stub: synthetic streams carry direct (non-Ref) values."""

    def resolve(self, x):
        return x


def _doc(name: str) -> ParsedPDF:
    with open(f"{PDF_DIR}/{name}", "rb") as fh:
        return ParsedPDF(fh.read())


def test_corpus_image_placement_counts():
    for name, expect in PLACEMENTS.items():
        doc = _doc(name)
        n = sum(len(doc.page_images(p)) for p in range(len(doc)))
        assert n == expect, f"{name}: {n} != {expect}"


def test_corpus_subset_decodes_every_supported_image():
    """Decode the full image set of four documents (JPEG 4:2:0 photos,
    Flate charts, an Indexed palette, and 9.pdf's Group-4 fax scan —
    formerly a seam, now kernel/ccitt.py)."""
    stats = {}
    for name in ("3.pdf", "6.pdf", "7.pdf", "9.pdf"):
        doc = _doc(name)
        ok = seam = 0
        for p in range(len(doc)):
            for st, ctm in doc.page_images(p):
                try:
                    luma, alpha = decode_image(doc.pdf, st)
                    assert luma.dtype == np.uint8 and luma.ndim == 2
                    assert luma.size > 0
                    ok += 1
                except NotImplementedError:
                    seam += 1
        stats[name] = (ok, seam)
    assert stats == {
        "3.pdf": (6, 0),
        "6.pdf": (4, 0),
        "7.pdf": (1, 0),
        "9.pdf": (18, 0),  # incl. the CCITTFaxDecode G4 scan
    }


def test_composite_lands_exactly_in_ctm_rect():
    """6.pdf page 5 carries one JPEG figure: the pixels the full render
    changes (vs the text-only layer) must tile exactly the CTM-mapped
    unit square (user y flipped by the crop height)."""
    from gmft_spark.sources.pdfparse.glyphrender import render_page_glyphs

    doc = _doc("6.pdf")
    _, h_pts = doc.page_size(5)
    glyphs = render_page_glyphs(doc, 5)
    full = render_page_full(doc, 5)
    ys, xs = np.nonzero(full != glyphs)
    (st, ctm), = doc.page_images(5)
    a, b, c, d, e, f = ctm
    ux = [e, a + e, c + e, a + c + e]
    uy = [f, b + f, d + f, b + d + f]
    assert xs.min() == int(np.floor(min(ux)))
    assert xs.max() == int(np.ceil(max(ux))) - 1
    assert ys.min() == int(np.floor(h_pts - max(uy)))
    assert ys.max() == int(np.ceil(h_pts - min(uy))) - 1
    # golden dark-ink count for the composed page (text + figure)
    assert int((full < 128).sum()) == 47892


def test_render_full_equals_glyph_layer_without_images():
    doc = _doc("tiny.pdf")
    from gmft_spark.sources.pdfparse.glyphrender import render_page_glyphs

    assert np.array_equal(render_page_full(doc, 0), render_page_glyphs(doc, 0))


# --- synthetic exactness ------------------------------------------------


def test_unpack_samples_bit_depths():
    # 1-bit: 0b10110000 over 4 px/row, 2 rows (rows byte-aligned)
    arr = _unpack_samples(bytes([0b10110000, 0b01000000]), 4, 2, 1, 1)
    assert arr[:, :, 0].tolist() == [[255, 0, 255, 255], [0, 255, 0, 0]]
    # 4-bit: two samples per byte, scaled by 255/15 = 17
    arr = _unpack_samples(bytes([0x0F, 0x80]), 3, 1, 1, 4)
    assert arr[0, :, 0].tolist() == [0, 255, 8 * 17]
    # 16-bit big-endian keeps the high byte
    arr = _unpack_samples(bytes([0xAB, 0xCD, 0x01, 0x02]), 2, 1, 1, 16)
    assert arr[0, :, 0].tolist() == [0xAB, 0x01]
    with pytest.raises(ValueError):
        _unpack_samples(b"\x00", 100, 100, 1, 8)


def _gray_stream(pix: np.ndarray) -> Stream:
    return Stream(
        {
            "Width": pix.shape[1],
            "Height": pix.shape[0],
            "BitsPerComponent": 8,
            "ColorSpace": "DeviceGray",
            "Filter": "FlateDecode",
        },
        zlib.compress(pix.tobytes()),
    )


def test_decode_flate_gray_roundtrip():
    pix = (np.arange(24, dtype=np.uint8) * 10).reshape(4, 6)
    luma, alpha = decode_image(_Ident(), _gray_stream(pix))
    assert alpha is None and np.array_equal(luma, pix)


def test_decode_rgb_and_decode_array_inversion():
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[0, 0] = (255, 0, 0)
    rgb[1, 1] = (255, 255, 255)
    st = Stream(
        {
            "Width": 2, "Height": 2, "BitsPerComponent": 8,
            "ColorSpace": "DeviceRGB", "Filter": "FlateDecode",
        },
        zlib.compress(rgb.tobytes()),
    )
    luma, _ = decode_image(_Ident(), st)
    assert luma[0, 0] == (77 * 255 + 128) >> 8 and luma[1, 1] == 255
    # gray Decode [1 0] inverts
    pix = np.array([[0, 255]], dtype=np.uint8)
    st = _gray_stream(pix)
    st.dict["Decode"] = [1, 0]
    luma, _ = decode_image(_Ident(), st)
    assert luma.tolist() == [[255, 0]]


def test_decode_image_mask_stencil():
    # 2x2 mask, bits 0 paint: 0b01xxxxxx / 0b10xxxxxx
    st = Stream(
        {"Width": 2, "Height": 2, "ImageMask": True},
        bytes([0b01000000, 0b10000000]),
    )
    luma, alpha = decode_image(_Ident(), st)
    assert alpha.tolist() == [[True, False], [False, True]]
    assert (luma == 0).all()
    st.dict["Decode"] = [1, 0]
    _, alpha = decode_image(_Ident(), st)
    assert alpha.tolist() == [[False, True], [True, False]]


def test_decode_jpeg_xobject_matches_decoder():
    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (16, 24, 3), dtype=np.uint8)
    payload = encode_jpeg(rgb, quality=90)
    st = Stream(
        {"Width": 24, "Height": 16, "Filter": "DCTDecode"}, payload
    )
    luma, alpha = decode_image(_Ident(), st)
    arr = decode_jpeg(payload)
    r, g, b = (arr[..., i].astype(np.uint32) for i in range(3))
    expect = ((77 * r + 150 * g + 29 * b + 128) >> 8).astype(np.uint8)
    assert alpha is None and np.array_equal(luma, expect)


def test_smask_thresholds_alpha():
    pix = np.full((2, 2), 9, dtype=np.uint8)
    st = _gray_stream(pix)
    smask = np.array([[255, 0], [0, 255]], dtype=np.uint8)
    st.dict["SMask"] = _gray_stream(smask)
    luma, alpha = decode_image(_Ident(), st)
    assert alpha.tolist() == [[True, False], [False, True]]


def test_composite_axis_aligned_exact():
    canvas = np.full((10, 10), 255, dtype=np.uint8)
    luma = np.array([[0, 80], [160, 240]], dtype=np.uint8)
    # unit square → user rect [2,4)x[4,6) on a 10pt page → raster rows
    # 10-6..10-4 = [4,6), cols [2,4); image row 0 (v=1 top) lands first
    n = composite_image(canvas, luma, None, (2, 0, 0, 2, 2, 4), 10.0, 1.0)
    assert n == 4
    assert canvas[4:6, 2:4].tolist() == [[0, 80], [160, 240]]
    assert (canvas[:4] == 255).all() and (canvas[6:] == 255).all()


def test_composite_rotation_90():
    canvas = np.full((8, 8), 255, dtype=np.uint8)
    luma = np.array([[0, 100], [200, 250]], dtype=np.uint8)
    # 90° CCW: x' = -2v + 4, y' = 2u + 2 (user), page height 8
    composite_image(canvas, luma, None, (0, 2, -2, 0, 4, 2), 8.0, 1.0)
    # image (row j, col i) → user u=(i+.5)/2, v=1-(j+.5)/2 → check the
    # four destination cells carry the rotated samples
    assert canvas[4:6, 2:4].tolist() == [[100, 250], [0, 200]]


def test_composite_alpha_and_degenerate():
    canvas = np.full((4, 4), 255, dtype=np.uint8)
    luma = np.zeros((2, 2), dtype=np.uint8)
    alpha = np.array([[True, False], [False, True]])
    n = composite_image(canvas, luma, alpha, (2, 0, 0, 2, 1, 1), 4.0, 1.0)
    assert n == 2
    assert (canvas == 255).sum() == 14
    assert composite_image(canvas, luma, None, (0, 0, 0, 0, 1, 1), 4.0, 1.0) == 0


def test_draw_page_images_containment(monkeypatch):
    """A hostile/foreign image skips (counted), never poisons the page."""
    doc = _doc("9.pdf")
    pages = [p for p in range(len(doc)) if doc.page_images(p)]
    canvas = np.full((792, 612), 255, dtype=np.uint8)
    painted, skipped = draw_page_images(canvas, doc, pages[0])
    assert painted >= 1 and skipped >= 0
