"""Embedded-image decode and page compositing (Image XObjects).

Decodes the image streams real PDFs carry — DCTDecode (baseline JPEG,
via the from-scratch kernel/jpeg.py decoder) and raw-sample streams
behind the standard data filters (Flate/A85/AHx, handled by
objects.decode_stream) in DeviceGray/DeviceRGB/DeviceCMYK/ICCBased/
Indexed color, 1/2/4/8/16 bits per component, /ImageMask stencils,
/Decode inversion and /SMask soft masks — and composites them into the
glyph-raster page canvas under the full CTM recorded at the ``Do``
(general affine: rotation/shear handled by inverse mapping).

Reference behavior: pdfium's ``FPDF_RenderPageBitmap`` paints images in
content order under the page CTM; gmft's rasterized pipeline
(gmft/pdf_bindings/ to formatters) consumes that bitmap. Coverage here
is nearest-sample, alpha thresholded at 128 — deterministic across
platforms, no anti-aliasing (same contract as glyphrender).

CCITTFaxDecode (Group 4 K<0, Group 3 1-D K=0, and mixed 2-D K>0 —
kernel/ccitt.py, a from-scratch T.4/T.6 codec) and RunLengthDecode
(objects.decode_stream) decode natively. Format gaps (raise
``NotImplementedError``, callers skip per image): JPXDecode /
JBIG2Decode — the same external-codec seams the multimodal operators
document. Malformed
streams raise ``ValueError`` (containment contract shared with
decode_jpeg/decode_png).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from gmft_spark.kernel.ccitt import decode_ccitt
from gmft_spark.kernel.jpeg import decode_jpeg
from gmft_spark.sources.pdfparse.objects import Stream, decode_stream

# hostile-dimension containment, same spirit as kernel/jpeg.py
_MAX_PIXELS = 1 << 24

_DATA_FILTERS = {
    "FlateDecode", "Fl", "ASCIIHexDecode", "AHx", "ASCII85Decode", "A85",
}
_UNSUPPORTED = {"JPXDecode", "JBIG2Decode"}

_CCITT = ("CCITTFaxDecode", "CCF")


def _filter_names(pdf, st: Stream) -> List[str]:
    filters = pdf.resolve(st.dict.get("Filter"))
    if filters is None:
        return []
    if not isinstance(filters, list):
        filters = [filters]
    return [str(pdf.resolve(f)) for f in filters]


def _parms_for(pdf, st: Stream, names: List[str], targets) -> dict:
    """DecodeParms dict aligned with the first filter named in
    ``targets`` (PDF allows a bare dict for a single filter)."""
    parms = pdf.resolve(st.dict.get("DecodeParms") or st.dict.get("DP"))
    if not isinstance(parms, list):
        parms = [parms]
    while len(parms) < len(names):
        parms.append(None)
    for name, pm in zip(names, parms):
        if name in targets:
            pm = pdf.resolve(pm)
            if isinstance(pm, dict):
                return {k: pdf.resolve(v) for k, v in pm.items()}
            return {}
    return {}


def _luma(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((77 * r + 150 * g + 29 * b + 128) >> 8).astype(np.uint8)


def _n_components(pdf, cs) -> Tuple[int, Optional[Tuple[np.ndarray, int]]]:
    """(samples per pixel, optional (palette_luma, base_ncomp) for
    Indexed). Unknown families decode as 1-component gray rather than
    fail — wrong colors beat a dropped image for layout fidelity."""
    cs = pdf.resolve(cs)
    if isinstance(cs, list) and cs:
        fam = str(pdf.resolve(cs[0]))
        if fam == "ICCBased" and len(cs) >= 2:
            prof = pdf.resolve(cs[1])
            n = pdf.resolve(prof.dict.get("N")) if isinstance(prof, Stream) else None
            return (int(n) if isinstance(n, int) else 1), None
        if fam == "Indexed" and len(cs) >= 4:
            base_n, _ = _n_components(pdf, cs[1])
            lookup = pdf.resolve(cs[3])
            if isinstance(lookup, Stream):
                raw = decode_stream(lookup, pdf)
            elif isinstance(lookup, bytes):
                raw = lookup
            else:
                raw = b""
            pal = np.frombuffer(raw, dtype=np.uint8)
            usable = len(pal) // max(base_n, 1)
            pal = pal[: usable * base_n].reshape(usable, base_n)
            if base_n >= 3:
                pal_luma = _luma(pal[:, :3])
            elif base_n == 1:
                pal_luma = pal[:, 0]
            else:
                pal_luma = pal.mean(axis=1).astype(np.uint8)
            return 1, (pal_luma, base_n)
        if fam in ("CalRGB", "Lab"):
            return 3, None
        if fam == "CalGray":
            return 1, None
        if fam == "DeviceN" and len(cs) >= 2:
            names = pdf.resolve(cs[1])
            return (len(names) if isinstance(names, list) else 1), None
        if fam == "Separation":
            return 1, None
        return 1, None
    name = str(cs) if cs is not None else "DeviceGray"
    if name in ("DeviceRGB", "RGB"):
        return 3, None
    if name in ("DeviceCMYK", "CMYK"):
        return 4, None
    return 1, None


def _unpack_samples(
    data: bytes, w: int, h: int, nc: int, bpc: int
) -> np.ndarray:
    """(h, w, nc) uint8 samples scaled to 0..255, rows byte-aligned per
    the imaging model. ValueError on short data."""
    row_bytes = (w * nc * bpc + 7) // 8
    need = row_bytes * h
    if len(data) < need:
        raise ValueError(
            f"image data short: {len(data)} < {need} ({w}x{h}x{nc}@{bpc})"
        )
    buf = np.frombuffer(data[:need], dtype=np.uint8).reshape(h, row_bytes)
    if bpc == 8:
        return buf[:, : w * nc].reshape(h, w, nc)
    if bpc == 16:
        return (
            buf[:, : w * nc * 2].reshape(h, w, nc, 2)[..., 0]
        )  # big-endian high byte
    if bpc in (1, 2, 4):
        bits = np.unpackbits(buf, axis=1)[:, : w * nc * bpc]
        vals = bits.reshape(h, w, nc, bpc)
        weights = (1 << np.arange(bpc - 1, -1, -1)).astype(np.uint16)
        raw = (vals.astype(np.uint16) * weights).sum(axis=3)
        maxv = (1 << bpc) - 1
        return (raw * 255 // maxv).astype(np.uint8)
    raise ValueError(f"unsupported BitsPerComponent {bpc}")


def _nearest_resize(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    sh, sw = arr.shape
    rows = (np.arange(h) * sh // h).clip(0, sh - 1)
    cols = (np.arange(w) * sw // w).clip(0, sw - 1)
    return arr[rows][:, cols]


def decode_image(
    pdf, st: Stream
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Decode one Image XObject → (luma uint8 (h, w), alpha bool (h, w)
    or None). ``NotImplementedError`` for foreign codecs, ``ValueError``
    for malformed/hostile streams."""
    d = st.dict
    w = int(pdf.resolve(d.get("Width")) or 0)
    h = int(pdf.resolve(d.get("Height")) or 0)
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"bad image dims {w}x{h}")
    names = _filter_names(pdf, st)
    bad = [n for n in names if n in _UNSUPPORTED]
    if bad:
        raise NotImplementedError(f"image codec {bad[0]} unsupported")
    is_mask = bool(pdf.resolve(d.get("ImageMask")))
    decode_arr = pdf.resolve(d.get("Decode"))
    data = decode_stream(st, pdf)  # applies data filters, passes DCT

    if any(n in _CCITT for n in names):
        pm = _parms_for(pdf, st, names, _CCITT)
        cols = int(pm.get("Columns", 1728) or 1728)
        rws = int(pm.get("Rows") or h)
        black = decode_ccitt(
            data,
            cols,
            rws,
            k=int(pm.get("K", 0) or 0),
            byte_align=bool(pm.get("EncodedByteAlign")),
        )
        # PDF sample contract: BlackIs1 false (default) → black = 0 bit
        bits = black if bool(pm.get("BlackIs1")) else 1 - black
        data = np.packbits(bits, axis=1).tobytes()
        if (black.shape[0], cols) != (h, w):
            h, w = black.shape[0], cols  # trust the decode, like DCT

    if any(n in ("DCTDecode", "DCT") for n in names):
        arr = decode_jpeg(data)
        if arr.shape[:2] != (h, w):
            # trust the decoded frame (some writers round /Height)
            h, w = arr.shape[:2]
        luma = _luma(arr) if arr.ndim == 3 else arr
        alpha: Optional[np.ndarray] = None
    elif is_mask:
        samples = _unpack_samples(data, w, h, 1, 1)[:, :, 0]
        painted = samples == 0  # default Decode [0 1]: sample 0 paints
        if (
            isinstance(decode_arr, list)
            and len(decode_arr) >= 2
            and float(pdf.resolve(decode_arr[0]) or 0) == 1.0
        ):
            painted = ~painted
        luma = np.zeros((h, w), dtype=np.uint8)  # stencil inks black
        alpha = painted
    else:
        bpc = int(pdf.resolve(d.get("BitsPerComponent")) or 8)
        if any(n in _CCITT for n in names):
            bpc = 1  # CCITT output is bilevel by definition
        nc, palette = _n_components(pdf, d.get("ColorSpace"))
        samples = _unpack_samples(data, w, h, nc, bpc)
        if palette is not None:
            pal_luma, _ = palette
            maxv = (1 << bpc) - 1
            idx = samples[:, :, 0].astype(np.int64) * maxv // 255
            idx = idx.clip(0, max(len(pal_luma) - 1, 0))
            luma = (
                pal_luma[idx]
                if len(pal_luma)
                else np.full((h, w), 255, np.uint8)
            )
        elif nc >= 4:  # CMYK: 0 = no ink
            c = samples[:, :, 0].astype(np.int32)
            m = samples[:, :, 1].astype(np.int32)
            y = samples[:, :, 2].astype(np.int32)
            k = samples[:, :, 3].astype(np.int32)
            rgb = np.stack(
                [
                    (255 - np.minimum(255, c + k)),
                    (255 - np.minimum(255, m + k)),
                    (255 - np.minimum(255, y + k)),
                ],
                axis=2,
            ).astype(np.uint8)
            luma = _luma(rgb)
        elif nc == 3:
            luma = _luma(samples)
        else:
            luma = samples[:, :, 0]
            if (
                isinstance(decode_arr, list)
                and len(decode_arr) >= 2
                and float(pdf.resolve(decode_arr[0]) or 0) == 1.0
            ):
                luma = 255 - luma
        alpha = None

    smask = pdf.resolve(d.get("SMask"))
    if isinstance(smask, Stream):
        try:
            s_luma, _ = decode_image(pdf, smask)
            if s_luma.shape != luma.shape:
                s_luma = _nearest_resize(s_luma, *luma.shape)
            s_alpha = s_luma >= 128
            alpha = s_alpha if alpha is None else (alpha & s_alpha)
        except (ValueError, NotImplementedError):
            pass  # unreadable mask: paint opaque
    return luma, alpha


def composite_image(
    canvas: np.ndarray,
    luma: np.ndarray,
    alpha: Optional[np.ndarray],
    ctm: Tuple[float, float, float, float, float, float],
    page_height: float,
    scale: float,
) -> int:
    """Paint a decoded image onto the raster canvas under ``ctm`` (unit
    square → user space), inverse-mapped with nearest sampling; returns
    painted-pixel count. Degenerate matrices paint nothing."""
    h_img, w_img = luma.shape
    if h_img == 0 or w_img == 0:
        return 0
    a, b, c, d, e, f = ctm
    A = np.array([[a, c], [-b, -d]], dtype=np.float64) * scale
    t = np.array([e * scale, (page_height - f) * scale])
    det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    if abs(det) < 1e-9:
        return 0
    corners = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], dtype=np.float64)
    px = corners @ A.T + t
    H, W = canvas.shape
    x0 = max(0, int(np.floor(px[:, 0].min())))
    x1 = min(W, int(np.ceil(px[:, 0].max())))
    y0 = max(0, int(np.floor(px[:, 1].min())))
    y1 = min(H, int(np.ceil(px[:, 1].max())))
    if x1 <= x0 or y1 <= y0:
        return 0
    inv = np.linalg.inv(A)
    xs = np.arange(x0, x1, dtype=np.float64) + 0.5 - t[0]
    ys = np.arange(y0, y1, dtype=np.float64) + 0.5 - t[1]
    u = inv[0, 0] * xs[None, :] + inv[0, 1] * ys[:, None]
    v = inv[1, 0] * xs[None, :] + inv[1, 1] * ys[:, None]
    inside = (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
    if not inside.any():
        return 0
    col = np.clip((u * w_img).astype(np.int64), 0, w_img - 1)
    row = np.clip(((1.0 - v) * h_img).astype(np.int64), 0, h_img - 1)
    vals = luma[row, col]
    if alpha is not None:
        inside &= alpha[row, col]
    region = canvas[y0:y1, x0:x1]
    region[inside] = vals[inside]
    return int(inside.sum())


def draw_page_images(
    canvas: np.ndarray, doc, page_no: int, scale: float = 1.0
) -> Tuple[int, int]:
    """Composite every decodable image on page ``page_no`` onto
    ``canvas`` in paint order. Returns (images painted, images skipped).
    Per-image containment: a foreign codec or malformed stream skips
    that image only."""
    _, height = doc.page_size(page_no)
    painted = skipped = 0
    for st, ctm in doc.page_images(page_no):
        try:
            luma, alpha = decode_image(doc.pdf, st)
            composite_image(canvas, luma, alpha, ctm, height, scale)
            painted += 1
        except (ValueError, NotImplementedError, OverflowError, TypeError):
            skipped += 1
    return painted, skipped


def render_page_full(doc, page_no: int, scale: float = 1.0) -> np.ndarray:
    """Full-fidelity page raster: embedded images first (painter order),
    then glyph-outline text ink on top — the closest this parser gets to
    pdfium's ``FPDF_RenderPageBitmap``. Text-over-image wins where they
    overlap (images paint before the text layer, matching the dominant
    content-stream order in real documents)."""
    import math

    from gmft_spark.sources.pdfparse.glyphrender import render_page_glyphs

    width, height = doc.page_size(page_no)
    H = max(1, int(math.ceil(height * scale)))
    W = max(1, int(math.ceil(width * scale)))
    canvas = np.full((H, W), 255, dtype=np.uint8)
    draw_page_images(canvas, doc, page_no, scale=scale)
    return render_page_glyphs(doc, page_no, scale=scale, canvas=canvas)
