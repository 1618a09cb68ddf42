"""CCITT Group 3/4 codec (kernel/ccitt.py) — table integrity, encoder/
decoder roundtrips, corpus decode goldens, and the decode_image seam.

Reference behavior: pdfium's fax decoder (CCITTFaxDecode filter) feeding
FPDF_RenderPageBitmap; the two corpus streams below were the last two
undecoded images in the reference golden corpus (8.pdf p3, 9.pdf p17,
both K=-1 Group 4). Their shape/ink goldens were measured once at the
first successful decode and pinned — a single wrong table entry
desynchronizes the prefix-code stream and fails the row geometry long
before the golden comparison.
"""

import numpy as np
import pytest

from gmft_spark.kernel.ccitt import (
    _BLACK_CODES,
    _EXT_MAKEUP,
    _MODE_CODES,
    _WHITE_CODES,
    decode_ccitt,
    decode_g3_1d,
    decode_g3_2d,
    decode_g4,
    encode_g3_1d,
    encode_g3_2d,
    encode_g4,
)
from gmft_spark.sources.pdfparse import ParsedPDF
from gmft_spark.sources.pdfparse.images import decode_image
from gmft_spark.sources.pdfparse.objects import Stream

PDF_DIR = "/root/reference/data/pdfs"


# ── table integrity ──────────────────────────────────────────────────


def _assert_prefix_free(codes):
    seen = [bits for bits, _ in codes]
    assert len(set(seen)) == len(seen), "duplicate code"
    for a in seen:
        for b in seen:
            if a is not b:
                assert not b.startswith(a), f"{a} prefixes {b}"


def test_run_tables_are_prefix_free_and_complete():
    for base in (_WHITE_CODES, _BLACK_CODES):
        _assert_prefix_free(base + _EXT_MAKEUP)
        runs = sorted(r for _, r in base + _EXT_MAKEUP)
        assert runs[:64] == list(range(64))  # every terminating length
        assert runs[64:] == list(range(64, 2561, 64))  # every makeup


def test_mode_codes_prefix_free():
    _assert_prefix_free(_MODE_CODES)


# ── roundtrips ───────────────────────────────────────────────────────


def test_g4_roundtrip_random():
    rng = np.random.default_rng(7)
    for _ in range(60):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 90))
        bm = (rng.random((h, w)) < rng.uniform(0.02, 0.98)).astype(np.uint8)
        assert (decode_g4(encode_g4(bm), w, h) == bm).all()


def test_g4_roundtrip_edges():
    cases = [
        np.zeros((3, 17), np.uint8),
        np.ones((3, 17), np.uint8),
        np.eye(8, dtype=np.uint8),
        np.zeros((1, 1), np.uint8),
        np.ones((1, 1), np.uint8),
    ]
    # makeup chains: runs longer than 2560 need chained makeups
    long = np.zeros((2, 6000), np.uint8)
    long[0, 5990:] = 1
    long[1, :3000] = 1
    cases.append(long)
    # vertical-mode stress: single-pixel drift per row
    drift = np.zeros((32, 64), np.uint8)
    for y in range(32):
        drift[y, y : y + 3] = 1
    cases.append(drift)
    for bm in cases:
        assert (decode_g4(encode_g4(bm), bm.shape[1], bm.shape[0]) == bm).all()


def test_g3_1d_roundtrip_with_and_without_eol():
    rng = np.random.default_rng(3)
    for eol in (True, False):
        bm = (rng.random((12, 61)) < 0.4).astype(np.uint8)
        assert (decode_g3_1d(encode_g3_1d(bm, eol=eol), 61, 12) == bm).all()


def test_decode_g4_stops_at_eofb_without_row_count():
    bm = (np.arange(40).reshape(5, 8) % 3 == 0).astype(np.uint8)
    out = decode_g4(encode_g4(bm), 8, None)
    assert (out == bm).all()


# ── containment ──────────────────────────────────────────────────────


def test_malformed_streams_raise_value_error():
    with pytest.raises(ValueError):
        decode_g4(b"\x00" * 16, 64, 4)  # zero bits: invalid mode code
    with pytest.raises(ValueError):
        decode_g4(encode_g4(np.zeros((2, 8), np.uint8)), 8, 100)  # short
    with pytest.raises(ValueError):
        decode_g4(b"", 0, 1)  # bad geometry


# ── T.4 mixed 2-D (K > 0) ────────────────────────────────────────────


@pytest.mark.parametrize("k", [1, 2, 4])
@pytest.mark.parametrize("byte_align", [False, True])
def test_g3_2d_roundtrip_random(k, byte_align):
    rng = np.random.default_rng(100 * k + byte_align)
    for _ in range(25):
        h = int(rng.integers(1, 30))
        w = int(rng.integers(1, 80))
        bm = (rng.random((h, w)) < rng.uniform(0.05, 0.95)).astype(np.uint8)
        enc = encode_g3_2d(bm, k=k, byte_align=byte_align)
        assert (decode_g3_2d(enc, w, h, byte_align=byte_align) == bm).all()
        # dispatcher: any K > 0 routes to the mixed 2-D decoder
        assert (decode_ccitt(enc, w, h, k=k, byte_align=byte_align) == bm).all()


def test_g3_2d_rowless_count_and_rtc():
    bm = (np.arange(48).reshape(6, 8) % 5 == 0).astype(np.uint8)
    enc = encode_g3_2d(bm, k=2)
    # rows=None: stops at input end
    assert (decode_g3_2d(enc, 8, None) == bm).all()
    # rows=None with an explicit RTC appended (6 × EOL+1)
    rtc = b""
    acc = ""
    for _ in range(6):
        acc += "000000000001" + "1"
    acc += "0" * ((-len(acc)) % 8)
    rtc = bytes(int(acc[i : i + 8], 2) for i in range(0, len(acc), 8))
    assert (decode_g3_2d(enc + rtc, 8, None) == bm).all()


def test_g3_2d_k1_is_all_one_d_rows():
    # k=1 tags every row 1-D: the stream is EOL+1 framed MH rows
    bm = (np.eye(5, 40) > 0).astype(np.uint8)
    enc = encode_g3_2d(bm, k=1)
    assert (decode_g3_2d(enc, 40, 5) == bm).all()


def test_g3_2d_malformed_raises():
    with pytest.raises(ValueError):
        decode_g3_2d(b"\xff\xff\xff\xff", 8, 2)  # no EOL where required
    bm = np.ones((4, 16), np.uint8)
    enc = encode_g3_2d(bm, k=2)
    with pytest.raises(ValueError):
        decode_g3_2d(enc, 16, 100)  # short stream vs declared rows
    with pytest.raises(ValueError):
        encode_g3_2d(bm, k=0)


# ── corpus goldens ───────────────────────────────────────────────────


@pytest.mark.parametrize(
    "name,page,shape,n_painted",
    [
        ("8.pdf", 3, (3054, 3443), 492168),
        ("9.pdf", 17, (1190, 1539), 77456),
    ],
)
def test_corpus_g4_scans_decode_to_pinned_goldens(name, page, shape, n_painted):
    """Both corpus fax scans are /ImageMask stencils: sample 0 paints
    (black), so the decode surfaces as the alpha channel."""
    doc = ParsedPDF(open(f"{PDF_DIR}/{name}", "rb").read())
    ccitt = [
        st
        for st, _ in doc.page_images(page)
        if "CCITT" in str(doc.pdf.resolve(st.dict.get("Filter")))
    ]
    assert len(ccitt) == 1
    luma, alpha = decode_image(doc.pdf, ccitt[0])
    assert luma.shape == shape and alpha is not None
    assert int(alpha.sum()) == n_painted
    assert 0.01 < alpha.mean() < 0.20  # plausible document scan


def test_corpus_has_no_image_seams_left():
    """Every Image XObject across all 11 corpus PDFs now decodes."""
    ok = seams = 0
    import glob

    for p in sorted(glob.glob(f"{PDF_DIR}/*.pdf")):
        doc = ParsedPDF(open(p, "rb").read())
        for pno in range(len(doc)):
            for st, _ in doc.page_images(pno):
                try:
                    decode_image(doc.pdf, st)
                    ok += 1
                except NotImplementedError:
                    seams += 1
    assert (ok, seams) == (60, 0)


# ── decode_image seam details ────────────────────────────────────────


class _Ident:
    def resolve(self, x):
        return x


def _ccitt_stream(bm: np.ndarray, **parms) -> Stream:
    base = {"K": -1, "Columns": bm.shape[1]}
    base.update(parms)
    return Stream(
        {
            "Width": bm.shape[1],
            "Height": bm.shape[0],
            "BitsPerComponent": 1,
            "ColorSpace": "DeviceGray",
            "Filter": "CCITTFaxDecode",
            "DecodeParms": base,
        },
        encode_g4(bm),
    )


def test_decode_image_ccitt_black_is_1_flip():
    bm = np.zeros((4, 16), np.uint8)
    bm[1, 2:9] = 1
    luma, _ = decode_image(_Ident(), _ccitt_stream(bm))
    assert ((luma == 0) == (bm == 1)).all()  # default: black sample 0
    luma1, _ = decode_image(_Ident(), _ccitt_stream(bm, BlackIs1=True))
    assert ((luma1 == 0) == (bm == 0)).all()  # flipped sample sense


def test_run_length_decode_filter():
    """RunLengthDecode is now a data filter in decode_stream."""
    from gmft_spark.sources.pdfparse.objects import decode_stream

    payload = b"\x02abc" + bytes([257 - 5]) + b"x" + b"\x80trailing"
    st = Stream({"Filter": "RunLengthDecode"}, payload)
    assert decode_stream(st) == b"abc" + b"x" * 5
