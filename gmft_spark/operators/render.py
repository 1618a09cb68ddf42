"""Page-render pipeline (S6): per-turn page rasters as real PNG payloads.

The reference's render step (gmft/pdf_bindings/pdfium.py:86-101,
``get_page_image`` rasterizing through pdfium) becomes a narrow
``mapInPandas`` map here: each turn's scene words are rasterized to a
word-occupancy bitmap (kernel/raster.py — glyph-level rendering needs
font rasterization the sandbox can't host) and encoded with the
from-scratch PNG codec, emitting genuine ``image/png`` bytes plus
SQL-checkable ink accounting.

The ink-pixel count is the value-hash hook: the rasterizer's pixel
coverage rule (floor/ceil at scale 1, clamped to the canvas) is summed
per word by the DuckDB twin over the SAME named scene draws
(scene_sql.PAGE_RENDER_SQL) — scene word boxes never overlap at pixel
resolution (≥3pt gaps by construction; differentially tested in
tests/test_raster.py), so the per-word sum IS the union area.

Scale notes: zero shuffles (the orderBy is oracle determinism only);
PNG bytes stay inside their scan partition; downstream consumers that
want only the accounting never deserialize the payload (column pruning).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gmft_spark.kernel.raster import encode_png, ink_pixels, render_words
from gmft_spark.kernel.synth import synth_scene

RENDER_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_words", IntegerType()),
        StructField("n_ink_px", LongType()),
        StructField("png", BinaryType()),
    ]
)


def render_pages(transcripts: DataFrame, scale: float = 1.0) -> DataFrame:
    """Rasterize each turn's page to a PNG payload + ink accounting."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for conv_id, turn_idx in zip(batch["conv_id"], batch["turn_idx"]):
                scene = synth_scene(conv_id, int(turn_idx))
                arr = render_words(
                    scene.word_boxes,
                    scene.page_width,
                    scene.page_height,
                    scale=scale,
                )
                rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": int(turn_idx),
                        "width": arr.shape[1],
                        "height": arr.shape[0],
                        "n_words": len(scene.word_boxes),
                        "n_ink_px": ink_pixels(arr),
                        # level 3: payloads are transient (in-partition), ~2x faster
                        "png": encode_png(arr, compress_level=3),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return transcripts.select("conv_id", "turn_idx").mapInPandas(
        run, schema=RENDER_SCHEMA
    )


GLYPH_RENDER_SCHEMA = StructType(
    [
        StructField("doc_name", StringType()),
        StructField("page_no", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_chars", IntegerType()),
        StructField("n_ink_px", LongType()),
        StructField("png", BinaryType()),
    ]
)


def rasterize_pdf_pages(
    binary_docs: DataFrame,
    scale: float = 1.0,
    draw_images: bool = False,
    pdf_password: "str | bytes" = b"",
) -> DataFrame:
    """REAL-document rasterization with glyph-outline ink
    (sources/pdfparse/glyphrender.py): (doc_name, payload) PDF bytes →
    one PNG per page, every glyph filled from its actual CFF/Type1/
    TrueType outline — the text-fidelity input for the image-side
    detectors (detect_tables_in_rasters / img2table), vs the word-box
    occupancy `render_pages` uses for synthetic scenes.

    ``draw_images=True`` additionally composites embedded Image
    XObjects (JPEG via kernel/jpeg.py, Flate raw samples, stencils,
    SMasks — sources/pdfparse/images.py) under the text layer, the
    closest approximation of pdfium's full page bitmap; foreign codecs
    (CCITTFax/JPX) skip per image. Off by default: the text-only layer
    is the detectors' input contract (figure ink would shift their
    synthetic-scene parity), and photo decode costs seconds/page in
    pure python.

    Narrow Arrow map, no shuffle; per-page grain parallelizes documents
    AND pages (a page renders independently of its siblings). Corrupt
    payloads contribute one error row (page_no -1) and never poison the
    batch."""
    from gmft_spark.sources.pdfparse import ParsedPDF
    from gmft_spark.sources.pdfparse.glyphrender import render_page_glyphs
    from gmft_spark.sources.pdfparse.images import draw_page_images

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for name, payload in zip(batch["doc_name"], batch["payload"]):
                try:
                    doc = ParsedPDF(bytes(payload), password=pdf_password)
                    pages = range(len(doc))
                    if not pages:
                        # a pageless parse is a failed document, not an
                        # empty output (the parser tolerates garbage
                        # headers; zero rows would silently vanish)
                        raise ValueError("no pages")
                except Exception:
                    rows.append(
                        {
                            "doc_name": name,
                            "page_no": -1,
                            "width": 0,
                            "height": 0,
                            "n_chars": 0,
                            "n_ink_px": 0,
                            "png": b"",
                        }
                    )
                    continue
                for p in pages:
                    try:
                        chars = doc.page_chars(p)
                        n_chars = len(chars)
                        canvas = None
                        if draw_images:
                            import math as _math

                            w_pts, h_pts = doc.page_size(p)
                            canvas = np.full(
                                (
                                    max(1, int(_math.ceil(h_pts * scale))),
                                    max(1, int(_math.ceil(w_pts * scale))),
                                ),
                                255,
                                dtype=np.uint8,
                            )
                            draw_page_images(canvas, doc, p, scale=scale)
                        arr = render_page_glyphs(
                            doc, p, scale=scale, chars=chars, canvas=canvas
                        )
                    except Exception:
                        rows.append(
                            {
                                "doc_name": name,
                                "page_no": p,
                                "width": 0,
                                "height": 0,
                                "n_chars": 0,
                                "n_ink_px": 0,
                                "png": b"",
                            }
                        )
                        continue
                    rows.append(
                        {
                            "doc_name": name,
                            "page_no": p,
                            "width": arr.shape[1],
                            "height": arr.shape[0],
                            "n_chars": n_chars,
                            "n_ink_px": ink_pixels(arr),
                            "png": encode_png(arr, compress_level=3),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return binary_docs.select("doc_name", "payload").mapInPandas(
        run, schema=GLYPH_RENDER_SCHEMA
    )


CROP_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("det_id", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_ink_px", LongType()),
        StructField("png", BinaryType()),
    ]
)


def crop_table_images(
    rendered: DataFrame, detections: DataFrame, pad_px: int = 10
) -> DataFrame:
    """The reference's CroppedTable.image step (detectors/base.py: crop
    the detected table region out of the page image, pad before structure
    inference) over distributed rasters: join each page's PNG with its
    detections on (conv_id, turn_idx) — an equi-join both sides can
    co-partition on — then decode/crop/pad/re-encode per detection in a
    narrow map. Output: one padded table image per detection."""
    from gmft_spark.kernel.raster import crop, decode_png, ink_pixels, pad

    joined = rendered.select("conv_id", "turn_idx", "png").join(
        detections.select("conv_id", "turn_idx", "det_id", "x0", "y0", "x1", "y1"),
        ["conv_id", "turn_idx"],
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for conv_id, turn_idx, png, det_id, x0, y0, x1, y1 in zip(
                batch["conv_id"],
                batch["turn_idx"],
                batch["png"],
                batch["det_id"],
                batch["x0"],
                batch["y0"],
                batch["x1"],
                batch["y1"],
            ):
                try:
                    arr = decode_png(bytes(png))
                except ValueError:
                    continue  # corrupt page payload: no tile, no failure
                tile = pad(crop(arr, x0, y0, x1, y1), pad_px)
                rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": int(turn_idx),
                        "det_id": int(det_id),
                        "width": tile.shape[1],
                        "height": tile.shape[0],
                        "n_ink_px": ink_pixels(tile),
                        "png": encode_png(tile, compress_level=3),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return joined.mapInPandas(run, schema=CROP_SCHEMA)


STRUCTURE_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("det_id", IntegerType()),
        StructField("n_rows", IntegerType()),
        StructField("n_cols", IntegerType()),
        StructField("row_dividers", StringType()),  # JSON pixel midpoints
        StructField("col_dividers", StringType()),
    ]
)


def recognize_tile_structure(tiles: DataFrame) -> DataFrame:
    """img2table-style structure recognition from table IMAGES (the
    reference's D2 niche — whitespace-projection analysis of borderless
    tables): each cropped tile's ink is projected onto both axes, the
    interior blank runs become row/column dividers
    (kernel/raster.projection_gaps — pixel twin of the histogram
    formatter's sweep), and the grid shape is dividers+1. Cell TEXT from
    pixels would need OCR (img2table has the same dependency) — text
    recovery stays on the word-based paths; this operator recovers the
    grid geometry the detector's crops imply. Narrow map over the tile
    partition."""
    import json

    from gmft_spark.kernel.raster import decode_png, projection_gaps

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for conv_id, turn_idx, det_id, png in zip(
                batch["conv_id"], batch["turn_idx"], batch["det_id"], batch["png"]
            ):
                try:
                    arr = decode_png(bytes(png))
                except ValueError:
                    continue
                cgaps = projection_gaps(arr, axis=0)
                rgaps = projection_gaps(arr, axis=1)
                rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": int(turn_idx),
                        "det_id": int(det_id),
                        "n_rows": len(rgaps) + 1,
                        "n_cols": len(cgaps) + 1,
                        "row_dividers": json.dumps(
                            [(a + b) / 2 for a, b in rgaps]
                        ),
                        "col_dividers": json.dumps(
                            [(a + b) / 2 for a, b in cgaps]
                        ),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return tiles.select("conv_id", "turn_idx", "det_id", "png").mapInPandas(
        run, schema=STRUCTURE_SCHEMA
    )


AHASH_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("block_y", IntegerType()),
        StructField("block_x", IntegerType()),
        StructField("ink_px", LongType()),
        StructField("bit", IntegerType()),
    ]
)


def page_ahash(transcripts: DataFrame) -> DataFrame:
    """Perceptual average-hash of each turn's rendered page — the visual
    near-dup signal for image corpora: 64 rows per page (8×8 tile grid),
    each carrying the tile's ink count and its hash bit (tile ink
    strictly above the page's mean tile ink). Two visually-similar pages
    differ in few bits (Hamming distance over the plane); identical
    layouts collide exactly.

    Narrow map over the scan (rasterize + integer tile sums per turn, no
    PNG encode); the SQL twin (scene_sql.AHASH_SQL) re-derives every tile
    count from the scene words' clamped pixel areas — valid because scene
    word boxes never overlap at pixel resolution (the render-ink
    tripwire, tests/test_raster.py)."""
    from gmft_spark.kernel.raster import block_ahash

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for conv_id, turn_idx in zip(batch["conv_id"], batch["turn_idx"]):
                scene = synth_scene(conv_id, int(turn_idx))
                arr = render_words(
                    scene.word_boxes, scene.page_width, scene.page_height
                )
                sums, bits = block_ahash(arr)
                for by in range(8):
                    for bx in range(8):
                        rows.append(
                            {
                                "conv_id": conv_id,
                                "turn_idx": int(turn_idx),
                                "block_y": by,
                                "block_x": bx,
                                "ink_px": int(sums[by, bx]),
                                "bit": int(bits[by, bx]),
                            }
                        )
            if rows:
                yield pd.DataFrame(rows)

    return (
        transcripts.select("conv_id", "turn_idx")
        .mapInPandas(run, schema=AHASH_SCHEMA)
        .orderBy("conv_id", "turn_idx", "block_y", "block_x")
    )


VIS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("n_boxes", IntegerType()),
        StructField("png", BinaryType()),
    ]
)


def visualize_detections(
    rendered: DataFrame, detections: DataFrame, linewidth: int = 3
) -> DataFrame:
    """Prediction-visualization overlay (reference
    gmft/table_visualization.py / CroppedTable.visualize): each page's
    PNG with its detections outlined in the reference's label colors
    (red=table, blue=column, green=row, yellow=column header,
    orange=projected row header, violet=spanning cell). Emits one RGB
    PNG per page — the debug artifact users pull when a table extracts
    wrong.

    Plan shape: detections aggregate to one boxes-array row per page
    (map-side combinable), then an equi-join on (conv_id, turn_idx) with
    the page payloads and a narrow draw+encode map — payload bytes never
    shuffle more than the one co-partitioned join."""
    from gmft_spark.kernel.raster import decode_png, draw_predictions, encode_png

    boxes = detections.groupBy("conv_id", "turn_idx").agg(
        F.collect_list(F.struct("x0", "y0", "x1", "y1", "label", "det_id")).alias(
            "boxes"
        )
    )
    joined = rendered.select("conv_id", "turn_idx", "png").join(
        boxes, ["conv_id", "turn_idx"], "left"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for conv_id, turn_idx, png, blist in zip(
                batch["conv_id"], batch["turn_idx"], batch["png"], batch["boxes"]
            ):
                arr = decode_png(bytes(png))
                items = [] if blist is None else sorted(blist, key=lambda b: b["det_id"])
                rgb = draw_predictions(
                    arr,
                    [(b["x0"], b["y0"], b["x1"], b["y1"]) for b in items],
                    [b["label"] for b in items],
                    linewidth=linewidth,
                )
                rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": int(turn_idx),
                        "n_boxes": len(items),
                        "png": encode_png(rgb, compress_level=3),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return joined.mapInPandas(run, schema=VIS_SCHEMA)


SIG_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("sig_lo", LongType()),
        StructField("sig_hi", LongType()),
    ]
)


def page_visual_signatures(transcripts: DataFrame) -> DataFrame:
    """64-bit perceptual ahash per page packed into two 32-bit halves
    (bit index = 8·block_y + block_x; indexes 0-31 → sig_lo, 32-63 →
    sig_hi — two BIGINTs so the top bit never fights a signed long).
    Narrow map: rasterize + tile sums, no PNG encode."""
    from gmft_spark.kernel.raster import block_ahash, render_words

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for conv_id, turn_idx in zip(batch["conv_id"], batch["turn_idx"]):
                scene = synth_scene(conv_id, int(turn_idx))
                arr = render_words(
                    scene.word_boxes, scene.page_width, scene.page_height
                )
                _sums, bits = block_ahash(arr)
                flat = bits.flatten()
                lo = sum(int(flat[i]) << i for i in range(32))
                hi = sum(int(flat[i]) << (i - 32) for i in range(32, 64))
                rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": int(turn_idx),
                        "sig_lo": lo,
                        "sig_hi": hi,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return transcripts.select("conv_id", "turn_idx").mapInPandas(
        run, schema=SIG_SCHEMA
    )


def pdf_page_visual_signatures(
    binary_docs: DataFrame,
    scale: float = 1.0,
    pdf_password: "str | bytes" = b"",
) -> DataFrame:
    """64-bit ahash signatures of REAL document pages, rendered with
    glyph-outline ink (glyphrender) — the visual near-dup signal for
    actual PDF corpora, drop-in for ``dedup_pages_visual`` (doc_name
    rides the conv_id slot, page_no the turn_idx slot). One narrow map:
    parse → rasterize → 8×8 tile ahash → bit-pack, no PNG round-trip.
    Unparseable/pageless documents contribute no signature rows (they
    can't be visual dups of anything; run ``rasterize_pdf_pages`` for
    explicit error accounting).

    Also carries ``n_ink_px`` — the page's exact ink pixel count, the
    CONFIRMATION channel for candidate pairs: the 64-bit ahash is a
    recall device (templated corpora collide on it by design — pages
    that LOOK alike at 8×8 granularity), while exact/near-exact ink
    agreement separates true re-renders from same-template pages."""
    from gmft_spark.kernel.raster import block_ahash
    from gmft_spark.sources.pdfparse import ParsedPDF
    from gmft_spark.sources.pdfparse.glyphrender import render_page_glyphs

    schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("sig_lo", LongType()),
            StructField("sig_hi", LongType()),
            StructField("n_ink_px", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for name, payload in zip(batch["doc_name"], batch["payload"]):
                try:
                    doc = ParsedPDF(bytes(payload), password=pdf_password)
                except Exception:
                    continue
                for p in range(len(doc)):
                    try:
                        arr = render_page_glyphs(doc, p, scale=scale)
                    except Exception:
                        continue
                    sums, bits = block_ahash(arr)
                    lo = hi = 0
                    for by in range(8):
                        for bx in range(8):
                            idx = by * 8 + bx
                            if bits[by, bx]:
                                if idx < 32:
                                    lo |= 1 << idx
                                else:
                                    hi |= 1 << (idx % 32)
                    rows.append(
                        {
                            "conv_id": name,
                            "turn_idx": p,
                            "sig_lo": lo,
                            "sig_hi": hi,
                            "n_ink_px": int(sums.sum()),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return binary_docs.select("doc_name", "payload").mapInPandas(
        run, schema=schema
    )


def pack_visual_signatures(ahash: DataFrame) -> DataFrame:
    """Bit-pack a page_ahash frame into the (sig_lo, sig_hi) signature
    schema without touching pixels again: the signature IS the ahash bit
    plane (bit index 8·block_y + block_x), so a 64-row groupBy of shifted
    sums reproduces page_visual_signatures exactly (pinned by
    tests/test_visual_dedup.py::test_pack_matches_direct_signatures).
    Use this when an ahash frame already exists (the gate's shared
    kernel pass); use page_visual_signatures to go straight from pages."""
    idx = F.col("block_y") * 8 + F.col("block_x")
    # SQL shiftleft: the Python wrapper wants a literal shift, the SQL
    # function takes a column
    contrib = F.expr(
        "shiftleft(cast(bit AS BIGINT), cast((block_y*8 + block_x) % 32 AS INT))"
    )
    return (
        ahash.groupBy("conv_id", "turn_idx")
        .agg(
            F.sum(F.when(idx < 32, contrib).otherwise(F.lit(0))).alias("sig_lo"),
            F.sum(F.when(idx >= 32, contrib).otherwise(F.lit(0))).alias("sig_hi"),
        )
        .select("conv_id", "turn_idx", "sig_lo", "sig_hi")
    )


def dedup_pages_visual(
    signatures: DataFrame, max_hamming: int = 2
) -> DataFrame:
    """Visual near-dup pairs by BANDED Hamming join over the ahash plane:
    the 64-bit signature splits into 8 one-byte bands; pages sharing any
    band bucket become candidates (one equi-join on (band, value) — the
    MinHash-LSH shape, no all-pairs), then the exact Hamming distance
    (bit_count of the xor, JVM-side) confirms. By pigeonhole the banding
    is EXACT for any max_hamming < 8: d differing bits touch at most d
    bands, so at least one band matches exactly. Scale: band buckets key
    the one shuffle; identical-layout bursts (the hot bucket case) are
    true dup sets and AQE skew-split handles their size."""
    if max_hamming > 7:
        raise ValueError(
            "dedup_pages_visual is exact only for max_hamming < 8 "
            "(8 one-byte bands; pigeonhole) — a pair differing by one bit "
            "per band would be silently missed. Widen the banding scheme "
            f"before requesting max_hamming={max_hamming}."
        )
    key = F.struct(F.col("conv_id").alias("c"), F.col("turn_idx").alias("t"))
    bands = signatures.select(
        key.alias("k"),
        "sig_lo",
        "sig_hi",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftright(
                                F.col("sig_lo" if b < 4 else "sig_hi"),
                                8 * (b % 4),
                            ).bitwiseAND(255)
                        ).alias("val"),
                    )
                    for b in range(8)
                ]
            )
        ).alias("bv"),
    ).select("k", "sig_lo", "sig_hi", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .select(
            F.col("a.k").alias("ka"),
            F.col("b.k").alias("kb"),
            (
                F.bit_count(
                    F.col("a.sig_lo").bitwiseXOR(F.col("b.sig_lo"))
                )
                + F.bit_count(
                    F.col("a.sig_hi").bitwiseXOR(F.col("b.sig_hi"))
                )
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return cand.select(
        F.col("ka.c").alias("conv_a"),
        F.col("ka.t").alias("turn_a"),
        F.col("kb.c").alias("conv_b"),
        F.col("kb.t").alias("turn_b"),
        F.col("hamming").cast("int").alias("hamming"),
    ).orderBy("conv_a", "turn_a", "conv_b", "turn_b")
