"""Spark surface for text-from-pixels (kernel/ocr.py + glyphrender).

Closes the reference's external-OCR seam (gmft/detectors/img2table.py
hands text recognition to an engine it does not ship): for documents
whose fonts are embedded — the normal case for real PDFs, whose subset
fonts travel with the file — recognition is deterministic template
verification against the very bitmaps the glyph renderer fills, with
measured ≥93% per-page character accuracy on the reference's golden
corpus and exact word round-trips on clean pages.

Scale design: one narrow ``mapInPandas`` over (doc_name, payload), no
shuffle. Per document the template library builds once (every distinct
(font, code, matrix) — subset fonts make this small) and all pages
recognize against it; pages parallelize across documents by partition.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OCR_SCHEMA = StructType(
    [
        StructField("doc_name", StringType()),
        StructField("page_no", IntegerType()),
        StructField("text", StringType()),
        StructField("n_glyphs", LongType()),
        StructField("n_unknown", LongType()),
    ]
)


IMG_TABLE_SCHEMA = StructType(
    [
        StructField("doc_name", StringType()),
        StructField("page_no", IntegerType()),
        StructField("det_id", IntegerType()),
        StructField("x0", LongType()),
        StructField("y0", LongType()),
        StructField("x1", LongType()),
        StructField("y1", LongType()),
        StructField("n_rows", IntegerType()),
        StructField("n_cols", IntegerType()),
        StructField("csv", StringType()),
    ]
)


def extract_tables_from_images(
    binary_docs: DataFrame, scale: float = 2.0
) -> DataFrame:
    """IMAGE-ONLY table extraction, end-to-end from pixels: render →
    ink-block detection (the raster detector) → divider structure
    (width-filtered column gutters: inter-word spaces share one narrow
    width scale, gutters are a multiple — paragraphs yield no dividers
    and are rejected as single-column) → template-OCR cell text → CSV.
    No word boxes, no content stream: the whole table comes back from
    the rendered image, which is the reference's img2table niche with
    its OCR dependency closed (for embedded-font documents).

    One narrow mapInPandas; coordinates are raster pixels at ``scale``
    (= page points × scale)."""
    import numpy as np

    from gmft_spark.kernel.ocr import (
        assemble_text,
        column_dividers,
        glyphs_to_grid,
        ocr_page,
        row_dividers,
    )
    from gmft_spark.operators.detect import DEFAULT_WEIGHTS, _LayoutDetector
    from gmft_spark.sources.pdfparse import ParsedPDF
    from gmft_spark.sources.pdfparse.glyphrender import (
        build_template_library,
        render_page_glyphs,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        det = _LayoutDetector.get(
            DEFAULT_WEIGHTS * np.array([scale, scale, 1.0, 1.0, 1.0])
        )
        for batch in batches:
            rows = []
            for name, payload in zip(batch["doc_name"], batch["payload"]):
                try:
                    doc = ParsedPDF(bytes(payload))
                    lib = build_template_library(doc, scale=scale)
                except Exception:
                    continue
                for p in range(len(doc)):
                    try:
                        arr = render_page_glyphs(doc, p, scale=scale)
                    except Exception:
                        continue
                    ink = arr < 128
                    glyphs = None  # OCR once per page, on demand
                    det_id = 0
                    for bbox, _score in det.infer_raster(arr):
                        x0, y0, x1, y1 = (int(v) for v in bbox)
                        tile = ink[y0:y1, x0:x1]
                        cdiv = column_dividers(tile)
                        if not cdiv:
                            continue  # single column: not a table
                        rdiv = row_dividers(tile)
                        if glyphs is None:
                            glyphs = ocr_page(ink, lib)
                        grid = glyphs_to_grid(
                            glyphs,
                            (x0, y0, x1, y1),
                            [x0 + d for d in cdiv],
                            [y0 + d for d in rdiv],
                        )
                        # occupancy sanity (the reference's low-density
                        # grid rejection): a paragraph whose long lines
                        # leak pseudo-gutters past its short lines fills
                        # only the first column on most rows
                        filled = sum(
                            1
                            for row in grid
                            if sum(1 for c in row if c) >= 2
                        )
                        if len(grid) < 2 or filled < 0.5 * len(grid):
                            continue
                        csv = pd.DataFrame(grid).to_csv(
                            index=False, header=False
                        )
                        rows.append(
                            {
                                "doc_name": name,
                                "page_no": p,
                                "det_id": det_id,
                                "x0": x0,
                                "y0": y0,
                                "x1": x1,
                                "y1": y1,
                                "n_rows": len(grid),
                                "n_cols": len(grid[0]) if grid else 0,
                                "csv": csv,
                            }
                        )
                        det_id += 1
            if rows:
                yield pd.DataFrame(rows)

    return binary_docs.select("doc_name", "payload").mapInPandas(
        run, schema=IMG_TABLE_SCHEMA
    )


def ocr_pdf_pages(binary_docs: DataFrame, scale: float = 2.0) -> DataFrame:
    """(doc_name, payload) PDF bytes → recognized text per page, straight
    from PIXELS (render with glyph outlines, then template-OCR the ink
    back). ``n_unknown`` counts U+FFFD emissions — ink no template
    verified (unmappable glyphs, descriptor-only fonts) — so recall is
    auditable per page. Unparseable documents emit one page_no -1 row."""
    from gmft_spark.kernel.ocr import assemble_text, ocr_page
    from gmft_spark.sources.pdfparse import ParsedPDF
    from gmft_spark.sources.pdfparse.glyphrender import (
        build_template_library,
        render_page_glyphs,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for name, payload in zip(batch["doc_name"], batch["payload"]):
                try:
                    doc = ParsedPDF(bytes(payload))
                    if not len(doc):
                        raise ValueError("no pages")
                    lib = build_template_library(doc, scale=scale)
                except Exception:
                    rows.append(
                        {
                            "doc_name": name,
                            "page_no": -1,
                            "text": "",
                            "n_glyphs": 0,
                            "n_unknown": 0,
                        }
                    )
                    continue
                for p in range(len(doc)):
                    try:
                        arr = render_page_glyphs(doc, p, scale=scale)
                        glyphs = ocr_page(arr < 128, lib)
                        text = assemble_text(glyphs)
                    except Exception:
                        rows.append(
                            {
                                "doc_name": name,
                                "page_no": p,
                                "text": "",
                                "n_glyphs": 0,
                                "n_unknown": -1,
                            }
                        )
                        continue
                    rows.append(
                        {
                            "doc_name": name,
                            "page_no": p,
                            "text": text,
                            "n_glyphs": len(glyphs),
                            "n_unknown": sum(
                                1 for g in glyphs if g[4] == "�"
                            ),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return binary_docs.select("doc_name", "payload").mapInPandas(
        run, schema=OCR_SCHEMA
    )
