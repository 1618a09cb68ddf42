"""From-scratch pure-Python PDF word extraction (no external deps).

Replicates the observable behavior of the reference's pdfium binding
(`/root/reference/gmft/pdf_bindings/pdfium.py:123-181`): per-page word
positions-and-text with top-left-origin coordinates, matching the
reference's committed golden word boxes (tiny_pdfium.tsv) to float
precision. Used to run the reference's 30 PDF CSV goldens end-to-end
inside this repo with no pypdfium2/torch dependency, and as the real
payload-decode seam for the Spark extraction pipeline.

Public API:
    ParsedPDF(data: bytes)
        .page_words(n)  -> [(x0, y0, x1, y1, text), …]  (top-left origin)
        .page_size(n)   -> (width, height)
        len(doc)        -> page count
"""

from gmft_spark.sources.pdfparse.textpage import ParsedPDF

__all__ = ["ParsedPDF"]
