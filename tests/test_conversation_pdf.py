"""Multi-page conversation PDFs: writer layout stability, page-exact
round-trip, and byte-equality of the document-shaped extraction path
against the per-turn payload path."""

import numpy as np

from gmft_spark.kernel.synth import synth_scene
from gmft_spark.operators.pdf_extract import (
    extract_tables_from_conversation_pdfs,
    extract_tables_from_pdfs,
)
from gmft_spark.sources.pdfgen import (
    conversation_pdf,
    scene_to_pdf,
    scenes_to_pdf,
)
from gmft_spark.sources.pdfparse import ParsedPDF
from gmft_spark.sources.transcripts import transcripts_from_documents

SF_DIR = "/root/testdata/sf0.001"


def test_single_page_layout_unchanged():
    s = synth_scene("conv-a", 3)
    assert scenes_to_pdf([s]) == scene_to_pdf(s)


def test_multipage_roundtrip_word_exact():
    scenes = [synth_scene("conv-b", t) for t in (0, 1, 5)]
    doc = ParsedPDF(scenes_to_pdf(scenes))
    assert len(doc) == 3
    for p, scene in enumerate(scenes):
        words = doc.page_words(p)
        assert [w[4] for w in words] == scene.word_texts
        got = np.array([w[:4] for w in words])
        assert np.allclose(got, scene.word_boxes, atol=1e-6)


def test_conversation_path_equals_per_turn_path(spark):
    t = transcripts_from_documents(spark, SF_DIR)
    per_turn = extract_tables_from_pdfs(t)
    per_conv = extract_tables_from_conversation_pdfs(t)

    def key(rows):
        return {
            (r["conv_id"], r["turn_idx"], r["table_id"]): (
                r["status"],
                r["csv"],
                r["table_text"],
                r["caption_above"],
                tuple(r["columns"] or ()),
            )
            for r in rows
        }

    a = key(per_turn.collect())
    b = key(per_conv.collect())
    assert a == b


def test_conversation_pdf_is_deterministic():
    assert conversation_pdf("conv-c", [0, 2]) == conversation_pdf(
        "conv-c", [0, 2]
    )
