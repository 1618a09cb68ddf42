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


def test_corrupt_conversation_pdf_becomes_error_rows(spark):
    """A document that fails to parse (or loses pages) degrades to one
    error row per turn — the task survives (containment contract)."""
    from gmft_spark.kernel.synth import synth_scene
    from gmft_spark.sources.pdfgen import scenes_to_pdf

    def bad_pdf(conv_id, turn_idxs):
        if conv_id.endswith("-0"):
            return b"%PDF-1.4 truncated garbage"
        if conv_id.endswith("-1"):
            # parses, but with a missing page
            return scenes_to_pdf(
                [synth_scene(conv_id, t) for t in turn_idxs[:-1]]
            )
        return scenes_to_pdf([synth_scene(conv_id, t) for t in turn_idxs])

    t = transcripts_from_documents(spark, SF_DIR)
    out = extract_tables_from_conversation_pdfs(t, pdf_fn=bad_pdf)
    bad = out.filter(out["conv_id"].endswith("-0") | out["conv_id"].endswith("-1"))
    assert bad.count() > 0
    assert {r["status"] for r in bad.collect()} == {"error"}
    assert all(
        "unparseable conversation PDF" in r["message"] for r in bad.collect()
    )
    good = out.filter(~(out["conv_id"].endswith("-0") | out["conv_id"].endswith("-1")))
    assert good.filter(good["status"] == "ok").count() > 0


def test_conversation_pdf_is_deterministic():
    assert conversation_pdf("conv-c", [0, 2]) == conversation_pdf(
        "conv-c", [0, 2]
    )
