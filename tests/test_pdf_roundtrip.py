"""Real-payload path: scene → PDF bytes → parse → extract, in Spark.

Three layers of evidence:
  * the PDF writer/parser round-trip is float-exact per word;
  * the Spark pipeline decoding real byte payloads produces byte-equal
    CSVs to the direct scene path (whose kernel is itself golden-checked
    against the reference);
  * the reference corpus PDFs flow through the Spark word-extraction
    primitive as binary columns and agree with single-process parsing.
"""

import glob
import os

import pytest

from gmft_spark.kernel.synth import synth_scene
from gmft_spark.sources.pdfgen import scene_to_pdf, turn_pdf
from gmft_spark.sources.pdfparse import ParsedPDF

TURNS = [("conv-a", 3), ("conv-b", 17), ("conv-c", 101), ("conv-d", 5)]


class TestWriterParserRoundTrip:
    @pytest.mark.parametrize("conv_id,turn_idx", TURNS)
    def test_words_roundtrip_exactly(self, conv_id, turn_idx):
        scene = synth_scene(conv_id, turn_idx)
        doc = ParsedPDF(scene_to_pdf(scene))
        assert len(doc) == 1
        words = doc.page_words(0)
        assert [w[4] for w in words] == scene.word_texts
        for (x0, y0, x1, y1), w in zip(scene.word_boxes.tolist(), words):
            assert abs(w[0] - x0) < 1e-3
            assert abs(w[1] - y0) < 1e-3
            assert abs(w[2] - x1) < 1e-3
            assert abs(w[3] - y1) < 1e-3

    def test_pdf_is_self_contained(self):
        data = turn_pdf("conv-x", 9)
        assert data.startswith(b"%PDF-") and data.rstrip().endswith(b"%%EOF")
        # parses with no reference to the generator
        assert len(ParsedPDF(data).page_words(0)) > 0


class TestSparkPdfPipeline:
    def _transcripts(self, spark, with_payload):
        rows = [
            (c, t, bytearray(turn_pdf(c, t)) if with_payload else None)
            for c, t in TURNS
        ]
        if with_payload:
            return spark.createDataFrame(
                rows, "conv_id string, turn_idx int, payload binary"
            )
        return spark.createDataFrame(
            [(c, t) for c, t, _ in rows], "conv_id string, turn_idx int"
        )

    @pytest.mark.parametrize("with_payload", [True, False])
    def test_pdf_path_equals_scene_path(self, spark, with_payload):
        from gmft_spark.operators.extract import extract_tables
        from gmft_spark.operators.pdf_extract import extract_tables_from_pdfs

        df = self._transcripts(spark, with_payload)
        via_pdf = {
            (r["conv_id"], r["turn_idx"], r["table_id"]): (
                r["status"],
                r["csv"],
                r["table_text"],
                r["caption_above"],
            )
            for r in extract_tables_from_pdfs(df).collect()
        }
        via_scene = {
            (r["conv_id"], r["turn_idx"], r["table_id"]): (
                r["status"],
                r["csv"],
                r["table_text"],
                r["caption_above"],
            )
            for r in extract_tables(
                self._transcripts(spark, False)
            ).collect()
        }
        assert via_pdf == via_scene
        assert all(v[0] == "ok" for v in via_pdf.values())

    def test_corrupt_payload_degrades_to_error_row(self, spark):
        from gmft_spark.operators.pdf_extract import extract_tables_from_pdfs

        df = spark.createDataFrame(
            [("conv-bad", 1, bytearray(b"not a pdf"))],
            "conv_id string, turn_idx int, payload binary",
        )
        rows = extract_tables_from_pdfs(df).collect()
        assert len(rows) == 1
        assert rows[0]["status"] == "error"
        assert "unparseable" in rows[0]["message"]


REF_PDFS = sorted(glob.glob("/root/reference/data/pdfs/*.pdf"))


@pytest.mark.skipif(not REF_PDFS, reason="reference corpus not present")
class TestCorpusThroughSpark:
    def test_corpus_binary_columns_match_single_process(self, spark):
        from gmft_spark.operators.pdf_extract import corpus_page_words

        picks = [p for p in REF_PDFS if os.path.basename(p) in
                 ("tiny.pdf", "7.pdf")]
        rows = [
            (os.path.basename(p), bytearray(open(p, "rb").read()))
            for p in picks
        ]
        df = spark.createDataFrame(rows, "doc_name string, payload binary")
        words = corpus_page_words(df)
        got = {
            (r["doc_name"], r["page_no"]): r["n"]
            for r in words.groupBy("doc_name", "page_no")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        for p in picks:
            doc = ParsedPDF(open(p, "rb").read())
            for page in range(len(doc)):
                expect = len(doc.page_words(page))
                if expect:
                    assert got[(os.path.basename(p), page)] == expect
        # tiny.pdf page 0 must carry the golden 31 words
        assert got[("tiny.pdf", 0)] == 31


class TestMalformedPayloadContainment:
    """Corrupt byte-streams must become error rows, never task-killing
    exceptions — at corpus scale a single bad payload cannot fail a
    1000-executor stage."""

    def test_garbage_and_empty_payloads_yield_error_rows(self):
        from gmft_spark.config import ExtractConfig
        from gmft_spark.operators.pdf_extract import extract_turn_from_pdf

        cfg = ExtractConfig()
        for payload in (b"", b"not a pdf at all" * 10, b"%PDF-1.4\n\x00\xff"):
            rows = extract_turn_from_pdf("c", 1, payload, cfg)
            assert len(rows) == 1
            assert rows[0]["status"] == "error"
            assert "unparseable PDF payload" in rows[0]["message"]

    def test_mutated_payloads_never_raise(self):
        from gmft_spark.config import ExtractConfig
        from gmft_spark.operators.pdf_extract import extract_turn_from_pdf
        from gmft_spark.sources.pdfgen import turn_pdf

        cfg = ExtractConfig()
        good = turn_pdf("c", 2)
        mutations = [good[: len(good) // 3], good[::-1], good[:50]]
        for i in range(0, len(good) - 1, 97):
            mutations.append(good[:i] + bytes([good[i] ^ 0xFF]) + good[i + 1:])
        for payload in mutations:
            rows = extract_turn_from_pdf("c", 2, payload, cfg)
            assert rows and all(r["status"] in ("ok", "error") for r in rows)
