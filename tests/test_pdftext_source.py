"""pdftext payload source (sources/pdftext.py): parsing an actual
dictionary_output JSON document must reproduce the reference binding's
word stream — same order, same cleaning — kernel and Spark forms, and
agree with the span-row adapter end-to-end."""

import json

from gmft_spark.kernel.synth import synth_scene
from gmft_spark.sources.pdftext import (
    parse_pdftext_payload,
    synthesize_pdftext_payload,
    words_from_pdftext_payloads,
)
from gmft_spark.sources.spans import spans_to_words, words_from_span_rows


def _scene_words(conv_id="conv-src0-0", turn_idx=0):
    scene = synth_scene(conv_id, turn_idx)
    return [
        (float(b[0]), float(b[1]), float(b[2]), float(b[3]), t)
        for b, t in zip(scene.word_boxes, scene.word_texts)
    ]


def test_kernel_roundtrip_preserves_order_and_text():
    words = _scene_words()
    payload = synthesize_pdftext_payload([words])
    pages = parse_pdftext_payload(payload)
    assert len(pages) == 1
    assert pages[0] == words  # exact order + coords + text


def test_cleaning_matches_reference_rules():
    payload = synthesize_pdftext_payload(
        [[(0.0, 0.0, 10.0, 10.0, "  a\nb \t"), (1.0, 0.0, 2.0, 1.0, "\n")]]
    )
    pages = parse_pdftext_payload(payload)
    # newlines removed FIRST, then whitespace stripped (pdftext.py:99)
    assert [t for *_c, t in pages[0]] == ["a\nb".replace("\n", ""), ""]


def test_extra_payload_keys_are_ignored():
    # font/char metadata (real dictionary_output carries both) must not
    # break the typed parse
    words = _scene_words()[:5]
    payload = json.loads(synthesize_pdftext_payload([words]))
    payload[0]["rotation"] = 0
    for blk in payload[0]["blocks"]:
        blk["bbox"] = [0, 0, 1, 1]
        for ln in blk["lines"]:
            ln["bbox"] = [0, 0, 1, 1]
            for sp in ln["spans"]:
                sp["chars"] = [{"char": "x", "bbox": [0, 0, 1, 1]}]
    assert parse_pdftext_payload(json.dumps(payload))[0] == words


def test_spark_payload_words_match_kernel_and_span_adapter(spark):
    words0 = _scene_words("conv-src0-0", 0)
    words1 = _scene_words("conv-src1-3", 2)
    t = spark.createDataFrame(
        [
            ("c0", 0, synthesize_pdftext_payload([words0])),
            ("c1", 1, synthesize_pdftext_payload([words1, words0])),
            ("bad", 2, "{not json"),
        ],
        "conv_id string, turn_idx int, payload string",
    )
    out = words_from_pdftext_payloads(t)
    rows = out.orderBy("conv_id", "turn_idx", "page", "word_id").collect()
    # malformed payload contained: zero rows, no task failure
    assert not [r for r in rows if r["conv_id"] == "bad"]
    got0 = [
        (r["x0"], r["y0"], r["x1"], r["y1"], r["text"])
        for r in rows
        if r["conv_id"] == "c0"
    ]
    assert got0 == words0
    # multi-page payload: per-page word_id restarts and order holds
    c1p1 = [r for r in rows if r["conv_id"] == "c1" and r["page"] == 1]
    assert [r["word_id"] for r in c1p1] == list(range(len(words0)))
    assert [
        (r["x0"], r["y0"], r["x1"], r["y1"], r["text"]) for r in c1p1
    ] == words0
    # agreement with the span-row adapter over the same hierarchy
    span_rows = []
    payload = json.loads(synthesize_pdftext_payload([words0]))
    for b, blk in enumerate(payload[0]["blocks"]):
        for l, ln in enumerate(blk["lines"]):
            for s, sp in enumerate(ln["spans"]):
                span_rows.append(
                    ("c0", 0, b, l, s, *sp["bbox"], sp["text"])
                )
    spans_df = spark.createDataFrame(
        span_rows,
        "conv_id string, turn_idx int, block int, line int, span int,"
        " x0 double, y0 double, x1 double, y1 double, text string",
    )
    via_spans = [
        (r["x0"], r["y0"], r["x1"], r["y1"], r["text"])
        for r in words_from_span_rows(spans_df).orderBy("word_id").collect()
    ]
    assert via_spans == got0


def test_payload_parse_stays_jvm_side(spark):
    """The hot path must be from_json + posexplode (JVM built-ins) —
    no Python UDF, no mapInPandas stage."""
    t = spark.createDataFrame(
        [("c", 0, synthesize_pdftext_payload([_scene_words()[:4]]))],
        "conv_id string, turn_idx int, payload string",
    )
    plan = words_from_pdftext_payloads(t)._jdf.queryExecution().executedPlan().toString()
    # any Python-executing node contains one of these substrings
    # (MapInPandas / FlatMapGroupsInPandas / ArrowEvalPython / BatchEvalPython)
    assert "InPandas" not in plan and "EvalPython" not in plan
    assert "Generate" in plan  # the posexplode chain
