"""S4 span-source parity: a block/line/span hierarchy flattened through the
adapter must drive extraction to results identical to the native word
stream (reference gmft/pdf_bindings/pdftext.py:75-107 — spans in
block→line→span order, newline-stripped trimmed text, same coords)."""

import numpy as np

from gmft_spark.config import ExtractConfig
from gmft_spark.kernel.synth import synth_scene
from gmft_spark.kernel.table import extract_table
from gmft_spark.sources.spans import spans_to_words, words_from_span_rows


def _scene_as_dict_page(scene):
    """Wrap a scene's words into the pdftext dict hierarchy: one block per
    table (plus one for the caption), one line per distinct y0 run, one
    span per word — with whitespace noise the adapter must strip."""
    blocks = []
    cur_block = None
    cur_line = None
    prev_y0 = None
    for (x0, y0, x1, y1), text in zip(
        scene.word_boxes.tolist(), scene.word_texts
    ):
        if prev_y0 is None or abs(y0 - prev_y0) > 40.0:
            cur_block = {"lines": []}
            blocks.append(cur_block)
            cur_line = None
        if cur_line is None or y0 != prev_y0:
            cur_line = {"spans": []}
            cur_block["lines"].append(cur_line)
        cur_line["spans"].append(
            {"bbox": [x0, y0, x1, y1], "text": f" {text}\n"}
        )
        prev_y0 = y0
    return {"blocks": blocks}


def test_spans_flatten_preserves_order_and_cleans_text():
    scene = synth_scene("span-parity", 3)
    words = spans_to_words(_scene_as_dict_page(scene))
    assert [w[4] for w in words] == scene.word_texts
    assert np.allclose(
        np.array([w[:4] for w in words]), scene.word_boxes
    )


def test_span_source_identical_extraction():
    cfg = ExtractConfig()
    for i in range(8):
        scene = synth_scene("span-parity", i)
        words = spans_to_words(_scene_as_dict_page(scene))
        span_boxes = np.array([w[:4] for w in words], dtype=np.float64)
        span_texts = [w[4] for w in words]
        for tbl in scene.tables:
            a = extract_table(
                tbl.scores, tbl.labels, tbl.boxes,
                scene.word_boxes, scene.word_texts, tbl.bbox, cfg,
                angle=tbl.angle,
            )
            b = extract_table(
                tbl.scores, tbl.labels, tbl.boxes,
                span_boxes, span_texts, tbl.bbox, cfg,
                angle=tbl.angle,
            )
            assert a.status == b.status
            assert a.csv == b.csv
            assert a.columns == b.columns
            assert a.grid == b.grid


def test_spark_span_rows_adapter(spark):
    scene = synth_scene("span-parity", 5)
    rows = []
    page = _scene_as_dict_page(scene)
    for bi, block in enumerate(page["blocks"]):
        for li, line in enumerate(block["lines"]):
            for si, span in enumerate(line["spans"]):
                x0, y0, x1, y1 = span["bbox"]
                rows.append(
                    ("conv-s", 5, bi, li, si, x0, y0, x1, y1, span["text"])
                )
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, block int, line int, span int, "
        "x0 double, y0 double, x1 double, y1 double, text string",
    )
    out = words_from_span_rows(df).orderBy("word_id").collect()
    assert [r["text"] for r in out] == scene.word_texts
    assert [r["word_id"] for r in out] == list(range(len(scene.word_texts)))
    got = np.array([[r["x0"], r["y0"], r["x1"], r["y1"]] for r in out])
    assert np.allclose(got, scene.word_boxes)
