"""Prediction visualization (reference gmft/table_visualization.py /
CroppedTable.visualize): label-colored outlines drawn into the page
raster, emitted as PNG bytes — golden-pinned on the tiny fixture and
driven through the Spark operator."""

import hashlib

import numpy as np
import pytest

from gmft_spark.kernel.raster import (
    VIS_COLORS,
    decode_png,
    draw_predictions,
    draw_rect,
    encode_png,
    render_words,
    to_rgb,
)
from tests.fixtures_tiny import (
    TINY_PRED_BOXES,
    TINY_PRED_LABELS,
    TINY_TABLE_BBOX,
    TINY_WORDS,
)

# byte-golden of the tiny.pdf page overlaid with the reference's own
# structure predictions (tiny_info, test_serial.py) in its label colors
TINY_VIS_MD5 = "cc027b96db15f592217d78442326764d"


def _tiny_overlay():
    page = render_words([w[:4] for w in TINY_WORDS], 612, 792)
    return draw_predictions(
        page,
        TINY_PRED_BOXES,
        TINY_PRED_LABELS,
        offset=(TINY_TABLE_BBOX[0], TINY_TABLE_BBOX[1]),
    )


def test_tiny_visualization_golden():
    png = encode_png(_tiny_overlay())
    assert hashlib.md5(png).hexdigest() == TINY_VIS_MD5
    back = decode_png(png)
    # every reference label class present in tiny renders its color
    for lbl in set(TINY_PRED_LABELS):
        color = VIS_COLORS[lbl]
        assert np.any(np.all(back == color, axis=-1)), f"label {lbl} missing"


def test_label_filter_drops_classes():
    page = render_words([w[:4] for w in TINY_WORDS], 612, 792)
    only_rows = draw_predictions(
        page,
        TINY_PRED_BOXES,
        TINY_PRED_LABELS,
        offset=(TINY_TABLE_BBOX[0], TINY_TABLE_BBOX[1]),
        label_filter=[2],
    )
    assert np.any(np.all(only_rows == VIS_COLORS[2], axis=-1))
    assert not np.any(np.all(only_rows == VIS_COLORS[1], axis=-1))


def test_draw_rect_strokes_edges_not_interior():
    rgb = to_rgb(np.full((40, 40), 255, dtype=np.uint8))
    draw_rect(rgb, 10, 10, 30, 30, (255, 0, 0), linewidth=2)
    red = np.all(rgb == (255, 0, 0), axis=-1)
    assert red[10, 20] and red[30, 20] and red[20, 10] and red[20, 30]
    assert not red[20, 20]  # interior untouched
    # clamping: a box exceeding the canvas must not throw
    draw_rect(rgb, -5, -5, 60, 60, (0, 0, 255), linewidth=3)


def test_visualize_detections_operator(spark):
    from gmft_spark.operators.detect import detect_tables
    from gmft_spark.operators.render import render_pages, visualize_detections
    from gmft_spark.sources.transcripts import transcripts_from_documents

    t = transcripts_from_documents(spark, "/root/testdata/sf0.001", sample_mod=50)
    rendered = render_pages(t).localCheckpoint(eager=True)
    dets = detect_tables(t)
    out = visualize_detections(rendered, dets).collect()
    assert len(out) == rendered.count()  # one overlay per page, even det-less
    by_key = {(r["conv_id"], r["turn_idx"]): r for r in out}
    det_rows = dets.collect()
    assert det_rows, "fixture subsample must contain detections"
    d = det_rows[0]
    r = by_key[(d["conv_id"], d["turn_idx"])]
    assert r["n_boxes"] >= 1
    arr = decode_png(bytes(r["png"]))
    assert arr.ndim == 3
    # the detection outline is red at the box's top edge midpoint
    mx = int((d["x0"] + d["x1"]) / 2)
    y0 = int(d["y0"])
    band = arr[max(0, y0 - 2) : y0 + 3, mx]
    assert np.any(np.all(band == (255, 0, 0), axis=-1))
    # a page is never all-outline: white background survives
    assert np.any(np.all(arr == (255, 255, 255), axis=-1))


def test_visualize_pages_without_detections_pass_through(spark):
    from gmft_spark.operators.render import render_pages, visualize_detections
    from gmft_spark.sources.transcripts import transcripts_from_documents

    t = transcripts_from_documents(spark, "/root/testdata/sf0.001", sample_mod=100)
    rendered = render_pages(t)
    empty = spark.createDataFrame(
        [],
        "conv_id string, turn_idx int, det_id int, x0 double, y0 double,"
        " x1 double, y1 double, score double, label int",
    )
    out = visualize_detections(rendered, empty)
    rows = out.collect()
    assert rows and all(r["n_boxes"] == 0 for r in rows)
    arr = decode_png(bytes(rows[0]["png"]))
    assert arr.ndim == 3  # still an RGB payload, no boxes drawn
    assert not np.any(np.all(arr == (255, 0, 0), axis=-1))
