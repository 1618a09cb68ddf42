"""Detection stage: broadcast-weights layout detector vs scene ground truth."""

from collections import defaultdict

from gmft_spark.kernel.geometry import iob
from gmft_spark.kernel.synth import synth_scene
from gmft_spark.operators.detect import detect_tables
from gmft_spark.sources.transcripts import synthesize_transcripts


def _iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def test_detector_finds_ground_truth_tables(spark):
    t = synthesize_transcripts(spark, n_convs=8, turns_per_conv=4)
    dets = detect_tables(t).collect()
    by_turn = defaultdict(list)
    for r in dets:
        by_turn[(r["conv_id"], r["turn_idx"])].append(
            (r["x0"], r["y0"], r["x1"], r["y1"])
        )
    assert len(by_turn) == 32
    hit = total = 0
    for (conv_id, turn_idx), cand in by_turn.items():
        scene = synth_scene(conv_id, turn_idx)
        for tbl in scene.tables:
            total += 1
            if any(_iou(tbl.bbox, c) > 0.5 for c in cand):
                hit += 1
    assert total >= 32
    # rotated tables (angle=90 scenes) are a genuinely harder layout case
    # for the gap-clustering stand-in model, as for the real detector
    assert hit / total >= 0.9  # recall on the synthetic corpus


def test_detected_bboxes_capture_table_words(spark):
    # every detection's words are a superset of one table's words
    scene = synth_scene("conv-0", 0)
    t = synthesize_transcripts(spark, n_convs=1, turns_per_conv=1)
    dets = [r for r in detect_tables(t).collect() if r["conv_id"] == "conv-0"]
    assert dets
    tbl = scene.tables[0]
    best = max(
        dets,
        key=lambda r: _iou(tbl.bbox, (r["x0"], r["y0"], r["x1"], r["y1"])),
    )
    det_box = (best["x0"], best["y0"], best["x1"], best["y1"])
    contained = sum(
        1 for w in scene.word_boxes if iob(tuple(w), det_box) > 0.9
    )
    in_table = sum(1 for w in scene.word_boxes if iob(tuple(w), tbl.bbox) > 0.5)
    assert contained >= in_table  # detector envelope covers the table words


def test_raster_detector_agrees_with_word_detector(spark):
    """Image-input inference (render → PNG → decode → detect) recovers
    the same table regions as the word-box path: matched count and
    IoU ≥ 0.85 per detection on unrotated scenes (rotated tables blur
    into one ink mass at raster fidelity — also genuinely harder for the
    real image detector)."""
    from gmft_spark.operators.detect import detect_tables_in_rasters
    from gmft_spark.operators.render import render_pages
    from gmft_spark.sources.transcripts import synthesize_transcripts

    t = synthesize_transcripts(spark, n_convs=6, turns_per_conv=4)
    word_dets = defaultdict(list)
    for r in detect_tables(t).collect():
        word_dets[(r["conv_id"], r["turn_idx"])].append(
            (r["x0"], r["y0"], r["x1"], r["y1"])
        )
    raster_dets = defaultdict(list)
    for r in detect_tables_in_rasters(render_pages(t)).collect():
        raster_dets[(r["conv_id"], r["turn_idx"])].append(
            (r["x0"], r["y0"], r["x1"], r["y1"])
        )
    compared = 0
    for key, wboxes in word_dets.items():
        conv_id, turn_idx = key
        scene = synth_scene(conv_id, turn_idx)
        if any(tbl.angle == 90 for tbl in scene.tables):
            continue
        rboxes = raster_dets.get(key, [])
        assert len(rboxes) == len(wboxes), key
        for wb in wboxes:
            assert max(_iou(wb, rb) for rb in rboxes) >= 0.85, (key, wb)
            compared += 1
    assert compared >= 20


def test_raster_detector_contains_corrupt_payloads(spark):
    """Corrupt PNG payloads become error rows (det_id=-1, label=-1), not
    task failures — the module containment contract."""
    from pyspark.sql import functions as F

    from gmft_spark.operators.detect import detect_tables_in_rasters
    from gmft_spark.operators.render import render_pages

    t = synthesize_transcripts(spark, n_convs=2, turns_per_conv=2)
    rendered = render_pages(t).withColumn(
        "png",
        F.when(F.col("turn_idx") == 0, F.encode(F.lit("garbage"), "utf-8"))
        .otherwise(F.col("png")),
    )
    rows = detect_tables_in_rasters(rendered).collect()
    bad = [r for r in rows if r["det_id"] == -1]
    good = [r for r in rows if r["det_id"] >= 0]
    assert len(bad) == 2 and all(r["label"] == -1 for r in bad)
    assert all(r["turn_idx"] != 0 for r in good) and good


def test_layout_detector_singleton_is_keyed_by_weights():
    """Python workers are reused across jobs, so two operators requesting
    DIFFERENT weight vectors in one application must each get their own
    instance (the unkeyed slot once served detect's point-space weights
    to the image-OCR path's scale-multiplied request → zero tables)."""
    import numpy as np

    from gmft_spark.operators.detect import DEFAULT_WEIGHTS, _LayoutDetector

    a = _LayoutDetector.get(DEFAULT_WEIGHTS)
    scaled = DEFAULT_WEIGHTS * np.array([2.0, 2.0, 1.0, 1.0, 1.0])
    b = _LayoutDetector.get(scaled)
    assert a is not b
    assert (b.weights == scaled).all() and (a.weights == DEFAULT_WEIGHTS).all()
    # same weights → same instance (the init-once-per-worker property)
    assert _LayoutDetector.get(DEFAULT_WEIGHTS) is a
    assert _LayoutDetector.get(scaled.copy()) is b
