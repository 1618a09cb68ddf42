"""img2table-style line-based detection (operators/img2table.py):
lattice reconstruction by intersection + connected components, agreement
with the word-box detector (IoU), and the no-closed-cell rejection rule."""

import pytest

from pyspark.sql import functions as F

from gmft_spark.operators.detect import detect_tables
from gmft_spark.operators.img2table import (
    img2table_detect,
    img2table_detect_pipeline,
    ruling_lines,
)
from gmft_spark.sources.transcripts import transcripts_from_documents

SF = "/root/testdata/sf0.001"


def _iou(a, b):
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix1 - ix0) * max(0.0, iy1 - iy0)
    area = lambda r: (r[2] - r[0]) * (r[3] - r[1])  # noqa: E731
    return inter / (area(a) + area(b) - inter)


def test_detections_match_word_box_detector_by_iou(spark):
    """Every line-lattice candidate overlaps a word-box detection of the
    same page substantially: the grid bbox bounds the words, the word
    extent sits inside the grid, so IoU is high but < 1 (words are
    inset). Mean IoU over matched pairs must clear 0.5."""
    t = transcripts_from_documents(spark, SF, sample_mod=10)
    lat = img2table_detect(ruling_lines(t)).collect()
    words = detect_tables(t).collect()
    by_page = {}
    for d in words:
        by_page.setdefault((d["conv_id"], d["turn_idx"]), []).append(
            (d["x0"], d["y0"], d["x1"], d["y1"])
        )
    assert lat, "subsample produced no lattices"
    ious = []
    for d in lat:
        cands = by_page.get((d["conv_id"], d["turn_idx"]), [])
        box = (d["x0"], d["y0"], d["x1"], d["y1"])
        ious.append(max((_iou(box, c) for c in cands), default=0.0))
    mean = sum(ious) / len(ious)
    assert mean > 0.5, f"mean IoU {mean:.3f}"
    # and the lattice count matches the scene table count per page
    n_tables = sum(1 for _ in lat)
    assert n_tables >= len(by_page)  # captions can suppress word-box dets


def test_adjacent_tables_stay_separate_components(spark):
    """Two-table pages (60pt apart) must yield two lattices — the CC
    grouping must not bridge disjoint grids."""
    t = transcripts_from_documents(spark, SF, sample_mod=2)
    out = img2table_detect_pipeline(spark, SF, sample_mod=2)
    counts = out.groupBy("conv_id", "turn_idx").count()
    assert counts.filter(F.col("count") == 2).count() > 0
    assert counts.filter(F.col("count") > 2).count() == 0
    del t


def test_open_lattice_is_rejected(spark):
    """A single h-line crossing verticals has no closed cell → no
    candidate (img2table's minimal-table rule); a 2x2 lattice passes."""
    lines = spark.createDataFrame(
        [
            # page A: one horizontal, two verticals — open, rejected
            ("a", 0, 0, "h", 0.0, 10.0, 100.0, 10.0),
            ("a", 0, 1, "v", 20.0, 0.0, 20.0, 50.0),
            ("a", 0, 2, "v", 80.0, 0.0, 80.0, 50.0),
            # page B: 2 horizontals x 2 verticals — one closed cell
            ("b", 0, 0, "h", 0.0, 0.0, 100.0, 0.0),
            ("b", 0, 1, "h", 0.0, 50.0, 100.0, 50.0),
            ("b", 0, 2, "v", 0.0, 0.0, 0.0, 50.0),
            ("b", 0, 3, "v", 100.0, 0.0, 100.0, 50.0),
        ],
        "conv_id string, turn_idx int, line_id int, orient string,"
        " x0 double, y0 double, x1 double, y1 double",
    )
    out = img2table_detect(lines).collect()
    assert [(r["conv_id"], r["grid_rows"], r["grid_cols"]) for r in out] == [
        ("b", 1, 1)
    ]
    assert out[0]["score"] == pytest.approx(0.9)


def test_rotated_grid_swaps_page_space_shape(spark):
    """Under 90-degree rotation the logical rows become page verticals:
    grid shape in page space is (n_cols, n_rows+1)."""
    t = transcripts_from_documents(spark, SF, sample_mod=2)
    lines = ruling_lines(t)
    out = img2table_detect(lines)
    # cross-check one rotated table against the scene ground truth
    from gmft_spark.kernel.synth import synth_scene

    rows = out.collect()
    checked = 0
    for r in rows:
        scene = synth_scene(r["conv_id"], r["turn_idx"])
        for tb in scene.tables:
            if abs(tb.bbox[0] - r["x0"]) < 1e-6 and abs(tb.bbox[1] - r["y0"]) < 1e-6:
                n_rows = len(tb.row_edges) + 1  # logical grid rows
                n_cols = len(tb.col_edges) + 1
                if tb.angle == 90:
                    assert (r["grid_rows"], r["grid_cols"]) == (n_cols, n_rows)
                else:
                    assert (r["grid_rows"], r["grid_cols"]) == (n_rows, n_cols)
                checked += 1
    assert checked >= len(rows) * 0.9  # nearly every candidate matched a table


def test_formatter_cells_match_ditr_grid_on_unrotated_tables(spark):
    """On an unrotated table the lattice formatter's page-space grid IS
    the logical grid: header texts in row 0, every cell's text equal to
    the scene's own cell tokens (cross-checked via the scene object)."""
    from gmft_spark.kernel.synth import synth_scene
    from gmft_spark.operators.img2table import img2table_extract_cells

    t = transcripts_from_documents(spark, SF, sample_mod=25)
    cells = img2table_extract_cells(t).collect()
    assert cells
    # group per (page, det)
    by_det = {}
    for r in cells:
        by_det.setdefault((r["conv_id"], r["turn_idx"], r["det_id"]), []).append(r)
    checked = 0
    for (conv_id, turn_idx, det_id), rows in by_det.items():
        scene = synth_scene(conv_id, turn_idx)
        # match the detection to a scene table by reading order
        tables = sorted(scene.tables, key=lambda tb: (tb.bbox[1], tb.bbox[0]))
        tb = tables[det_id]
        if tb.angle != 0:
            continue
        hdr = {r["col"]: r["text"] for r in rows if r["row"] == 0}
        n_cols = len(tb.col_edges) + 1
        assert hdr == {c: f"col{c}" for c in range(n_cols)}
        checked += 1
    assert checked > 0


def test_formatter_rotated_table_is_page_space_transpose(spark):
    """A 90°-rotated table's lattice grid is its page-space view: the
    logical header tokens appear as one COLUMN (the last page column),
    reversed (page y runs against logical x)."""
    from gmft_spark.kernel.synth import synth_scene
    from gmft_spark.operators.img2table import img2table_extract_cells

    t = transcripts_from_documents(spark, SF, sample_mod=2)
    cells = img2table_extract_cells(t).collect()
    by_det = {}
    for r in cells:
        by_det.setdefault((r["conv_id"], r["turn_idx"], r["det_id"]), []).append(r)
    checked = 0
    for (conv_id, turn_idx, det_id), rows in by_det.items():
        scene = synth_scene(conv_id, turn_idx)
        tables = sorted(scene.tables, key=lambda tb: (tb.bbox[1], tb.bbox[0]))
        tb = tables[det_id]
        if tb.angle != 90:
            continue
        n_rows = len(tb.row_edges) + 1  # logical rows = page cols
        n_cols = len(tb.col_edges) + 1  # logical cols = page rows
        # header tokens live in page column 0 (logical row 0 maps to the
        # FIRST page column), reversed: page row i holds col{n_cols-1-i}
        col0 = {r["row"]: r["text"] for r in rows if r["col"] == 0}
        assert col0 == {i: f"col{n_cols - 1 - i}" for i in range(n_cols)}
        assert max(r["col"] for r in rows) == n_rows - 1
        checked += 1
        if checked >= 3:
            break
    assert checked > 0
