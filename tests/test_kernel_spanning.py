"""Spanning-cell semantics, multi-header, large-table and caption kernels.

Scenario geometry is built by hand so each heuristic's trigger condition is
exercised exactly (semantics per /root/reference/gmft/algorithm/structure.py
F5/F10/F11 and gmft/algorithm/captions.py)."""

import numpy as np
import pytest

from gmft_spark.config import ExtractConfig
from gmft_spark.kernel.captions import find_captions
from gmft_spark.kernel.histogram import (
    content_intervals_between_dividers,
    coverage_gaps,
    fill_by_dividers,
    histogram_extract,
    point_coverage,
)
from gmft_spark.kernel.table import extract_table

from tests.fixtures_tiny import (
    TINY_EXPECTED_CSV,
    TINY_TABLE_BBOX,
    TINY_WORDS,
)


def _grid_scene(n_rows=4, n_cols=3, row_h=20.0, col_w=100.0):
    """Clean grid: header row + data rows; returns (scores, labels, boxes,
    word_boxes, texts, table_bbox). Words one per cell: 'r{r}c{c}'."""
    width, height = n_cols * col_w, (n_rows + 1) * row_h
    scores, labels, boxes = [], [], []
    scores.append(0.99), labels.append(3), boxes.append([0, 0, width, row_h])
    for r in range(n_rows + 1):
        scores.append(0.99)
        labels.append(2)
        boxes.append([0, r * row_h, width, (r + 1) * row_h])
    for c in range(n_cols):
        scores.append(0.99)
        labels.append(1)
        boxes.append([c * col_w, 0, (c + 1) * col_w, height])
    words, texts = [], []
    for r in range(n_rows + 1):
        for c in range(n_cols):
            words.append(
                [c * col_w + 5, r * row_h + 5, c * col_w + 60, r * row_h + 15]
            )
            texts.append(f"h{c}" if r == 0 else f"r{r}c{c}")
    return scores, labels, boxes, np.array(words), texts, (0.0, 0.0, width, height)


class TestSpanningSemantics:
    def test_hier_left_algorithm_fill(self):
        s, l, b, w, t, bbox = _grid_scene()
        # blank out col-0 data cells for rows 2..4 and add two spanning
        # cells over col 0 → 'algorithm' forward fill from first data row
        keep = [i for i, x in enumerate(t) if x not in ("r2c0", "r3c0")]
        w = w[keep]
        t = [t[i] for i in keep]
        for y0, y1 in ((20.0, 60.0), (60.0, 100.0)):
            s.append(0.9)
            l.append(5)
            b.append([0.0, y0, 100.0, y1])
        cfg = ExtractConfig(semantic_spanning_cells=True)
        res = extract_table(s, l, b, w, t, bbox, cfg, words_are_local=True)
        assert res.status == "ok"
        assert res.hier_left == [0]
        col0 = [row[0] for row in res.grid]
        assert col0 == ["r1c0", "r1c0", "r1c0", "r4c0"]

    def test_hier_left_deep_fill(self):
        s, l, b, w, t, bbox = _grid_scene()
        keep = [i for i, x in enumerate(t) if x not in ("r2c0",)]
        w = w[keep]
        t = [t[i] for i in keep]
        # spanning cell covering rows 1-2 of col 0 (outside header)
        s.append(0.9)
        l.append(5)
        b.append([0.0, 20.0, 100.0, 60.0])
        cfg = ExtractConfig(
            semantic_spanning_cells=True,
            semantic_hierarchical_left_fill="deep",
        )
        res = extract_table(s, l, b, w, t, bbox, cfg, words_are_local=True)
        col0 = [row[0] for row in res.grid]
        assert col0 == ["r1c0", "r1c0", "r3c0", "r4c0"]

    def test_hier_top_join(self):
        s, l, b, w, t, bbox = _grid_scene()
        # spanning cell inside the header across cols 1-2 → contents join
        s.append(0.9)
        l.append(5)
        b.append([100.0, 0.0, 300.0, 20.0])
        cfg = ExtractConfig(semantic_spanning_cells=True)
        res = extract_table(s, l, b, w, t, bbox, cfg, words_are_local=True)
        assert res.columns == ["h0", "h1 h2", "h1 h2"]

    def test_multi_header_csv_shape(self):
        s, l, b, w, t, bbox = _grid_scene()
        # second header row: rows 0 and 1 both under the header bbox
        b[0] = [0, 0, 300.0, 40.0]  # header spans two rows
        cfg = ExtractConfig(enable_multi_header=True)
        res = extract_table(s, l, b, w, t, bbox, cfg, words_are_local=True)
        assert res.top_header == [0, 1]
        lines = res.csv.split("\n")
        # two header lines + named index line from MultiIndex rendering
        assert lines[0].startswith("h0")
        assert lines[1].startswith("r1c0") or "Header" in res.csv


class TestLargeTable:
    def test_forced_large_table_recovers_rows(self):
        s, l, b, w, t, bbox = _grid_scene(n_rows=12)
        cfg = ExtractConfig(force_large_table_assumption=True)
        res = extract_table(s, l, b, w, t, bbox, cfg, words_are_local=True)
        assert res.status == "ok"
        # all 12 data rows survive the re-estimation with one word per cell
        assert res.n_rows == 12
        assert res.grid[0][0] == "r1c0"
        assert res.grid[-1][-1] == "r12c2"

    def test_nms_trigger(self):
        s, l, b, w, t, bbox = _grid_scene(n_rows=10)
        # add 9 duplicate low-confidence row boxes → NMS removes >= 8 →
        # large-table path triggers implicitly
        for r in range(1, 10):
            s.append(0.5)
            l.append(2)
            b.append([0.0, r * 20.0 + 1.0, 300.0, (r + 1) * 20.0 + 1.0])
        res = extract_table(s, l, b, w, t, bbox, ExtractConfig(), words_are_local=True)
        assert res.status == "ok"
        assert res.outliers.get("nms removed rows") == 9
        assert res.n_rows == 10


class TestCaptions:
    def test_tiny_caption(self):
        boxes = np.array([x[:4] for x in TINY_WORDS])
        texts = [x[4] for x in TINY_WORDS]
        above, below = find_captions(boxes, texts, TINY_TABLE_BBOX)
        assert above == "Table 1. Selected Numbers"
        assert below == ""

    def test_caption_below(self):
        # table at top, caption line below it
        words = [[10, r * 20 + 5, 60, r * 20 + 15] for r in range(3)]
        texts = ["a", "b", "c"]
        words.append([10, 100, 40, 108])
        texts.append("Source:")
        words.append([45, 100, 80, 108])
        texts.append("somewhere")
        above, below = find_captions(
            np.array(words, dtype=float), texts, (0.0, 0.0, 100.0, 60.0)
        )
        assert below == "Source: somewhere"
        assert above == ""


class TestHistogramKernel:
    def test_tiny_histogram_matches_golden(self):
        from gmft_spark.kernel.geometry import select_table_words

        boxes = np.array([x[:4] for x in TINY_WORDS])
        texts = [x[4] for x in TINY_WORDS]
        local, kept = select_table_words(boxes, texts, TINY_TABLE_BBOX)
        w = TINY_TABLE_BBOX[2] - TINY_TABLE_BBOX[0]
        h = TINY_TABLE_BBOX[3] - TINY_TABLE_BBOX[1]
        res = histogram_extract(local, kept, w, h)
        assert res.csv == TINY_EXPECTED_CSV

    def test_coverage_invariants(self):
        iv = np.array([[0.0, 10.0], [5.0, 15.0], [20.0, 30.0]])
        assert point_coverage(iv, 7.0) == 2
        assert point_coverage(iv, 12.0) == 1
        assert point_coverage(iv, 17.0) == 0
        assert point_coverage(iv, 30.0) == 0  # [p, q) is half-open
        gaps = coverage_gaps(iv, 0)
        assert gaps == [(15.0, 20.0)]

    def test_empty_interval_ignored(self):
        iv = np.array([[5.0, 5.0], [0.0, 10.0]])
        assert point_coverage(iv, 5.0) == 1
        assert coverage_gaps(iv, 0) == []

    def test_divider_fill_bisect_left(self):
        words = np.array([[0, 0, 4, 4], [0, 10, 4, 14], [10, 10, 14, 14]], dtype=float)
        texts = ["a", "b", "c"]
        grid = fill_by_dividers(words, texts, [5.0], [5.0], (0, 0, 20, 20))
        assert grid[0][0] == "a"
        assert grid[1][0] == "b"
        assert grid[1][1] == "c"

    def test_interval_complement(self):
        divs = [(2.0, 3.0), (5.0, 6.0)]
        out = content_intervals_between_dividers(divs, 0.0, 10.0)
        assert out == [(0.0, 2.0), (3.0, 5.0), (6.0, 10.0)]

    def test_interval_complement_inverted(self):
        divs = [(0.0, 4.0), (2.0, 6.0)]
        out = content_intervals_between_dividers(divs, 0.0, 10.0)
        assert out == [(0.0, 0.0), (2.0, 4.0), (6.0, 10.0)]


class TestLargeTableEdgeBranches:
    def test_no_text_branch(self):
        """Forced large-table with zero words: 'no text' outlier, empty CSV
        (structure.py:889-897)."""
        s, l, b, w, t, bbox = _grid_scene(n_rows=4)
        res = extract_table(
            s, l, b, np.zeros((0, 4)), [], bbox,
            ExtractConfig(force_large_table_assumption=True),
            words_are_local=True,
        )
        assert res.status == "ok"
        assert res.outliers.get("no text") is True
        assert res.grid == []

    def test_excessive_rows_branch(self):
        """Tiny text in a tall table: estimated rows exceed the 1000 cap →
        'excessive rows' outlier and the fallback 100-row height
        (structure.py:281-288)."""
        s, l, b, w, t, bbox = _grid_scene(n_rows=4, row_h=40.0)
        # words with tiny heights drive word_height down to ~0.14; the
        # 200-unit-tall table then estimates ~1400 rows > the 1000 cap
        tiny_words = np.array(
            [[5.0, y, 60.0, y + 0.15] for y in np.linspace(41, 199, 40)]
        )
        texts = [f"w{i}" for i in range(len(tiny_words))]
        res = extract_table(
            s, l, b, tiny_words, texts, bbox,
            ExtractConfig(force_large_table_assumption=True),
            words_are_local=True,
        )
        assert res.status == "ok"
        assert res.outliers.get("excessive rows", 0) > 1000

    def test_no_text_matches_naive_oracle(self):
        from tests.reference_oracle import oracle_extract

        s, l, b, w, t, bbox = _grid_scene(n_rows=4)
        cfg = ExtractConfig(force_large_table_assumption=True)
        res = extract_table(
            s, l, b, np.zeros((0, 4)), [], bbox, cfg, words_are_local=True
        )
        status, csv, *_rest, outliers = oracle_extract(
            s, l, b, np.zeros((0, 4)), [], bbox, cfg
        )
        # oracle takes page-coord words; with zero words paths agree
        assert status == res.status == "ok"
        assert res.csv == csv
        assert outliers == res.outliers
