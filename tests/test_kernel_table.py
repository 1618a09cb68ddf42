"""Kernel golden + unit tests (no Spark)."""

import numpy as np
import pytest

from gmft_spark.config import ExtractConfig
from gmft_spark.kernel.table import extract_table, nms_adjacent, _fill_gaps, _widen_rows, _box
from gmft_spark.kernel.geometry import iob, select_table_words
from gmft_spark.kernel.text import assemble_text, word_height_estimate

from tests.fixtures_tiny import (
    TINY_EXPECTED_CSV,
    TINY_PRED_BOXES,
    TINY_PRED_LABELS,
    TINY_PRED_SCORES,
    TINY_TABLE_BBOX,
    TINY_WORDS,
)


def _tiny_words():
    boxes = np.array([w[:4] for w in TINY_WORDS], dtype=np.float64)
    texts = [w[4] for w in TINY_WORDS]
    return boxes, texts


class TestTinyGolden:
    def test_csv_byte_equality(self):
        boxes, texts = _tiny_words()
        res = extract_table(
            TINY_PRED_SCORES,
            TINY_PRED_LABELS,
            TINY_PRED_BOXES,
            boxes,
            texts,
            TINY_TABLE_BBOX,
            ExtractConfig(),
        )
        assert res.status == "ok"
        assert res.csv == TINY_EXPECTED_CSV
        assert res.columns == ["Name", "Celsius", "Fahrenheit"]
        assert res.top_header == [0]
        assert res.n_rows == 3

    def test_word_selection(self):
        # 17 of the 31 page words intersect the table bbox (header + 4 rows,
        # minus the caption/preamble text above the table)
        boxes, texts = _tiny_words()
        local, kept = select_table_words(boxes, texts, TINY_TABLE_BBOX)
        assert kept[0] == "Name"
        assert kept[-1] == "98.6"
        assert len(kept) == 17
        assert (local[:, 0] >= -1.0).all()  # table-local


class TestGeometry:
    def test_iob_basic(self):
        assert iob((0, 0, 10, 10), (0, 0, 10, 10)) == 1.0
        assert iob((0, 0, 10, 10), (5, 0, 15, 10)) == 0.5
        assert iob((0, 0, 10, 10), (20, 20, 30, 30)) == 0.0
        assert iob((5, 5, 5, 5), (0, 0, 10, 10)) == 0.0  # degenerate

    def test_touching_edges_not_intersecting(self):
        # strict inequality: shared edge is NOT an intersection
        # (reference base.py:26-33)
        boxes = np.array([[0.0, 0.0, 10.0, 10.0]])
        local, kept = select_table_words(boxes, ["w"], (10.0, 0.0, 20.0, 10.0))
        assert kept == []


class TestNMS:
    def test_cascade_removal(self):
        # three stacked rows where each overlaps the next: the cascade
        # restarts comparison at the same index after a removal
        rows = [
            _box(0.9, 2, [0, 0, 10, 10]),
            _box(0.95, 2, [0, 1, 10, 11]),
            _box(0.5, 2, [0, 2, 10, 12]),
        ]
        removed = nms_adjacent(rows, 0.1)
        assert removed == 2
        assert len(rows) == 1
        assert rows[0]["confidence"] == 0.95

    def test_keeps_disjoint(self):
        rows = [
            _box(0.9, 2, [0, 0, 10, 10]),
            _box(0.8, 2, [0, 20, 10, 30]),
        ]
        assert nms_adjacent(rows, 0.1) == 0
        assert len(rows) == 2


class TestGapFill:
    def test_inserts_between(self):
        rows = [
            _box(0.9, 2, [0, 0, 10, 10]),
            _box(0.9, 2, [0, 30, 10, 40]),
        ]
        _fill_gaps(rows, gap_height=5.0)
        assert len(rows) == 3
        mid = rows[1]["bbox"]
        assert mid[1] == 10 + 0.4 * 5.0
        assert mid[3] == 30 - 0.4 * 5.0

    def test_top_of_table_gap(self):
        rows = [_box(0.9, 2, [0, 30, 10, 40])]
        _fill_gaps(rows, gap_height=5.0, top=0.0)
        assert len(rows) == 2
        assert rows[0]["bbox"][1] == 0.0

    def test_nan_gap_is_noop(self):
        rows = [
            _box(0.9, 2, [0, 0, 10, 10]),
            _box(0.9, 2, [0, 30, 10, 40]),
        ]
        _fill_gaps(rows, gap_height=float("nan"))
        assert len(rows) == 2


class TestWiden:
    def test_envelope(self):
        rows = [
            _box(0.9, 2, [2, 0, 8, 10]),
            _box(0.9, 2, [0, 10, 10, 20]),
        ]
        headers = [_box(0.9, 3, [3, -10, 7, 0])]
        _widen_rows(rows, headers)
        for r in rows + headers:
            assert r["bbox"][0] == 0 and r["bbox"][2] == 10


class TestText:
    def test_assemble_newline_on_y_jump(self):
        boxes = np.array(
            [[0, 0, 10, 10], [12, 0, 20, 10], [0, 20, 10, 30]], dtype=np.float64
        )
        assert assemble_text(boxes, ["a", "b", "c"]) == "a b\nc"

    def test_assemble_empty(self):
        assert assemble_text(np.zeros((0, 4)), []) == ""

    def test_word_height_median(self):
        boxes = np.array(
            [[0, 0, 10, 8], [0, 0, 10, 10], [0, 0, 10, 12]], dtype=np.float64
        )
        assert word_height_estimate(boxes) == pytest.approx(0.95 * 10)

    def test_word_height_empty_is_nan(self):
        assert np.isnan(word_height_estimate(np.zeros((0, 4))))


class TestErrors:
    def test_no_rows_or_columns(self):
        res = extract_table([], [], np.zeros((0, 4)), np.zeros((0, 4)), [], (0, 0, 10, 10))
        assert res.status == "error"
        assert "No rows or columns" in res.message

    def test_overlap_reject(self):
        # rows covering the table 3x over → total overlap reject
        preds_boxes = [[0, 0, 10, 10]] * 6 + [[0, 0, 10, 10]]
        labels = [2] * 6 + [1]
        # distinct confidences and disjoint-ish y so NMS doesn't remove them
        boxes = [[0, i * 0.01, 10, 10 + i * 0.01] for i in range(6)] + [[0, 0, 10, 10]]
        res = extract_table(
            [0.9] * 7,
            labels,
            boxes,
            np.array([[1.0, 1.0, 2.0, 2.0]]),
            ["x"],
            (0, 0, 10, 10),
            ExtractConfig(nms_overlap_threshold=2.0),  # disable NMS for the test
        )
        assert res.status == "error"
        assert "significant overlap" in res.message


class TestCroppedPositions:
    """Port of the reference's CroppedTable.text_positions expectations
    (test/test_cropped.py:25-62 with bbox (10,12,300,150) on tiny.pdf):
    word 9 ('elit', x>300) falls outside; words 0-8 and 10-13 inside."""

    BBOX = (10.0, 12.0, 300.0, 150.0)

    def _words(self):
        boxes = np.array([w[:4] for w in TINY_WORDS], dtype=np.float64)
        return boxes, [w[4] for w in TINY_WORDS]

    def test_inside_no_offset(self):
        from gmft_spark.kernel.geometry import select_table_words

        boxes, texts = self._words()
        got, kept = select_table_words(
            boxes, texts, self.BBOX, remove_offset=False
        )
        expect_idx = [i for i in range(14) if i != 9]
        assert kept == [texts[i] for i in expect_idx]
        assert np.allclose(got, boxes[expect_idx])

    def test_inside_with_offset(self):
        from gmft_spark.kernel.geometry import select_table_words

        boxes, texts = self._words()
        got, kept = select_table_words(boxes, texts, self.BBOX)
        expect_idx = [i for i in range(14) if i != 9]
        assert np.allclose(
            got, boxes[expect_idx] - np.array([10.0, 12.0, 10.0, 12.0])
        )

    def test_outside_complement(self):
        from gmft_spark.kernel.geometry import select_table_words

        boxes, texts = self._words()
        got, kept = select_table_words(
            boxes, texts, self.BBOX, outside=True, remove_offset=False
        )
        expect_idx = [9] + list(range(14, len(texts)))
        assert kept == [texts[i] for i in expect_idx]
        assert np.allclose(got, boxes[expect_idx])


def test_tiny_table_text_golden():
    """CroppedTable.text() analog (position_words over intersecting page
    words, detectors/base.py:213-221): row-by-row with newlines at y
    jumps >= 3."""
    from gmft_spark.kernel.text import assemble_text

    boxes, texts = _tiny_words()
    sel, kept = select_table_words(
        boxes, texts, TINY_TABLE_BBOX, remove_offset=False
    )
    assert assemble_text(sel, kept) == (
        "Name Celsius Fahrenheit\n"
        "Water Freezing Point 0 32\n"
        "Water Boiling Point 100 212\n"
        "Body Temperature 37 98.6"
    )
