"""DITR divider-formatter kernel tests."""

import numpy as np

from gmft_spark.kernel.ditr import ditr_extract, _interval_ioa


def _divider_scene():
    """3 cols × (header + 3 data rows) laid out on a 300×80 table:
    row dividers at y≈20/40/60, col dividers at x≈100/200."""
    scores, labels, boxes = [], [], []
    for y in (20.0, 40.0, 60.0):
        scores.append(0.95)
        labels.append(2)  # row divider
        boxes.append([0.0, y - 1.5, 300.0, y + 1.5])
    for x in (100.0, 200.0):
        scores.append(0.95)
        labels.append(1)  # column divider
        boxes.append([x - 1.5, 0.0, x + 1.5, 80.0])
    # top header band over the first row
    scores.append(0.9)
    labels.append(3)
    boxes.append([0.0, 0.0, 300.0, 18.0])

    words, texts = [], []
    for r in range(4):
        for c in range(3):
            words.append(
                [c * 100 + 10, r * 20 + 5, c * 100 + 60, r * 20 + 15]
            )
            texts.append(f"h{c}" if r == 0 else f"r{r}c{c}")
    return scores, labels, boxes, np.array(words, dtype=float), texts


def test_ditr_basic_grid():
    s, l, b, w, t = _divider_scene()
    res = ditr_extract(s, l, b, w, t, (0.0, 0.0, 300.0, 80.0), words_are_local=True)
    assert res.status == "ok"
    assert res.columns == ["h0", "h1", "h2"]
    assert res.csv == (
        "h0,h1,h2\n"
        "r1c0,r1c1,r1c2\n"
        "r2c0,r2c1,r2c2\n"
        "r3c0,r3c1,r3c2\n"
    )
    assert res.top_header == [0]


def test_ditr_nms_drops_duplicate_divider():
    s, l, b, w, t = _divider_scene()
    # duplicate overlapping row divider with lower confidence
    s.append(0.4)
    l.append(2)
    b.append([0.0, 19.0, 300.0, 22.0])
    res = ditr_extract(s, l, b, w, t, (0.0, 0.0, 300.0, 80.0), words_are_local=True)
    assert res.n_rows == 3  # still 3 data rows, duplicate suppressed


def test_ditr_projected_row():
    s, l, b, w, t = _divider_scene()
    s.append(0.9)
    l.append(4)  # projected over row 2 (y 40..60 → content interval idx 2)
    b.append([0.0, 41.0, 300.0, 59.0])
    res = ditr_extract(s, l, b, w, t, (0.0, 0.0, 300.0, 80.0), words_are_local=True)
    assert res.projecting == [2]


def test_ditr_confidence_gate():
    s, l, b, w, t = _divider_scene()
    # a below-threshold column divider must be ignored
    s.append(0.1)
    l.append(1)
    b.append([148.0, 0.0, 152.0, 80.0])
    res = ditr_extract(s, l, b, w, t, (0.0, 0.0, 300.0, 80.0), words_are_local=True)
    assert res.n_cols == 3


def test_interval_ioa():
    assert _interval_ioa((0, 10), (5, 20)) == 0.5
    assert _interval_ioa((5, 5), (0, 10)) == 1.0
    assert _interval_ioa((5, 5), (5, 10)) == 0.0  # boundary point excluded
    assert _interval_ioa((0, 10), (20, 30)) == 0.0


def test_ditr_tiny_golden():
    """The tiny.pdf golden reproduced through the DITR divider path:
    dividers placed between the reference's known row/column bands
    (test/test_serial.py tiny_info geometry) must yield the same expected
    CSV as the TATR band path."""
    import numpy as np

    from gmft_spark.config import ExtractConfig
    from tests.fixtures_tiny import (
        TINY_EXPECTED_CSV,
        TINY_TABLE_BBOX,
        TINY_WORDS,
    )

    scores = [0.95] * 5 + [0.9]
    labels = [2, 2, 2, 1, 1, 3]
    boxes = [
        [0.0, 17.6, 362.6, 20.7],    # row dividers between the 4 rows
        [0.0, 42.0, 362.6, 45.1],
        [0.0, 65.8, 362.6, 68.8],
        [127.8, 0.0, 130.7, 86.3],   # column dividers
        [250.7, 0.0, 253.7, 86.3],
        [0.0, 0.0, 362.6, 17.0],     # top-header band
    ]
    w = np.array([x[:4] for x in TINY_WORDS])
    t = [x[4] for x in TINY_WORDS]
    res = ditr_extract(scores, labels, boxes, w, t, TINY_TABLE_BBOX, ExtractConfig())
    assert res.csv == TINY_EXPECTED_CSV
    assert res.columns == ["Name", "Celsius", "Fahrenheit"]
