"""Rotated-table coordinate transforms (detectors/base.py:192-211)."""

import numpy as np
import pytest

from gmft_spark.kernel.geometry import rotate_words, select_table_words


WORDS = np.array(
    [
        [1.0, 2.0, 4.0, 3.0],
        [5.0, 6.0, 9.0, 8.0],
    ]
)
W, H = 10.0, 12.0


def test_rotate_0_identity():
    assert (rotate_words(WORDS, 0, W, H) == WORDS).all()


def test_rotate_90():
    out = rotate_words(WORDS, 90, W, H)
    # (x0,y0,x1,y1) -> (H - y1, x0, H - y0, x1)
    assert out[0].tolist() == [H - 3.0, 1.0, H - 2.0, 4.0]


def test_rotate_180():
    out = rotate_words(WORDS, 180, W, H)
    assert out[0].tolist() == [W - 4.0, H - 3.0, W - 1.0, H - 2.0]


def test_rotate_270():
    out = rotate_words(WORDS, 270, W, H)
    assert out[0].tolist() == [2.0, W - 4.0, 3.0, W - 1.0]


def test_all_rotations_preserve_box_validity():
    for angle in (0, 90, 180, 270):
        out = rotate_words(WORDS, angle, W, H)
        assert (out[:, 2] > out[:, 0]).all()
        assert (out[:, 3] > out[:, 1]).all()


def test_rotate_180_twice_is_identity():
    once = rotate_words(WORDS, 180, W, H)
    twice = rotate_words(once, 180, W, H)
    assert np.allclose(twice, WORDS)


def test_select_with_angle():
    words = np.array([[2.0, 2.0, 4.0, 3.0], [50.0, 50.0, 60.0, 55.0]])
    local, kept = select_table_words(
        words, ["in", "out"], (0.0, 0.0, 10.0, 12.0), angle=90
    )
    assert kept == ["in"]
    # offset to table-local then rotated
    assert local[0].tolist() == [12.0 - 3.0, 2.0, 12.0 - 2.0, 4.0]


def test_invalid_angle_raises():
    with pytest.raises(ValueError):
        rotate_words(WORDS, 45, W, H)


def test_rotated_table_extraction_end_to_end():
    """A scene table with angle=90 (content physically rotated on the page)
    must extract the same logical grid as an unrotated table: the header is
    recovered as col0..colN."""
    from gmft_spark.config import ExtractConfig
    from gmft_spark.kernel.synth import synth_scene
    from gmft_spark.operators.extract import extract_turn

    cfg = ExtractConfig()
    checked = 0
    for i in range(60):
        scene = synth_scene("rot-probe", i)
        rotated = [t for t in scene.tables if t.angle == 90]
        if not rotated:
            continue
        results = {r["table_id"]: r for r in extract_turn("rot-probe", i, cfg)}
        for t in rotated:
            r = results[t.table_id]
            assert r["status"] == "ok"
            assert all(c.startswith("col") for c in r["columns"])
            checked += 1
    assert checked >= 3
