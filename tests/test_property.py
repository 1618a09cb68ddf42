"""Property-based tests: the vectorized kernels must equal literal
re-executions of the reference's scan semantics on arbitrary inputs."""

import bisect

import numpy as np
from hypothesis import given, settings, strategies as st

# frozen exploration: the driver's verify run must be reproducible — a
# fresh random seed discovering a new counterexample mid-verify would
# read as a flake, not a finding
settings.register_profile("frozen", derandomize=True)
settings.load_profile("frozen")

from gmft_spark.kernel.geometry import iob
from gmft_spark.kernel.histogram import coverage_gaps, fill_by_dividers, point_coverage
from gmft_spark.kernel.table import _assign_best_band, nms_adjacent, _box
from gmft_spark.kernel.text import assemble_text

# small float coordinates with enough collisions to hit ties
coord = st.floats(0, 50, allow_nan=False, allow_infinity=False).map(
    lambda x: round(x, 1)
)


def _bands(draw_list):
    """Sorted-by-far-edge bands from (near, extent) pairs."""
    bands = []
    for lo, ext in draw_list:
        bands.append((lo, lo + ext))
    bands.sort(key=lambda b: b[1])
    return bands


@st.composite
def scan_case(draw):
    n_bands = draw(st.integers(1, 8))
    pairs = draw(
        st.lists(
            st.tuples(coord, st.floats(0.5, 10).map(lambda x: round(x, 1))),
            min_size=n_bands,
            max_size=n_bands,
        )
    )
    bands = _bands(pairs)
    n_words = draw(st.integers(1, 12))
    words = draw(
        st.lists(
            st.tuples(coord, st.floats(0.2, 6).map(lambda x: round(x, 1))),
            min_size=n_words,
            max_size=n_words,
        )
    )
    return bands, words


def _reference_scan(bands_y, word):
    """Literal re-execution of the reference's bisect-bounded scan
    (structure.py:111-141,415-436) in 1-D band space: full-width bands, so
    iob reduces to y-overlap/word-height."""
    lo, hi = word
    keys = [b[1] for b in bands_y]
    i = bisect.bisect_left(keys, lo)
    best, best_iob = None, 0.0
    while i < len(bands_y):
        b0, b1 = bands_y[i]
        wordbox = (0.0, lo, 10.0, hi)
        bandbox = (0.0, b0, 10.0, b1)
        score = iob(wordbox, bandbox)
        if score > best_iob:
            best_iob = score
            best = i
        if hi < b0:
            break
        i += 1
    return -1 if best is None else best


@given(scan_case())
@settings(max_examples=200, deadline=None)
def test_assign_best_band_equals_reference_scan(case):
    bands, words = case
    band_arr = np.array([[0.0, b0, 10.0, b1] for b0, b1 in bands])
    word_arr = np.array([[0.0, lo, 10.0, lo + ext] for lo, ext in words])
    got, _ = _assign_best_band(word_arr, band_arr, "y")
    for k, (lo, ext) in enumerate(words):
        expect = _reference_scan(bands, (lo, lo + ext))
        assert got[k] == expect, (bands, (lo, lo + ext), got[k], expect)


@st.composite
def interval_set(draw):
    n = draw(st.integers(0, 12))
    return draw(
        st.lists(
            st.tuples(coord, st.floats(0, 8).map(lambda x: round(x, 1))),
            min_size=n,
            max_size=n,
        )
    )


@given(interval_set(), st.integers(0, 2))
@settings(max_examples=200, deadline=None)
def test_coverage_gaps_consistent_with_point_coverage(ivs, threshold):
    intervals = np.array([[a, a + w] for a, w in ivs]).reshape(-1, 2)
    gaps = coverage_gaps(intervals, threshold)
    # sample interior points of every gap: coverage must be <= threshold
    for a, b in gaps:
        for x in np.linspace(a, b, 5, endpoint=False):
            assert point_coverage(intervals, float(x)) <= threshold
    # gaps are disjoint and sorted
    for (a1, b1), (a2, b2) in zip(gaps, gaps[1:]):
        assert b1 < a2 or (b1 <= a2)
    # maximality: the change-point right after each gap exceeds threshold
    nonempty = intervals[intervals[:, 1] > intervals[:, 0]]
    if len(nonempty):
        for a, b in gaps:
            last = nonempty[:, 1].max()
            if b < last:
                assert point_coverage(intervals, float(b)) > threshold


def _reference_nms(items, threshold):
    """Literal re-execution of the reference's adjacent-pair suppression
    (structure.py:203-222). NOTE: this is intentionally NOT a fixpoint —
    when the earlier element of a pair is popped, the new adjacent pair
    (i-2, i-1) is never revisited, so surviving neighbours may still
    overlap. The kernel must replicate that order-dependence exactly."""
    out = [dict(x) for x in items]
    removed = 0
    i = 1
    while i < len(out):
        if iob(out[i - 1]["bbox"], out[i]["bbox"]) > threshold:
            if out[i - 1]["confidence"] > out[i]["confidence"]:
                out.pop(i)
            else:
                out.pop(i - 1)
            removed += 1
        else:
            i += 1
    return out, removed


@given(
    st.lists(
        st.tuples(coord, st.floats(0.5, 5), st.floats(0, 1)),
        min_size=0,
        max_size=10,
    ),
    st.floats(0.05, 0.5),
)
@settings(max_examples=200, deadline=None)
def test_nms_equals_reference(rows_spec, threshold):
    rows = [
        _box(conf, 2, [0.0, y, 10.0, y + h]) for y, h, conf in rows_spec
    ]
    rows.sort(key=lambda r: r["bbox"][3])
    expect, expect_removed = _reference_nms(rows, threshold)
    before = len(rows)
    removed = nms_adjacent(rows, threshold)
    assert removed == expect_removed == before - len(rows)
    assert [r["bbox"] for r in rows] == [r["bbox"] for r in expect]


@given(
    st.lists(st.tuples(coord, coord, st.text("ab", min_size=1, max_size=3)),
             min_size=0, max_size=10)
)
@settings(max_examples=100, deadline=None)
def test_assemble_text_equals_naive(words):
    boxes = np.array([[x, y, x + 5, y + 8] for x, y, _ in words]).reshape(-1, 4)
    texts = [t for _, _, t in words]
    got = assemble_text(boxes, texts)
    # naive literal loop (detectors/base.py:23-48)
    if not texts:
        assert got == ""
        return
    expect = texts[0]
    prev_bottom = boxes[0][3]
    for i in range(1, len(texts)):
        sep = "\n" if abs(boxes[i][3] - prev_bottom) >= 3 else " "
        expect += sep + texts[i]
        prev_bottom = boxes[i][3]
    assert got == expect


@given(
    st.lists(st.tuples(coord, coord), min_size=0, max_size=12),
    st.lists(coord, min_size=0, max_size=5),
    st.lists(coord, min_size=0, max_size=5),
)
@settings(max_examples=100, deadline=None)
def test_fill_by_dividers_equals_bisect(wpos, ydivs, xdivs):
    ydivs, xdivs = sorted(ydivs), sorted(xdivs)
    boxes = np.array([[x, y, x + 4, y + 4] for x, y in wpos]).reshape(-1, 4)
    texts = [f"w{i}" for i in range(len(wpos))]
    bounds = (0.0, 0.0, 60.0, 60.0)
    grid = fill_by_dividers(boxes, texts, ydivs, xdivs, bounds)
    # naive bisect loop (dividers.py:37-79)
    expect = np.empty((len(ydivs) + 1, len(xdivs) + 1), dtype=object)
    for (x, y), t in zip(wpos, texts):
        xm, ym = x + 2, y + 2
        if not (bounds[0] <= xm <= bounds[2] and bounds[1] <= ym <= bounds[3]):
            continue
        r = bisect.bisect_left(ydivs, ym)
        c = bisect.bisect_left(xdivs, xm)
        expect[r, c] = t if expect[r, c] is None else expect[r, c] + " " + t
    assert grid.tolist() == expect.tolist()


cell_text = st.one_of(
    st.none(),
    st.text(
        alphabet=st.sampled_from(list('ab,"\n\\ n')), min_size=0, max_size=6
    ),
)


@given(
    st.integers(1, 5).flatmap(
        lambda nc: st.tuples(
            st.lists(
                st.text(alphabet=list('xy," '), min_size=0, max_size=5),
                min_size=nc,
                max_size=nc,
            ),
            st.lists(
                st.lists(cell_text, min_size=nc, max_size=nc),
                min_size=0,
                max_size=6,
            ),
        )
    )
)
@settings(max_examples=200, deadline=None)
def test_render_csv_equals_pandas(case):
    import pandas as pd

    from gmft_spark.kernel.table import render_csv

    columns, rows = case
    grid = np.empty((len(rows), len(columns)), dtype=object)
    for i, r in enumerate(rows):
        for j, v in enumerate(r):
            grid[i, j] = v
    expect = pd.DataFrame(grid, columns=columns).to_csv(
        index=False, lineterminator="\n"
    )
    assert render_csv(columns, [list(r) for r in rows]) == expect


@st.composite
def fuzz_scene(draw):
    n_preds = draw(st.integers(0, 20))
    preds = draw(
        st.lists(
            st.tuples(
                st.floats(0, 1),                      # score
                st.integers(0, 6),                    # label
                st.tuples(coord, coord, coord, coord),  # arbitrary box
            ),
            min_size=n_preds,
            max_size=n_preds,
        )
    )
    n_words = draw(st.integers(0, 15))
    words = draw(
        st.lists(
            st.tuples(coord, coord, st.floats(0, 8), st.floats(0, 8)),
            min_size=n_words,
            max_size=n_words,
        )
    )
    return preds, words


@given(fuzz_scene())
@settings(max_examples=150, deadline=None)
def test_extract_table_never_raises(case):
    """Arbitrary (even nonsensical) predictions and words must produce a
    TableResult with status ok/error — never an exception. Degenerate and
    inverted boxes included."""
    from gmft_spark.config import ExtractConfig
    from gmft_spark.kernel.table import extract_table

    preds, words = case
    scores = [p[0] for p in preds]
    labels = [p[1] for p in preds]
    boxes = [[p[2][0], p[2][1], p[2][2], p[2][3]] for p in preds]
    word_boxes = np.array(
        [[x, y, x + w, y + h] for x, y, w, h in words]
    ).reshape(-1, 4)
    texts = [f"t{i}" for i in range(len(words))]
    res = extract_table(
        scores, labels, boxes, word_boxes, texts, (0.0, 0.0, 60.0, 60.0),
        ExtractConfig(),
    )
    assert res.status in ("ok", "error")
    if res.status == "ok":
        assert res.csv is not None


@given(scan_case())
@settings(max_examples=100, deadline=None)
def test_assign_best_band_x_axis(case):
    """Same scan-window semantics on the column axis."""
    bands, words = case
    band_arr = np.array([[b0, 0.0, b1, 10.0] for b0, b1 in bands])
    word_arr = np.array([[lo, 0.0, lo + ext, 10.0] for lo, ext in words])
    got, _ = _assign_best_band(word_arr, band_arr, "x")
    for k, (lo, ext) in enumerate(words):
        expect = _reference_scan(bands, (lo, lo + ext))
        assert got[k] == expect
