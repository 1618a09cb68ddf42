"""Deterministic synthetic page scenes.

The pipeline's input is a transcript table ``(conv_id, turn_idx, role, text,
tool, ts)`` whose per-turn payload conceptually carries a PDF page. The
sandbox has no PDF/ML stack, so each turn's payload is *expanded
deterministically* from ``(conv_id, turn_idx)`` into exactly the
intermediate representation the real ML stage would produce — page word
positions (FIXTURES.md §2) plus raw structure predictions (FIXTURES.md §4)
— seeded by a stable hash so every executor, process and test regenerates
identical scenes (FIXTURES.md §7).

Scenes intentionally exercise the extraction heuristics: duplicate row
boxes (NMS), dropped row boxes (gap fill), projected row headers, caption
words outside the table bbox, and occasional multi-table pages.
"""

from __future__ import annotations

import hashlib
import zlib
from dataclasses import dataclass
from typing import List

import numpy as np

from gmft_spark.config import (
    LABEL_COLUMN,
    LABEL_COLUMN_HEADER,
    LABEL_PROJECTED_ROW_HEADER,
    LABEL_ROW,
    LABEL_SPANNING_CELL,
    LABEL_TABLE,
)

PAGE_WIDTH = 612.0
PAGE_HEIGHT = 792.0
WORD_HEIGHT = 8.2
ROW_HEIGHT = 14.0


def stable_seed(conv_id: str, turn_idx: int) -> int:
    """Process-independent seed (crc32, not Python hash())."""
    return zlib.crc32(f"{conv_id}|{turn_idx}".encode("utf-8")) & 0xFFFFFFFF


# -- named md5 draws ------------------------------------------------------
#
# Every draw that shapes the page WORD LAYOUT is a *named* md5 draw — one
# independent hash per (seed, field) key, no sequential RNG state. This
# makes the layout exactly reproducible in SQL (md5 + hex arithmetic), so
# the driver's DuckDB oracle can re-derive scene words, detector output and
# per-table text independently (operators/scene_sql.py holds the SQL twin).
# Draws that only perturb the structure PREDICTIONS (score jitter,
# duplicated row boxes) stay on a Mersenne stream keyed off the same
# seed: they never move a word, and the extraction heuristics are
# designed to absorb them, so no oracle needs them. Prediction draws the
# OUTPUT depends on (dropped row boxes → CSV, projected headers →
# `projecting`) are named draws too, so their oracles can re-derive them.


def _h32(key: str) -> int:
    """First 8 hex chars of md5(key) as a 32-bit int (SQL twin:
    scene_sql._hx)."""
    return int(hashlib.md5(key.encode("utf-8")).hexdigest()[:8], 16)


def _hrand(key: str) -> float:
    return _h32(key) / 4294967296.0


def _huni(key: str, a: float, b: float) -> float:
    return a + (b - a) * _hrand(key)


def _hint(key: str, lo: int, hi: int) -> int:
    """Uniform int in [lo, hi) — randint twin."""
    return lo + _h32(key) % (hi - lo)


def _hcell(key: str):
    """Four independent 32-bit values from one md5 (cell draws: sparse
    mask, second-word mask, two token values)."""
    h = hashlib.md5(key.encode("utf-8")).hexdigest()
    return (
        int(h[0:8], 16),
        int(h[8:16], 16),
        int(h[16:24], 16),
        int(h[24:32], 16),
    )


class _PredStream:
    """Prediction-only randomness: one bulk uniform block per table
    (scalar RandomState.uniform calls and RandomState construction were
    ~60% of scene cost in profiling). PCG64 seeded from the table key —
    deterministic across executors, never consulted for word layout."""

    __slots__ = ("u", "i")

    def __init__(self, key: str, n: int = 160):
        g = np.random.default_rng(zlib.crc32(key.encode("utf-8")) & 0xFFFFFFFF)
        self.u = g.random(n)
        self.i = 0

    def rand(self) -> float:
        v = self.u[self.i]
        self.i += 1
        return float(v)

    def uniform(self, a: float, b: float) -> float:
        return a + (b - a) * self.rand()

    def randint(self, lo: int, hi: int) -> int:
        """Uniform int in [lo, hi)."""
        return lo + int(self.rand() * (hi - lo))


@dataclass
class SynthTable:
    table_id: int
    bbox: tuple  # page coords
    scores: np.ndarray
    labels: np.ndarray
    boxes: np.ndarray  # table-local (logical/unrotated-view) coords
    angle: int = 0  # 0 or 90: page content is rotated, predictions aren't
    # ground-truth grid geometry (logical coords) — lets alternative
    # formatter models (e.g. DITR divider predictions) be derived exactly
    row_edges: tuple = ()  # y positions between consecutive rows
    col_edges: tuple = ()  # x positions between consecutive columns

    def divider_predictions(self, thickness: float = 3.0):
        """DITR-style predictions for this table: one divider box per
        row/column edge plus a top-header band (kernel/ditr.py labels)."""
        w = self.bbox[2] - self.bbox[0]
        h = self.bbox[3] - self.bbox[1]
        if self.angle in (90, 270):
            w, h = h, w
        scores, labels, boxes = [], [], []
        half = thickness / 2
        for y in self.row_edges:
            scores.append(0.95)
            labels.append(2)  # row divider
            boxes.append([0.0, y - half, w, y + half])
        for x in self.col_edges:
            scores.append(0.95)
            labels.append(1)  # column divider
            boxes.append([x - half, 0.0, x + half, h])
        first_edge = self.row_edges[0] if self.row_edges else h
        scores.append(0.9)
        labels.append(3)  # top header band
        boxes.append([0.0, 0.0, w, first_edge - half])
        return (
            np.array(scores, dtype=np.float64),
            np.array(labels, dtype=np.int64),
            np.array(boxes, dtype=np.float64),
        )


@dataclass
class SynthScene:
    conv_id: str
    turn_idx: int
    page_width: float
    page_height: float
    word_boxes: np.ndarray  # page coords, generator order
    word_texts: List[str]
    tables: List[SynthTable]


_CHARS = "0123456789abcdefghijklmnopqrstuvwxyz"


def _token_of(v: int, r: int, c: int) -> str:
    """Deterministic short cell token from a pre-drawn value."""
    s = ""
    for _ in range(4):
        s += _CHARS[v % 36]
        v //= 36
    return f"{s}{r}{c}"


def _make_table(
    tkey: str,
    table_id: int,
    origin_x: float,
    origin_y: float,
    angle: int = 0,
):
    """``tkey`` names the word-layout draws (SQL-reproducible); the
    prediction-only stream (jitter/drop/dup — never moves a word, so no
    oracle depends on it) is a bulk-drawn ``_PredStream``."""
    rng = _PredStream(f"{tkey}|pred")
    n_rows = _hint(f"{tkey}|nr", 3, 10)  # data rows
    n_cols = _hint(f"{tkey}|nc", 2, 6)
    col_widths = np.array(
        [_huni(f"{tkey}|cw{c}", 55.0, 90.0) for c in range(n_cols)]
    )
    col_x = np.concatenate([[0.0], np.cumsum(col_widths)])
    width = float(col_x[-1])
    height = (n_rows + 1) * ROW_HEIGHT
    row_edges = tuple(float(r * ROW_HEIGHT) for r in range(1, n_rows + 1))
    col_edges = tuple(float(x) for x in col_x[1:-1])

    local = []
    texts = []
    # header row then data rows, reading order (row-major, left→right);
    # one md5 per cell provides sparse/second masks + both token values
    for r in range(n_rows + 1):
        y0 = r * ROW_HEIGHT + 2.5
        y1 = y0 + WORD_HEIGHT
        for c in range(n_cols):
            sparse_v, second_v, tok1, tok2 = _hcell(f"{tkey}|cell{r}_{c}")
            if r > 0 and sparse_v / 4294967296.0 < 0.08:
                continue  # sparse cells
            x0 = col_x[c] + 3.0
            if r == 0:
                t = f"col{c}"
            else:
                t = _token_of(tok1 % 36**4, r, c)
            x1 = x0 + 4.0 + 4.6 * len(t)
            local.append((x0, y0, min(x1, col_x[c + 1] - 1.0), y1))
            texts.append(t)
            # occasionally a second word in the cell (tests ' '-join order)
            if r > 0 and second_v / 4294967296.0 < 0.15:
                t2 = _token_of(tok2 % 36**4, r, c + 11)
                nx0 = x1 + 3.0
                nx1 = min(nx0 + 4.0 + 4.6 * len(t2), col_x[c + 1] - 1.0)
                if nx1 > nx0:
                    local.append((nx0, y0, nx1, y1))
                    texts.append(t2)

    if angle == 90:
        # place the logical layout rotated on the page: the page bbox has
        # swapped dims, and each page-local word is the inverse of the
        # angle-90 text_positions transform (geometry.rotate_words), so
        # extraction with angle=90 recovers the logical frame exactly
        bbox = (origin_x, origin_y, origin_x + height, origin_y + width)
        words = [
            (
                origin_x + r0y,
                origin_y + width - r1x,
                origin_x + r1y,
                origin_y + width - r0x,
            )
            for (r0x, r0y, r1x, r1y) in local
        ]
    else:
        bbox = (origin_x, origin_y, origin_x + width, origin_y + height)
        words = [
            (origin_x + x0, origin_y + y0, origin_x + x1, origin_y + y1)
            for (x0, y0, x1, y1) in local
        ]

    # predictions, table-local
    scores, labels, boxes = [], [], []

    def add(score, label, b):
        scores.append(score)
        labels.append(label)
        boxes.append(list(b))

    jit = lambda s: rng.uniform(-s, s)  # noqa: E731

    if _hrand(f"{tkey}|deg") < 0.02:
        # degenerate scene: the structure model found nothing usable —
        # exercises the pipeline's error-row path deterministically
        add(0.999, LABEL_TABLE, (0.0, 0.0, width, height))
        return (
            SynthTable(
                table_id,
                bbox,
                np.array(scores, dtype=np.float64),
                np.array(labels, dtype=np.int64),
                np.array(boxes, dtype=np.float64),
                angle,
                row_edges,
                col_edges,
            ),
            words,
            texts,
        )

    add(0.999, LABEL_TABLE, (jit(0.5), jit(0.5), width + jit(0.5), height + jit(0.5)))
    add(0.99, LABEL_COLUMN_HEADER, (jit(0.4), jit(0.4), width + jit(0.4), ROW_HEIGHT + jit(0.4)))
    # drop_row is a NAMED draw: dropping the LAST row box loses that row
    # (gap fill only recovers interior gaps), so the expected CSV is a
    # function of it — the SQL twin (scene_sql.EXTRACT_CSV_SQL) needs it.
    # dup_row stays prediction-only (NMS always removes the lower-scored
    # duplicate; output-invariant).
    drop_row = (
        _hint(f"{tkey}|dropr", 1, n_rows + 1)
        if _hrand(f"{tkey}|dropq") < 0.2
        else -1
    )
    dup_row = rng.randint(1, n_rows + 1) if rng.rand() < 0.25 else -1
    # nms-burst: six FIXED-score duplicate row boxes (NAMED draw) — NMS
    # removes all six, tripping the "nms removed rows" outlier past
    # nms_warn_threshold=5, so the F12 channel is a function of the draws
    # (scene_sql flags oracle). Fires only when the drop draw did NOT (a
    # dup whose base band was dropped would become a band and change the
    # grid) and rows 1..6 all exist; 6 stays under the large-table
    # trigger (>= 8 removals). The Mersenne dup_row stays DRAWN (stream
    # stability) but is not emitted in a burst table, keeping the removal
    # count at exactly 6.
    nms_burst = (
        drop_row == -1 and n_rows >= 7 and _hrand(f"{tkey}|nmq") < 0.08
    )
    for r in range(n_rows + 1):
        if r == drop_row:
            continue  # exercises gap fill
        y0 = r * ROW_HEIGHT + jit(0.3)
        y1 = (r + 1) * ROW_HEIGHT + jit(0.3)
        add(float(rng.uniform(0.85, 0.999)), LABEL_ROW, (jit(0.4), y0, width + jit(0.4), y1))
        if r == dup_row and not nms_burst:  # exercises NMS
            add(
                float(rng.uniform(0.4, 0.8)),
                LABEL_ROW,
                (jit(0.4), y0 + jit(1.5), width + jit(0.4), y1 + jit(1.5)),
            )
    if nms_burst:
        for r in range(1, 7):
            y0 = r * ROW_HEIGHT
            add(
                0.5,
                LABEL_ROW,
                (0.0, y0 + 1.5, width, y0 + ROW_HEIGHT + 1.5),
            )
    for c in range(n_cols):
        add(
            float(rng.uniform(0.9, 0.999)),
            LABEL_COLUMN,
            (col_x[c] + jit(0.4), jit(0.4), col_x[c + 1] + jit(0.4), height + jit(0.4)),
        )
    # projected row header over one data row. A NAMED draw (like drop_row):
    # it never moves a word, but the pipeline's `projecting` output column
    # is a function of it, so the flags oracle
    # (scene_sql.EXTRACT_FLAGS_SQL) needs to re-derive it. Stream-safe
    # conversion: these were the LAST Mersenne consumptions per table.
    if n_rows >= 4 and _hrand(f"{tkey}|prq") < 0.15:
        pr = _hint(f"{tkey}|prr", 2, n_rows)
        add(
            0.95,
            LABEL_PROJECTED_ROW_HEADER,
            (0.0, pr * ROW_HEIGHT, width, (pr + 1) * ROW_HEIGHT),
        )
    # two disjoint hierarchical-left spanning cells over column 0 (NAMED
    # draws): under semantic_spanning_cells the 'algorithm' mode needs ≥2
    # spans in a column to forward-fill it, and 'deep' mode fills each
    # span locally — both oracled (scene_sql SPANNING_*_CSV_SQL). Inert
    # in the default config (F1 partitions spanning cells out and nothing
    # reads them). Rows 1-2 and [sp, sp+1] with sp ≥ 3 never overlap, so
    # the hier-left NMS keeps both; sp+1 ≤ n_rows-1 stays clear of the
    # droppable last row.
    if n_rows >= 5 and _hrand(f"{tkey}|spq") < 0.1:
        sp = _hint(f"{tkey}|spr", 3, n_rows - 1)
        for a in (1, sp):
            add(
                0.95,
                LABEL_SPANNING_CELL,
                (0.0, a * ROW_HEIGHT, float(col_x[1]), (a + 2) * ROW_HEIGHT),
            )

    return (
        SynthTable(
            table_id,
            bbox,
            np.array(scores, dtype=np.float64),
            np.array(labels, dtype=np.int64),
            np.array(boxes, dtype=np.float64),
            angle,
            row_edges,
            col_edges,
        ),
        words,
        texts,
    )


def synth_scene(conv_id: str, turn_idx: int) -> SynthScene:
    """Expand ``(conv_id, turn_idx)`` into a deterministic page scene."""
    s = f"{conv_id}|{turn_idx}"
    n_tables = 2 if _hrand(f"{s}|nt") < 0.15 else 1

    word_boxes: List[tuple] = []
    word_texts: List[str] = []

    # caption words above the first table (outside any table bbox)
    cap_y = 60.0
    for i, t in enumerate(["Table", f"{turn_idx}.", "Synthetic", "caption"]):
        x0 = 72.0 + i * 48.0
        word_boxes.append((x0, cap_y, x0 + 4.0 + 4.6 * len(t), cap_y + WORD_HEIGHT))
        word_texts.append(t)

    tables: List[SynthTable] = []
    y = 100.0
    for tid in range(n_tables):
        tkey = f"{s}|{tid}"
        angle = 90 if _hrand(f"{tkey}|ang") < 0.1 else 0
        tbl, words, texts = _make_table(
            tkey,
            tid,
            72.0 + _huni(f"{tkey}|ox", 0.0, 20.0),
            y,
            angle=angle,
        )
        tables.append(tbl)
        word_boxes.extend(words)
        word_texts.extend(texts)
        y = tbl.bbox[3] + 60.0

    return SynthScene(
        conv_id=conv_id,
        turn_idx=turn_idx,
        page_width=PAGE_WIDTH,
        page_height=PAGE_HEIGHT,
        word_boxes=np.array(word_boxes, dtype=np.float64).reshape(-1, 4),
        word_texts=word_texts,
        tables=tables,
    )
