"""img2table-style LINE-BASED table detection (reference
gmft/detectors/img2table.py:27-412).

The reference adapts img2table, whose detector works from detected
RULING LINES: horizontal/vertical line segments are intersected into a
lattice, and each connected lattice becomes one table candidate (the
bordered-table niche the word-box and whitespace-projection detectors
don't cover). This module re-expresses that flow relationally:

* ``ruling_lines`` — the line-segments INPUT frame. In production this
  column comes from a line detector over the page image (cv2 Hough /
  morphology in img2table); here the sandbox's deterministic scenes
  provide the ground-truth grid, so the lines are generated from each
  table's grid geometry (page coords, rotation applied) — giving the
  detector a real reconstruction problem whose answer the DuckDB oracle
  knows in closed form.
* ``img2table_detect`` — the detector: per-page h×v intersection join →
  connected components over the line graph (alternating-star CC, the
  same O(log d) machinery as MinHash cluster canonicalization) → one
  candidate per component with ≥2 horizontal and ≥2 vertical lines (a
  lattice with at least one closed cell, img2table's minimal table).
  Confidence is the reference adapter's constant 0.9
  (detectors/img2table.py:316-321 — img2table yields no score).

Scale shape: the intersection join is an equi-join on the page key with
an in-page interval test (lines per page are few; pages are many); the
component grouping is the star CC's bounded-round global pass; the final
aggregation is one map-side-combinable groupBy per component. No step
enumerates cross-page or cross-table pairs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from gmft_spark.kernel.synth import synth_scene

LINES_SCHEMA = (
    "conv_id string, turn_idx int, line_id int, orient string, "
    "x0 double, y0 double, x1 double, y1 double"
)


def ruling_lines(transcripts: DataFrame) -> DataFrame:
    """Grid ruling lines per turn (page coords): every table contributes
    its horizontal cell edges (n_rows+2 lines: top, each row edge,
    bottom) and vertical edges (n_cols+1). Rotation maps logical
    horizontals to page verticals exactly as the word transform does
    (kernel/synth._make_table). ``line_id`` is an opaque per-page
    counter — the detector gets no table identity to lean on."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for conv_id, turn_idx in zip(batch["conv_id"], batch["turn_idx"]):
                scene = synth_scene(conv_id, int(turn_idx))
                lid = 0
                for tb in scene.tables:
                    ox, oy = tb.bbox[0], tb.bbox[1]
                    width = tb.bbox[2] - tb.bbox[0]
                    height = tb.bbox[3] - tb.bbox[1]
                    lw, lh = (height, width) if tb.angle == 90 else (width, height)
                    ys = [0.0, *tb.row_edges, lh]
                    xs = [0.0, *tb.col_edges, lw]
                    segs = []
                    for y in ys:  # logical horizontals
                        segs.append((0.0, y, lw, y))
                    for x in xs:  # logical verticals
                        segs.append((x, 0.0, x, lh))
                    for (x0, y0, x1, y1) in segs:
                        if tb.angle == 90:
                            # logical→page: same transform as the words
                            px0, py0, px1, py1 = (
                                ox + y0,
                                oy + lw - x1,
                                ox + y1,
                                oy + lw - x0,
                            )
                        else:
                            px0, py0, px1, py1 = ox + x0, oy + y0, ox + x1, oy + y1
                        rows.append(
                            {
                                "conv_id": conv_id,
                                "turn_idx": int(turn_idx),
                                "line_id": lid,
                                "orient": "h" if py0 == py1 else "v",
                                "x0": px0,
                                "y0": py0,
                                "x1": px1,
                                "y1": py1,
                            }
                        )
                        lid += 1
            if rows:
                yield pd.DataFrame(rows)

    return transcripts.select("conv_id", "turn_idx").mapInPandas(
        run, schema=LINES_SCHEMA
    )


def img2table_lattices(lines: DataFrame) -> DataFrame:
    """Lattices from a ruling-lines frame: intersect page horizontals
    with verticals, group lines into components, keep components with a
    closed cell, and emit one lattice per component carrying the bbox,
    page-space grid shape (n_h−1 × n_v−1), the sorted edge positions
    (``h_edges`` = distinct horizontal-line y's, ``v_edges`` = vertical
    x's — the cell boundaries the formatter partitions words with), the
    adapter's constant 0.9 confidence, and det_id in reading order."""
    from gmft_spark.operators.similarity import connected_components_star

    key = F.concat_ws("|", "conv_id", F.col("turn_idx").cast("string"))
    ln = lines.select(
        key.alias("page"),
        "conv_id",
        "turn_idx",
        F.format_string("%s|%08d", key, "line_id").alias("vid"),
        "orient",
        "x0",
        "y0",
        "x1",
        "y1",
    )
    h = ln.filter(F.col("orient") == "h").alias("h")
    v = ln.filter(F.col("orient") == "v").alias("v")
    inter = h.join(
        v,
        (F.col("h.page") == F.col("v.page"))
        & (F.col("v.x0") >= F.col("h.x0"))
        & (F.col("v.x0") <= F.col("h.x1"))
        & (F.col("h.y0") >= F.col("v.y0"))
        & (F.col("h.y0") <= F.col("v.y1")),
    ).select(F.col("h.vid").alias("vec_id"), F.col("v.vid").alias("nb"))
    edges = inter.union(
        inter.select(F.col("nb").alias("vec_id"), F.col("vec_id").alias("nb"))
    )
    comp = connected_components_star(ln.select(F.col("vid").alias("vec_id")), edges)
    member = ln.join(comp, ln["vid"] == comp["vec_id"]).select(
        "conv_id", "turn_idx", "canonical_id", "orient", "x0", "y0", "x1", "y1"
    )
    agg = (
        member.groupBy("conv_id", "turn_idx", "canonical_id")
        .agg(
            F.min("x0").alias("bx0"),
            F.min("y0").alias("by0"),
            F.max("x1").alias("bx1"),
            F.max("y1").alias("by1"),
            F.sum(F.when(F.col("orient") == "h", 1).otherwise(0)).alias("n_h"),
            F.sum(F.when(F.col("orient") == "v", 1).otherwise(0)).alias("n_v"),
            F.array_sort(
                F.collect_set(F.when(F.col("orient") == "h", F.col("y0")))
            ).alias("h_edges"),
            F.array_sort(
                F.collect_set(F.when(F.col("orient") == "v", F.col("x0")))
            ).alias("v_edges"),
        )
        .filter((F.col("n_h") >= 2) & (F.col("n_v") >= 2))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id", "turn_idx").orderBy("by0", "bx0")
    return agg.select(
        "conv_id",
        "turn_idx",
        (F.row_number().over(w) - 1).cast("int").alias("det_id"),
        F.round("bx0", 6).alias("x0"),
        F.round("by0", 6).alias("y0"),
        F.round("bx1", 6).alias("x1"),
        F.round("by1", 6).alias("y1"),
        (F.col("n_h") - 1).cast("int").alias("grid_rows"),
        (F.col("n_v") - 1).cast("int").alias("grid_cols"),
        F.lit(0.9).alias("score"),
        "h_edges",
        "v_edges",
    )


def img2table_detect(lines: DataFrame) -> DataFrame:
    """Table candidates (detection view of ``img2table_lattices``)."""
    return img2table_lattices(lines).drop("h_edges", "v_edges").orderBy(
        "conv_id", "turn_idx", "det_id"
    )


CELLS_SCHEMA = (
    "conv_id string, turn_idx int, det_id int, "
    "row int, col int, text string"
)


def img2table_extract_cells(
    transcripts: DataFrame, lattices: DataFrame | None = None
) -> DataFrame:
    """img2table-style FORMATTER (reference gmft/formatters/img2table.py:
    the ExtractedTable.df cell grid): partition each page's words into
    the lattice's cells and emit (det_id, row, col, text) per non-empty
    cell — page-space grid, exactly what a line-based extractor sees
    (a 90°-rotated table comes out as its page-space transpose; the
    reference adapter has no rotation concept either).

    Assignment rule (oracle twin scene_sql.IMG2TABLE_CELLS_SQL): a word
    belongs to the cell whose half-open edge bands contain its top-left
    corner; words outside the lattice (captions, other tables) drop.
    Multi-word cells join by ' ' in (x0, y0) page order.

    Plan: lattices aggregate to one row per page (they are manifest-size
    next to the word payload), equi-join on the page key, then a narrow
    assignment map — the word stream never shuffles."""
    from bisect import bisect_right

    if lattices is None:
        lattices = img2table_lattices(ruling_lines(transcripts))
    per_page = lattices.groupBy("conv_id", "turn_idx").agg(
        F.collect_list(F.struct("det_id", "h_edges", "v_edges")).alias("lats")
    )
    pages = transcripts.select("conv_id", "turn_idx").join(
        per_page, ["conv_id", "turn_idx"], "left"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for conv_id, turn_idx, lats in zip(
                batch["conv_id"], batch["turn_idx"], batch["lats"]
            ):
                if lats is None:
                    continue
                scene = synth_scene(conv_id, int(turn_idx))
                for lat in lats:
                    ys, xs = list(lat["h_edges"]), list(lat["v_edges"])
                    cells: dict = {}
                    for (x0, y0, _x1, _y1), txt in zip(
                        scene.word_boxes, scene.word_texts
                    ):
                        r = bisect_right(ys, y0) - 1
                        c = bisect_right(xs, x0) - 1
                        if not (0 <= r < len(ys) - 1 and 0 <= c < len(xs) - 1):
                            continue
                        cells.setdefault((r, c), []).append((x0, y0, txt))
                    for (r, c), ws in sorted(cells.items()):
                        ws.sort(key=lambda w: (w[0], w[1]))
                        rows.append(
                            {
                                "conv_id": conv_id,
                                "turn_idx": int(turn_idx),
                                "det_id": int(lat["det_id"]),
                                "row": r,
                                "col": c,
                                "text": " ".join(w[2] for w in ws),
                            }
                        )
            if rows:
                yield pd.DataFrame(rows)

    return pages.mapInPandas(run, schema=CELLS_SCHEMA).orderBy(
        "conv_id", "turn_idx", "det_id", "row", "col"
    )


def img2table_detect_pipeline(spark, sf_dir: str, sample_mod: int = 1) -> DataFrame:
    from gmft_spark.sources.transcripts import transcripts_from_documents

    t = transcripts_from_documents(spark, sf_dir, sample_mod=sample_mod)
    return img2table_detect(ruling_lines(t))
