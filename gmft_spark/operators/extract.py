"""The flagship Spark operator: per-turn table extraction.

``extract_tables`` maps a transcript DataFrame through the deterministic
kernel inside ``mapInPandas`` — one Arrow batch carries many turns, each
turn expands to its page scene (words + structure predictions) and runs the
full structure-recognition pipeline (gmft semantics, see
gmft_spark.kernel.table), yielding one row per detected table.

Scale properties (designed for 1000-executor / 100 TB runs):
  * narrow map — NO shuffle: each turn is independent, so extraction runs
    at scan parallelism straight off the (bucketed) source partitions;
  * zero per-row Python at the Spark boundary — Arrow batches in/out;
  * no driver collection; results stream to the sink;
  * long conversations cannot skew this stage since the unit of work is a
    turn, not a conversation (conversation-level assembly downstream uses
    salted repartitioning — see plans/skew.py).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from gmft_spark.config import ExtractConfig
from gmft_spark.kernel.captions import find_captions
from gmft_spark.kernel.geometry import select_table_words
from gmft_spark.kernel.synth import synth_scene
from gmft_spark.kernel.table import TableResult, extract_table
from gmft_spark.kernel.text import assemble_text

RESULT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("table_id", IntegerType()),
        StructField("status", StringType()),
        StructField("message", StringType()),
        StructField("csv", StringType()),
        StructField("n_rows", IntegerType()),
        StructField("n_cols", IntegerType()),
        StructField("columns", ArrayType(StringType())),
        StructField("top_header", ArrayType(IntegerType())),
        StructField("projecting", ArrayType(IntegerType())),
        StructField("hier_left", ArrayType(IntegerType())),
        StructField("outliers", MapType(StringType(), StringType())),
        StructField("table_text", StringType()),
        StructField("caption_above", StringType()),
        StructField("caption_below", StringType()),
        StructField("confidence", DoubleType()),
        # per-cell spans: (row, col, text) for every non-empty cell
        StructField(
            "cells",
            ArrayType(
                StructType(
                    [
                        StructField("row", IntegerType()),
                        StructField("col", IntegerType()),
                        StructField("text", StringType()),
                    ]
                )
            ),
        ),
    ]
)


def _cell_spans(grid) -> list:
    if not grid:
        return []
    return [
        {"row": r, "col": c, "text": v}
        for r, row in enumerate(grid)
        for c, v in enumerate(row)
        if v is not None
    ]


def extract_turn(conv_id: str, turn_idx: int, config: ExtractConfig) -> list:
    """Extract all tables of one turn's page scene (plain-Python kernel
    call — shared by the Spark path and the single-process oracle path in
    tests)."""
    scene = synth_scene(conv_id, turn_idx)
    out = []
    for tbl in scene.tables:
        try:
            res = extract_table(
                tbl.scores,
                tbl.labels,
                tbl.boxes,
                scene.word_boxes,
                scene.word_texts,
                tbl.bbox,
                config,
                angle=tbl.angle,
            )
        except Exception as exc:  # pathological table → error row, not a
            # dead task; the reference raises here (e.g. structure.py:953),
            # but a 1000-executor job must degrade per-row
            res = TableResult(status="error", message=f"{type(exc).__name__}: {exc}")
        # table_text follows the reference's CroppedTable.text(): original
        # page coordinates, no rotation (detectors/base.py:213-221)
        local, kept = select_table_words(
            scene.word_boxes, scene.word_texts, tbl.bbox
        )
        cap_above, cap_below = find_captions(
            scene.word_boxes, scene.word_texts, tbl.bbox
        )
        out.append(
            {
                "conv_id": conv_id,
                "turn_idx": int(turn_idx),
                "table_id": tbl.table_id,
                "status": res.status,
                "message": res.message,
                "csv": res.csv,
                "n_rows": res.n_rows,
                "n_cols": res.n_cols,
                "columns": res.columns,
                "top_header": res.top_header,
                "projecting": res.projecting,
                "hier_left": res.hier_left,
                "outliers": {k: str(v) for k, v in res.outliers.items()},
                "table_text": assemble_text(local, kept),
                "caption_above": cap_above,
                "caption_below": cap_below,
                "confidence": 1.0,
                "cells": _cell_spans(res.grid),
            }
        )
    return out


def extract_tables(
    transcripts: DataFrame, config: Optional[ExtractConfig] = None
) -> DataFrame:
    """Transcripts → one row per extracted table. Narrow map, no shuffle."""
    cfg = config or ExtractConfig()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for conv_id, turn_idx in zip(batch["conv_id"], batch["turn_idx"]):
                rows.extend(extract_turn(conv_id, int(turn_idx), cfg))
            if rows:
                yield pd.DataFrame(rows)

    # only the key columns cross the Arrow boundary
    return transcripts.select("conv_id", "turn_idx").mapInPandas(
        run, schema=RESULT_SCHEMA
    )


PAGE_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("page_text", StringType()),
        StructField("n_tables", IntegerType()),
        StructField("n_words", IntegerType()),
    ]
)


def assemble_pages(
    transcripts: DataFrame, config: Optional[ExtractConfig] = None
) -> DataFrame:
    """P1-P3: per-turn rich page text — paragraphs with each extracted
    table embedded as markdown at its reading-order position
    (gmft_spark.kernel.page). Narrow map, one row per turn."""
    from gmft_spark.kernel.page import (
        embed_tables_into_page_text,
        grid_to_markdown,
    )

    cfg = config or ExtractConfig()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for conv_id, turn_idx in zip(batch["conv_id"], batch["turn_idx"]):
                scene = synth_scene(conv_id, int(turn_idx))
                bboxes, mds = [], []
                for tbl in scene.tables:
                    try:
                        res = extract_table(
                            tbl.scores,
                            tbl.labels,
                            tbl.boxes,
                            scene.word_boxes,
                            scene.word_texts,
                            tbl.bbox,
                            cfg,
                            angle=tbl.angle,
                        )
                    except Exception:
                        continue  # failed table → plain-paragraph fallback
                    if res.status == "ok":
                        bboxes.append(tbl.bbox)
                        mds.append(grid_to_markdown(res.columns, res.grid))
                text = embed_tables_into_page_text(
                    scene.word_boxes, scene.word_texts, bboxes, mds
                )
                rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": int(turn_idx),
                        "page_text": text,
                        "n_tables": len(mds),
                        "n_words": len(scene.word_texts),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return transcripts.select("conv_id", "turn_idx").mapInPandas(
        run, schema=PAGE_SCHEMA
    )


def extract_tables_ditr(
    transcripts: DataFrame, config: Optional[ExtractConfig] = None
) -> DataFrame:
    """DITR-model twin of ``extract_tables``: divider predictions (derived
    from each scene's ground-truth grid, standing in for the DITR neural
    model) run through the divider-formatter kernel (gmft_spark.kernel.ditr).
    Same narrow-map scaling profile."""
    from gmft_spark.kernel.ditr import ditr_extract

    cfg = config or ExtractConfig()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for conv_id, turn_idx in zip(batch["conv_id"], batch["turn_idx"]):
                scene = synth_scene(conv_id, int(turn_idx))
                for tbl in scene.tables:
                    d_scores, d_labels, d_boxes = tbl.divider_predictions()
                    try:
                        res = ditr_extract(
                            d_scores,
                            d_labels,
                            d_boxes,
                            scene.word_boxes,
                            scene.word_texts,
                            tbl.bbox,
                            cfg,
                            angle=tbl.angle,
                        )
                    except Exception as exc:
                        res = TableResult(
                            status="error",
                            message=f"{type(exc).__name__}: {exc}",
                        )
                    local, kept = select_table_words(
                        scene.word_boxes, scene.word_texts, tbl.bbox
                    )
                    rows.append(
                        {
                            "conv_id": conv_id,
                            "turn_idx": int(turn_idx),
                            "table_id": tbl.table_id,
                            "status": res.status,
                            "message": res.message,
                            "csv": res.csv,
                            "n_rows": res.n_rows,
                            "n_cols": res.n_cols,
                            "columns": res.columns,
                            "top_header": res.top_header,
                            "projecting": res.projecting,
                            "hier_left": res.hier_left,
                            "outliers": {},
                            "table_text": assemble_text(local, kept),
                            "caption_above": None,
                            "caption_below": None,
                            "confidence": 1.0,
                            "cells": _cell_spans(res.grid),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return transcripts.select("conv_id", "turn_idx").mapInPandas(
        run, schema=RESULT_SCHEMA
    )


def extract_tables_histogram(transcripts: DataFrame) -> DataFrame:
    """Non-deep twin of ``extract_tables``: the histogram formatter
    (sweep-line dividers, gmft_spark.kernel.histogram) over the same
    scenes. Same narrow-map scaling profile."""
    from gmft_spark.kernel.histogram import histogram_extract

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for conv_id, turn_idx in zip(batch["conv_id"], batch["turn_idx"]):
                scene = synth_scene(conv_id, int(turn_idx))
                for tbl in scene.tables:
                    local, kept = select_table_words(
                        scene.word_boxes, scene.word_texts, tbl.bbox,
                        angle=tbl.angle,
                    )
                    # logical dims swap for rotated tables
                    # (CroppedTable.width/height, detectors/base.py:373-383)
                    w = tbl.bbox[2] - tbl.bbox[0]
                    h = tbl.bbox[3] - tbl.bbox[1]
                    if tbl.angle in (90, 270):
                        w, h = h, w
                    res = histogram_extract(local, kept, w, h)
                    rows.append(
                        {
                            "conv_id": conv_id,
                            "turn_idx": int(turn_idx),
                            "table_id": tbl.table_id,
                            "status": res.status,
                            "message": res.message,
                            "csv": res.csv,
                            "n_rows": res.n_rows,
                            "n_cols": res.n_cols,
                            "columns": res.columns,
                            "top_header": res.top_header,
                            "projecting": res.projecting,
                            "hier_left": res.hier_left,
                            "outliers": {},
                            "table_text": assemble_text(local, kept),
                            "caption_above": None,
                            "caption_below": None,
                            "confidence": 1.0,
                            "cells": _cell_spans(res.grid),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return transcripts.select("conv_id", "turn_idx").mapInPandas(
        run, schema=RESULT_SCHEMA
    )
