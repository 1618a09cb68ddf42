"""Detection stage: page words → table candidate bboxes.

The reference's stage 1 runs a TATR object detector per page
(/root/reference/gmft/detectors/tatr.py:58-99). This module implements
the Spark-side production pattern for that stage — **broadcast model
weights, lazy per-worker singleton init, Arrow-batched inference with
zero per-row Python** — with a deterministic layout-analysis model
standing in for the neural net (torch is not in this container; the seam
to swap in real TATR weights is `_LayoutDetector.infer`).

The stand-in model is a real detector, not a lookup: it clusters word
lines by vertical gaps (parameters come from the broadcast weight
vector), keeps blocks that look tabular (enough lines, consistent
spacing), and emits (bbox, score) per candidate — so detection quality is
actually testable against the scene ground truth.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F  # noqa: F401
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from gmft_spark.kernel.synth import synth_scene

DETECT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("det_id", IntegerType()),
        StructField("x0", DoubleType()),
        StructField("y0", DoubleType()),
        StructField("x1", DoubleType()),
        StructField("y1", DoubleType()),
        StructField("score", DoubleType()),
        StructField("label", IntegerType()),
    ]
)

# weight vector layout: [line_gap, block_gap, min_lines, score_base, score_slope]
DEFAULT_WEIGHTS = np.array([6.0, 25.0, 3.0, 0.90, 0.002], dtype=np.float64)


class _LayoutDetector:
    """Executor-side lazy singleton holding the (broadcast) weights —
    the init-once-per-python-worker pattern used for real model weights.

    Keyed BY WEIGHTS: python workers are reused across jobs
    (spark.python.worker.reuse), so two operators requesting different
    weight vectors in one application (e.g. detect_pipeline's
    point-space weights vs the image-OCR path's scale-multiplied pixel
    weights) must each get their own instance — a single unkeyed slot
    silently served the FIRST caller's weights to everyone, which made
    image-only extraction return zero tables whenever a detect test had
    already warmed the worker."""

    _instances: dict[bytes, "_LayoutDetector"] = {}

    def __init__(self, weights: np.ndarray):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.init_count = 1  # observability: assert singleton-ness in tests

    @classmethod
    def get(cls, weights: np.ndarray) -> "_LayoutDetector":
        key = np.asarray(weights, dtype=np.float64).tobytes()
        inst = cls._instances.get(key)
        if inst is None:
            inst = cls(weights)
            cls._instances[key] = inst
        return inst

    def infer(self, word_boxes: np.ndarray):
        """Batch 'inference': vertical-gap block clustering.
        Returns list of (bbox, score)."""
        line_gap, block_gap, min_lines, base, slope = self.weights
        if len(word_boxes) == 0:
            return []
        order = np.argsort(word_boxes[:, 1], kind="stable")
        boxes = word_boxes[order]
        # cluster into lines by y0 proximity
        lines = []
        cur = [boxes[0]]
        for b in boxes[1:]:
            if abs(b[1] - cur[-1][1]) <= line_gap:
                cur.append(b)
            else:
                lines.append(np.array(cur))
                cur = [b]
        lines.append(np.array(cur))
        # cluster lines into blocks by inter-line gap
        blocks = []
        cur_block = [lines[0]]
        for ln in lines[1:]:
            prev_bottom = max(x[3] for x in cur_block[-1])
            if ln[:, 1].min() - prev_bottom <= block_gap:
                cur_block.append(ln)
            else:
                blocks.append(cur_block)
                cur_block = [ln]
        blocks.append(cur_block)

        out = []
        for blk in blocks:
            if len(blk) < min_lines:
                continue
            allw = np.concatenate(blk)
            bbox = (
                float(allw[:, 0].min()),
                float(allw[:, 1].min()),
                float(allw[:, 2].max()),
                float(allw[:, 3].max()),
            )
            score = min(base + slope * len(allw), 0.999)
            out.append((bbox, score))
        return out

    def infer_raster(self, arr: np.ndarray):
        """Image-input inference — the reference detector's actual input
        modality (TATR consumes the rendered page image,
        detectors/tatr.py:58-99). Pixel twin of ``infer``: ink-row runs
        are lines, blank gaps ≤ block_gap merge runs into blocks, blocks
        with ≥ min_lines runs become detections; the word count driving
        the score is approximated by ink column-runs per line band.
        Returns list of (bbox, score) in pixel coords (= page points at
        render scale 1)."""
        from gmft_spark.kernel.raster import mask_runs

        _line_gap, block_gap, min_lines, base, slope = self.weights
        ink = arr < 128
        # ink-row runs (consecutive rows with any ink), INCLUSIVE ends
        runs = [(a, b - 1) for a, b in mask_runs(ink.any(axis=1))]
        if not runs:
            return []
        # merge runs into blocks by blank-gap
        blocks = [[runs[0]]]
        for r in runs[1:]:
            if r[0] - blocks[-1][-1][1] - 1 <= block_gap:
                blocks[-1].append(r)
            else:
                blocks.append([r])
        out = []
        for blk in blocks:
            if len(blk) < min_lines:
                continue
            r0, r1 = blk[0][0], blk[-1][1] + 1
            band = ink[r0:r1]
            cols = np.flatnonzero(band.any(axis=0))
            n_words = 0
            for a, b in blk:
                colmask = ink[a : b + 1].any(axis=0)
                # words per line = ink column-runs (0→1 transitions)
                n_words += int(
                    np.count_nonzero(np.diff(colmask.astype(np.int8)) == 1)
                    + colmask[0]
                )
            bbox = (
                float(cols.min()),
                float(r0),
                float(cols.max() + 1),
                float(r1),
            )
            out.append((bbox, min(base + slope * n_words, 0.999)))
        return out


def detect_tables(transcripts: DataFrame, weights: np.ndarray | None = None) -> DataFrame:
    """Per-turn table detection. The weight vector is broadcast once;
    every python worker materializes the model a single time and reuses
    it across Arrow batches."""
    spark = transcripts.sparkSession
    bweights = spark.sparkContext.broadcast(
        DEFAULT_WEIGHTS if weights is None else np.asarray(weights)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _LayoutDetector.get(bweights.value)  # lazy singleton
        for batch in batches:
            rows = []
            for conv_id, turn_idx in zip(batch["conv_id"], batch["turn_idx"]):
                scene = synth_scene(conv_id, int(turn_idx))
                for det_id, (bbox, score) in enumerate(
                    model.infer(scene.word_boxes)
                ):
                    rows.append(
                        {
                            "conv_id": conv_id,
                            "turn_idx": int(turn_idx),
                            "det_id": det_id,
                            "x0": bbox[0],
                            "y0": bbox[1],
                            "x1": bbox[2],
                            "y1": bbox[3],
                            "score": score,
                            "label": 0,
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return transcripts.select("conv_id", "turn_idx").mapInPandas(
        run, schema=DETECT_SCHEMA
    )


def detect_tables_in_rasters(
    rendered: DataFrame, weights: np.ndarray | None = None
) -> DataFrame:
    """Image-input detection over rendered pages (``operators/render.py``
    output: conv_id, turn_idx, png): decode the PNG payload and run the
    raster inference — the full reference shape (render → image →
    detector) with the broadcast-weights / lazy-singleton / Arrow-batch
    production pattern intact. Narrow map: payload bytes never leave
    their partition."""
    from gmft_spark.kernel.raster import decode_png

    spark = rendered.sparkSession
    bweights = spark.sparkContext.broadcast(
        DEFAULT_WEIGHTS if weights is None else np.asarray(weights)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _LayoutDetector.get(bweights.value)
        for batch in batches:
            rows = []
            for conv_id, turn_idx, png in zip(
                batch["conv_id"], batch["turn_idx"], batch["png"]
            ):
                try:
                    arr = decode_png(bytes(png))
                except ValueError:
                    # corrupt/hostile payload: contained as an error
                    # detection row (det_id -1), never a task failure —
                    # same contract as the PDF decode path
                    rows.append(
                        {
                            "conv_id": conv_id,
                            "turn_idx": int(turn_idx),
                            "det_id": -1,
                            "x0": 0.0,
                            "y0": 0.0,
                            "x1": 0.0,
                            "y1": 0.0,
                            "score": 0.0,
                            "label": -1,
                        }
                    )
                    continue
                for det_id, (bbox, score) in enumerate(model.infer_raster(arr)):
                    rows.append(
                        {
                            "conv_id": conv_id,
                            "turn_idx": int(turn_idx),
                            "det_id": det_id,
                            "x0": bbox[0],
                            "y0": bbox[1],
                            "x1": bbox[2],
                            "y1": bbox[3],
                            "score": score,
                            "label": 0,
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return rendered.select("conv_id", "turn_idx", "png").mapInPandas(
        run, schema=DETECT_SCHEMA
    )
