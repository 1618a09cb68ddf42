"""Optional REAL TableTransformer inference behind the detection seam.

``operators/detect.py`` implements the production Spark shape for the
reference's neural stages (broadcast weights, lazy per-worker singleton,
Arrow-batched ``mapInPandas``, zero per-row Python) with a deterministic
stand-in model, because this sandbox has no torch. This module is the
other half of that seam: when ``torch`` + ``transformers`` ARE
installed, it loads the actual TATR checkpoints the reference uses —

* detection:  ``microsoft/table-transformer-detection``
  (reference /root/reference/gmft/detectors/tatr.py:58-99 and
  impl/tatr/config.py:19-25 — threshold 0.9, ``no_timm`` revision,
  label 1 means the table is rotated 90°);
* structure:  ``microsoft/table-transformer-structure-recognition``
  (reference /root/reference/gmft/formatters/tatr.py:263-319 and
  impl/tatr/config.py:55-70 — threshold 0.3, labeled boxes
  ``table row``/``table column``/``table spanning cell``/
  ``table projected row header``/``table column header``)

— into the same plan: the model materializes once per python worker
(HF-cache load keyed on (path, revision, device)), batches flow through
Arrow, and the output schema is drop-in compatible with the stand-in
(``DETECT_SCHEMA``; structure adds a string label + score per box, the
exact "functional prediction" input kernel/table.py formats).

Everything degrades loudly: import of THIS MODULE never touches torch;
calling an inference entrypoint without torch raises a RuntimeError
naming the dependency and the deterministic fallback. The config
plumbing (paths, revisions, thresholds, device resolution) is plain
dataclass logic and is unit-tested in the sandbox; the torch-bearing
branch is exercised only where torch exists.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from gmft_spark.operators.detect import DETECT_SCHEMA

# the reference's structure labels, in its id order (formatters/tatr.py —
# id2label of microsoft/table-transformer-structure-recognition)
STRUCTURE_LABELS = (
    "table",
    "table column",
    "table row",
    "table column header",
    "table projected row header",
    "table spanning cell",
)


@dataclass
class TATRInferenceConfig:
    """Checkpoint + decode parameters, mirroring the reference's
    TATRDetectorConfig / TATRFormatConfig defaults (impl/tatr/config.py)."""

    detector_path: str = "microsoft/table-transformer-detection"
    structure_path: str = "microsoft/table-transformer-structure-recognition"
    image_processor_path: str = "microsoft/table-transformer-detection"
    no_timm: bool = True  # hub revision without the timm backbone
    torch_device: str = "auto"  # auto → cuda if available else cpu
    detector_threshold: float = 0.9
    structure_threshold: float = 0.3
    batch_size: int = 4  # images per forward pass inside one Arrow batch
    extra: dict = field(default_factory=dict)

    @property
    def revision(self) -> Optional[str]:
        return "no_timm" if self.no_timm else None


def torch_available() -> bool:
    try:  # pragma: no cover - trivially true/false per environment
        import torch  # noqa: F401
        import transformers  # noqa: F401

        return True
    except ImportError:
        return False


_MISSING_DEP_MSG = (
    "the real-TATR inference path needs `torch` and `transformers` "
    "(pip install torch transformers); this environment has neither. "
    "Use operators.detect.detect_tables / detect_tables_in_rasters "
    "(the deterministic layout model behind the same broadcast-weights "
    "seam) or install the dependencies."
)


def _require_torch() -> None:
    if not torch_available():
        raise RuntimeError(_MISSING_DEP_MSG)


def resolve_device(requested: str) -> str:
    """'auto' → cuda when present else cpu; explicit values pass through
    (reference gmft/core/ml device resolution)."""
    if requested != "auto":
        return requested
    if not torch_available():
        return "cpu"
    import torch

    return "cuda" if torch.cuda.is_available() else "cpu"


class _HFTableTransformer:
    """Executor-side lazy singleton per (model_path, revision, device):
    the exact pattern `_LayoutDetector` stands in for, now holding a real
    TableTransformerForObjectDetection. Loading goes through the HF cache
    (every worker on a host shares the downloaded checkpoint; on an
    air-gapped cluster pre-seed the cache or point model_path at a
    cluster-visible directory)."""

    _instances: dict = {}

    def __init__(self, model_path: str, processor_path: str, revision, device: str):
        _require_torch()
        from transformers import (  # type: ignore[import-not-found]
            AutoImageProcessor,
            TableTransformerForObjectDetection,
        )

        self.processor = AutoImageProcessor.from_pretrained(processor_path)
        self.model = (
            TableTransformerForObjectDetection.from_pretrained(
                model_path, revision=revision
            )
            .to(device)
            .eval()
        )
        self.device = device
        self.init_count = 1

    @classmethod
    def get(
        cls, model_path: str, processor_path: str, revision, device: str
    ) -> "_HFTableTransformer":
        key = (model_path, processor_path, revision, device)
        inst = cls._instances.get(key)
        if inst is None:
            inst = cls(model_path, processor_path, revision, device)
            cls._instances[key] = inst
        return inst

    def infer(self, images: list, threshold: float) -> list:
        """images: list of HxW (grayscale) or HxWx3 uint8 arrays →
        per-image list of (bbox, score, label_id). One batched forward
        pass per call; post-processing matches the reference
        (post_process_object_detection at the caller's threshold)."""
        import torch

        rgb = [
            np.stack([im] * 3, axis=-1) if im.ndim == 2 else im for im in images
        ]
        encoding = self.processor(images=rgb, return_tensors="pt").to(self.device)
        with torch.no_grad():
            outputs = self.model(**encoding)
        sizes = torch.tensor([im.shape[:2] for im in rgb])
        results = self.processor.post_process_object_detection(
            outputs, threshold=threshold, target_sizes=sizes
        )
        out = []
        for res in results:
            dets = []
            for box, score, label in zip(
                res["boxes"].tolist(),
                res["scores"].tolist(),
                res["labels"].tolist(),
            ):
                dets.append((tuple(box), float(score), int(label)))
            dets.sort(key=lambda d: (-d[1], d[0]))
            out.append(dets)
        return out


def _detector_model(cfg: TATRInferenceConfig) -> "_HFTableTransformer":
    """Worker-side loader: device is resolved HERE (per executor), so a
    CPU-only driver submitting to GPU executors still lands the model on
    each executor's GPU."""
    return _HFTableTransformer.get(
        cfg.detector_path,
        cfg.image_processor_path,
        cfg.revision,
        resolve_device(cfg.torch_device),
    )


def _structure_model(cfg: TATRInferenceConfig) -> "_HFTableTransformer":
    """Worker-side loader for structure recognition. The image processor
    comes from ``image_processor_path`` (the DETECTION checkpoint), not
    the structure checkpoint — reference gmft/formatters/tatr.py:252 with
    impl/tatr/config.py:54."""
    return _HFTableTransformer.get(
        cfg.structure_path,
        cfg.image_processor_path,
        cfg.revision,
        resolve_device(cfg.torch_device),
    )


def detect_tables_tatr(
    rendered: DataFrame,
    config: TATRInferenceConfig | None = None,
    model_fn=None,
) -> DataFrame:
    """Real-TATR drop-in for ``detect.detect_tables_in_rasters``: same
    input (conv_id, turn_idx, png), same ``DETECT_SCHEMA`` output. Label
    semantics follow the reference detector: label 1 marks a table
    rotated 90° (detectors/tatr.py:92-99). Raises at PLAN time when
    torch is absent — never ships a doomed job to the executors.

    ``model_fn(cfg) -> model`` swaps the HF loader for an alternate
    inference runtime (ONNX/quantized) or a stub replaying recorded
    predictions — the returned object needs only
    ``infer(images, threshold)``. With an injected model the torch gate
    is skipped (the model defines its own runtime); the postprocess
    assembly below runs unchanged, which is how the reference's recorded
    predictions (data/test/references/tatr_tables.json) exercise this
    path torch-free in tests/test_detect_tatr.py."""
    if model_fn is None:
        _require_torch()
    cfg = config or TATRInferenceConfig()
    loader = model_fn or _detector_model

    from gmft_spark.kernel.raster import decode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = loader(cfg)
        for batch in batches:
            rows = []
            metas, images = [], []
            for conv_id, turn_idx, png in zip(
                batch["conv_id"], batch["turn_idx"], batch["png"]
            ):
                try:
                    images.append(decode_png(bytes(png)))
                    metas.append((conv_id, int(turn_idx)))
                except ValueError:
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
            for i in range(0, len(images), cfg.batch_size):
                chunk = model.infer(
                    images[i : i + cfg.batch_size], cfg.detector_threshold
                )
                for (conv_id, turn_idx), dets in zip(
                    metas[i : i + cfg.batch_size], chunk
                ):
                    for det_id, (bbox, score, label) in enumerate(dets):
                        rows.append(
                            {
                                "conv_id": conv_id,
                                "turn_idx": turn_idx,
                                "det_id": det_id,
                                "x0": bbox[0],
                                "y0": bbox[1],
                                "x1": bbox[2],
                                "y1": bbox[3],
                                "score": score,
                                "label": label,
                            }
                        )
            if rows:
                yield pd.DataFrame(rows)

    return rendered.select("conv_id", "turn_idx", "png").mapInPandas(
        run, schema=DETECT_SCHEMA
    )


STRUCTURE_TATR_SCHEMA = (
    "conv_id string, turn_idx int, det_id int, pred_id int, "
    "label string, x0 double, y0 double, x1 double, y1 double, score double"
)


def recognize_structure_tatr(
    tiles: DataFrame,
    config: TATRInferenceConfig | None = None,
    model_fn=None,
) -> DataFrame:
    """Real-TATR structure recognition over cropped table tiles
    (``render.crop_table_images`` output): one labeled box per prediction
    — the "functional predictions" (rows/columns/headers/spanning cells)
    that kernel/table.py's formatter consumes. Same lazy-singleton /
    Arrow-batch seam as the detector; threshold 0.3 per the reference
    formatter default. ``model_fn`` is the same alternate-runtime /
    recorded-predictions seam as ``detect_tables_tatr``'s."""
    if model_fn is None:
        _require_torch()
    cfg = config or TATRInferenceConfig()
    loader = model_fn or _structure_model

    from gmft_spark.kernel.raster import decode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = loader(cfg)
        for batch in batches:
            rows = []
            metas, images = [], []
            for conv_id, turn_idx, det_id, png in zip(
                batch["conv_id"], batch["turn_idx"], batch["det_id"], batch["png"]
            ):
                try:
                    images.append(decode_png(bytes(png)))
                    metas.append((conv_id, int(turn_idx), int(det_id)))
                except ValueError:
                    rows.append(
                        {
                            "conv_id": conv_id,
                            "turn_idx": int(turn_idx),
                            "det_id": int(det_id),
                            "pred_id": -1,
                            "label": "error",
                            "x0": 0.0,
                            "y0": 0.0,
                            "x1": 0.0,
                            "y1": 0.0,
                            "score": 0.0,
                        }
                    )
            for i in range(0, len(images), cfg.batch_size):
                chunk = model.infer(
                    images[i : i + cfg.batch_size], cfg.structure_threshold
                )
                for (conv_id, turn_idx, det_id), dets in zip(
                    metas[i : i + cfg.batch_size], chunk
                ):
                    for pred_id, (bbox, score, label) in enumerate(dets):
                        rows.append(
                            {
                                "conv_id": conv_id,
                                "turn_idx": turn_idx,
                                "det_id": det_id,
                                "pred_id": pred_id,
                                "label": STRUCTURE_LABELS[label]
                                if 0 <= label < len(STRUCTURE_LABELS)
                                else str(label),
                                "x0": bbox[0],
                                "y0": bbox[1],
                                "x1": bbox[2],
                                "y1": bbox[3],
                                "score": score,
                            }
                        )
            if rows:
                yield pd.DataFrame(rows)

    return tiles.select("conv_id", "turn_idx", "det_id", "png").mapInPandas(
        run, schema=STRUCTURE_TATR_SCHEMA
    )
