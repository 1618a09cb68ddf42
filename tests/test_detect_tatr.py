"""The torch-gated real-TATR seam (operators/detect_tatr.py).

This sandbox has no torch, so what IS testable here is exactly what must
hold for an adopter: importing the module never touches torch, the
config plumbing resolves the reference's checkpoint paths/revisions/
thresholds, and the inference entrypoints fail at PLAN time with an
actionable message instead of shipping a doomed job. The torch-bearing
branch runs only where torch exists (guarded by the skip below)."""

import pytest

from gmft_spark.operators import detect_tatr as DT


def test_module_imports_without_torch():
    # importing the module (already done above) must not require torch;
    # availability is a runtime probe
    assert DT.torch_available() in (True, False)


def test_config_defaults_mirror_reference():
    cfg = DT.TATRInferenceConfig()
    # reference impl/tatr/config.py:19-25 and :55-70
    assert cfg.detector_path == "microsoft/table-transformer-detection"
    assert cfg.structure_path == "microsoft/table-transformer-structure-recognition"
    assert cfg.detector_threshold == 0.9
    assert cfg.structure_threshold == 0.3
    assert cfg.revision == "no_timm"
    assert DT.TATRInferenceConfig(no_timm=False).revision is None


def test_device_resolution_without_torch():
    assert DT.resolve_device("cpu") == "cpu"
    assert DT.resolve_device("cuda:1") == "cuda:1"
    if not DT.torch_available():
        assert DT.resolve_device("auto") == "cpu"


@pytest.mark.skipif(DT.torch_available(), reason="torch present: seam is live")
def test_entrypoints_fail_at_plan_time_with_actionable_message(spark):
    from gmft_spark.operators.render import render_pages
    from gmft_spark.sources.transcripts import transcripts_from_documents

    rendered = render_pages(
        transcripts_from_documents(spark, "/root/testdata/sf0.001", sample_mod=100)
    )
    with pytest.raises(RuntimeError, match="torch.*transformers|transformers.*torch"):
        DT.detect_tables_tatr(rendered)
    with pytest.raises(RuntimeError, match="detect_tables"):
        # the message must point at the deterministic fallback
        DT.recognize_structure_tatr(rendered)


def test_model_loaders_resolve_paths_and_device_worker_side(monkeypatch):
    """Both fixes in one pin: (a) the structure recognizer's image
    processor loads from image_processor_path (the detection checkpoint,
    reference formatters/tatr.py:252), never the structure checkpoint;
    (b) device resolution happens inside the worker-side loader, so
    'auto' is re-resolved per executor rather than frozen at plan time
    on the driver."""
    calls = []
    monkeypatch.setattr(
        DT._HFTableTransformer,
        "get",
        classmethod(lambda cls, *a: calls.append(a) or "model"),
    )
    cfg = DT.TATRInferenceConfig(torch_device="auto")
    assert DT._detector_model(cfg) == "model"
    assert DT._structure_model(cfg) == "model"
    (det_path, det_proc, det_rev, det_dev), (st_path, st_proc, st_rev, st_dev) = calls
    assert det_path == cfg.detector_path
    assert st_path == cfg.structure_path
    # processor path: detection checkpoint on BOTH paths
    assert det_proc == st_proc == cfg.image_processor_path
    assert det_rev == st_rev == cfg.revision
    # 'auto' resolved by the loader itself (cpu here: sandbox has no cuda)
    if not DT.torch_available():
        assert det_dev == st_dev == "cpu"


def test_structure_labels_match_reference_vocabulary():
    assert DT.STRUCTURE_LABELS[0] == "table"
    assert "table spanning cell" in DT.STRUCTURE_LABELS
    assert "table projected row header" in DT.STRUCTURE_LABELS
    assert "table column header" in DT.STRUCTURE_LABELS


@pytest.mark.skipif(not DT.torch_available(), reason="needs torch")
def test_real_tatr_detects_on_rendered_page(spark):  # pragma: no cover
    from gmft_spark.operators.render import render_pages
    from gmft_spark.sources.transcripts import transcripts_from_documents

    rendered = render_pages(
        transcripts_from_documents(spark, "/root/testdata/sf0.001", sample_mod=250)
    )
    out = DT.detect_tables_tatr(rendered)
    assert out.schema == DT.DETECT_SCHEMA
    assert out.count() >= 0
