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


_REF_TABLES = "/root/reference/data/test/references/tatr_tables.json"
_PNG_BASE = 4  # stub lookup key: image width = _PNG_BASE + item index


def _recorded_tables():
    import json

    with open(_REF_TABLES) as f:
        return json.load(f)


def _index_png(i: int) -> bytes:
    """A real (repo-codec) PNG whose WIDTH encodes the item index — the
    only channel a model stub can read back, since ``infer`` receives
    decoded images and nothing else."""
    import numpy as np

    from gmft_spark.kernel.raster import encode_png

    return encode_png(np.full((1, _PNG_BASE + i), 255, dtype=np.uint8))


def test_structure_postprocess_replays_reference_recorded_predictions(spark):
    """VERDICT r3 item #3: the postprocess half of the real-TATR seam
    (decode → batch chunking → infer → label mapping → row assembly) runs
    torch-free against the reference's own 40 recorded prediction sets
    (data/test/references/tatr_tables.json, the structure model's
    fctn_results): a stub model replays each table's recorded
    scores/labels/boxes, and the assembled rows must equal the goldens
    exactly — every pred in order, labels mapped through the reference's
    id2label vocabulary, float-exact boxes and scores."""
    recorded = _recorded_tables()
    keys = sorted(recorded)
    tiles = spark.createDataFrame(
        [(k, i, 0, _index_png(i)) for i, k in enumerate(keys)],
        "conv_id string, turn_idx int, det_id int, png binary",
    ).repartition(3)
    dets_by_idx = {
        i: [
            (tuple(b), float(s), int(l))
            for b, s, l in zip(
                recorded[k]["fctn_results"]["boxes"],
                recorded[k]["fctn_results"]["scores"],
                recorded[k]["fctn_results"]["labels"],
            )
        ]
        for i, k in enumerate(keys)
    }

    def stub_fn(cfg):
        expected_threshold = cfg.structure_threshold

        class Stub:
            def infer(self, images, threshold):
                assert threshold == expected_threshold == 0.3
                assert len(images) <= cfg.batch_size  # chunking honored
                return [dets_by_idx[im.shape[1] - _PNG_BASE] for im in images]

        return Stub()

    out = DT.recognize_structure_tatr(
        tiles, config=DT.TATRInferenceConfig(batch_size=3), model_fn=stub_fn
    ).toPandas()
    assert len(out) == sum(len(v) for v in dets_by_idx.values())
    for i, k in enumerate(keys):
        got = out[out["conv_id"] == k].sort_values("pred_id")
        want = dets_by_idx[i]
        assert list(got["pred_id"]) == list(range(len(want)))
        assert list(got["label"]) == [
            DT.STRUCTURE_LABELS[l] for (_b, _s, l) in want
        ]
        assert list(got["score"]) == [s for (_b, s, _l) in want]
        assert [tuple(b) for b in got[["x0", "y0", "x1", "y1"]].values] == [
            b for (b, _s, _l) in want
        ]


def test_detect_postprocess_replays_recorded_pages_and_contains_errors(spark):
    """Detection-side assembly against the same goldens, grouped to page
    grain (each recorded table's top-level bbox/confidence/label is one
    detection on its page), plus the corrupt-payload path: an undecodable
    PNG yields exactly one contained error row (det_id -1, label -1) and
    never poisons its batch."""
    recorded = _recorded_tables()
    pages: dict[tuple, list] = {}
    for k in sorted(recorded):
        r = recorded[k]
        pages.setdefault((r["filename"], r["page_no"]), []).append(
            (tuple(r["bbox"]), float(r["confidence_score"]), int(r["label"]))
        )
    page_keys = sorted(pages)
    rows = [
        (f"{fn}#p{pno}", i, _index_png(i))
        for i, (fn, pno) in enumerate(page_keys)
    ]
    rows.append(("corrupt", len(page_keys), b"\x89PNG not really"))
    rendered = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, png binary"
    ).repartition(2)
    dets_by_idx = {i: pages[pk] for i, pk in enumerate(page_keys)}

    def stub_fn(cfg):
        class Stub:
            def infer(self, images, threshold):
                assert threshold == cfg.detector_threshold == 0.9
                return [dets_by_idx[im.shape[1] - _PNG_BASE] for im in images]

        return Stub()

    out = DT.detect_tables_tatr(rendered, model_fn=stub_fn).toPandas()
    err = out[out["conv_id"] == "corrupt"]
    assert len(err) == 1
    assert err.iloc[0]["det_id"] == -1 and err.iloc[0]["label"] == -1
    good = out[out["conv_id"] != "corrupt"]
    assert len(good) == sum(len(v) for v in dets_by_idx.values())
    for i, pk in enumerate(page_keys):
        fn, pno = pk
        got = good[good["conv_id"] == f"{fn}#p{pno}"].sort_values("det_id")
        want = dets_by_idx[i]
        assert list(got["det_id"]) == list(range(len(want)))
        assert list(got["score"]) == [s for (_b, s, _l) in want]
        assert list(got["label"]) == [l for (_b, _s, l) in want]
        assert [tuple(b) for b in got[["x0", "y0", "x1", "y1"]].values] == [
            b for (b, _s, _l) in want
        ]


def test_injected_model_skips_torch_gate_only_when_present(spark):
    """model_fn=None keeps the plan-time torch gate (no silent fallthrough
    to a missing runtime)."""
    if DT.torch_available():  # pragma: no cover - sandbox has no torch
        pytest.skip("torch present: gate is live upstream")
    df = spark.createDataFrame(
        [("c", 0, 0, _index_png(0))],
        "conv_id string, turn_idx int, det_id int, png binary",
    )
    with pytest.raises(RuntimeError, match="torch"):
        DT.recognize_structure_tatr(df)


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
