"""Cross-formatter consistency: on the same scenes, the TATR band path,
the DITR divider path, and the histogram path must produce identical CSVs
whenever every word was assignable (the only legitimate divergence is a
missing last-row band prediction, which TATR cannot gap-fill — reference
behavior — while true dividers recover it)."""

from gmft_spark.config import ExtractConfig
from gmft_spark.kernel.ditr import ditr_extract
from gmft_spark.kernel.geometry import select_table_words
from gmft_spark.kernel.histogram import histogram_extract
from gmft_spark.kernel.synth import synth_scene
from gmft_spark.kernel.table import extract_table
from gmft_spark.operators.extract import extract_tables_ditr
from gmft_spark.sources.transcripts import synthesize_transcripts


def test_tatr_vs_ditr_csv_equality():
    cfg = ExtractConfig()
    match = diverged = 0
    for i in range(120):
        scene = synth_scene("xfmt", i)
        for tbl in scene.tables:
            t = extract_table(
                tbl.scores, tbl.labels, tbl.boxes,
                scene.word_boxes, scene.word_texts, tbl.bbox, cfg,
                angle=tbl.angle,
            )
            if t.status != "ok" or "skipped text" in t.outliers:
                diverged += 1
                continue
            ds, dl, db = tbl.divider_predictions()
            d = ditr_extract(
                ds, dl, db, scene.word_boxes, scene.word_texts, tbl.bbox,
                cfg, angle=tbl.angle,
            )
            assert d.csv == t.csv, (i, tbl.table_id)
            match += 1
    assert match >= 100
    assert diverged < match / 5


def test_tatr_vs_histogram_csv_equality():
    cfg = ExtractConfig()
    match = 0
    for i in range(60):
        scene = synth_scene("xfmt-h", i)
        for tbl in scene.tables:
            t = extract_table(
                tbl.scores, tbl.labels, tbl.boxes,
                scene.word_boxes, scene.word_texts, tbl.bbox, cfg,
                angle=tbl.angle,
            )
            if t.status != "ok" or "skipped text" in t.outliers:
                continue
            local, kept = select_table_words(
                scene.word_boxes, scene.word_texts, tbl.bbox, angle=tbl.angle
            )
            w = tbl.bbox[2] - tbl.bbox[0]
            h = tbl.bbox[3] - tbl.bbox[1]
            if tbl.angle in (90, 270):
                w, h = h, w
            hres = histogram_extract(local, kept, w, h)
            # histogram columns come from gaps; sparse header cells can
            # merge columns — only require equality when shapes agree
            if hres.n_cols == t.n_cols:
                assert hres.csv == t.csv, (i, tbl.table_id)
                match += 1
    assert match >= 40


def test_ditr_pipeline_spark(spark):
    t = synthesize_transcripts(spark, n_convs=4, turns_per_conv=3)
    rows = extract_tables_ditr(t).collect()
    assert len(rows) >= 12
    ok = [r for r in rows if r["status"] == "ok"]
    assert len(ok) >= 10
    for r in ok[:5]:
        assert r["csv"].startswith("col0")
