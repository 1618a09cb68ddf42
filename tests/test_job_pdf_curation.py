"""PDF-corpus curation job (VERDICT r3 item #6): visual + textual
near-dup over the SAME conversation-PDF payload bytes, one
lineage-tracked pipeline with resume."""

import os

from pyspark.sql import functions as F

from gmft_spark.sources.pdfgen import conversation_pdf, scenes_to_pdf
from gmft_spark.sources.transcripts import synthesize_transcripts
from gmft_spark.kernel.synth import synth_scene


def _write_input(spark, path, n_convs=5, turns=8):
    synthesize_transcripts(
        spark, n_convs=n_convs, turns_per_conv=turns
    ).select("conv_id", "turn_idx").write.parquet(path)


def _make_aliasing_pdf_fn():
    """conv-1 ships conv-0's document verbatim (exact dup: both
    modalities fire); conv-2 shares only its FIRST page with conv-0
    (1/8 pages < the 50% visual frac, shingle J < 0.1: kept).

    Built as a CLOSURE so cloudpickle ships it by value — a module-level
    test function would pickle by reference and fail to import on Spark
    workers."""

    def aliasing_pdf_fn(conv_id, turns):
        if conv_id == "conv-1":
            return conversation_pdf("conv-0", turns)
        if conv_id == "conv-2":
            scenes = [synth_scene("conv-0", turns[0])] + [
                synth_scene(conv_id, t) for t in turns[1:]
            ]
            return scenes_to_pdf(scenes)
        return conversation_pdf(conv_id, turns)

    return aliasing_pdf_fn


def test_pdf_curation_drops_dups_by_both_modalities(spark, tmp_path, capsys):
    import jobs.run_pdf_curation as J

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    _write_input(spark, src)
    assert (
        J.main(
            ["--input", src, "--output", out, "--buckets", "8",
             "--run-id", "p1"],
            pdf_fn=_make_aliasing_pdf_fn(),
        )
        == 0
    )
    msg = capsys.readouterr().out
    assert "visual dup pairs" in msg and "textual dup pairs" in msg
    curated = spark.read.parquet(os.path.join(out, "results"))
    kept = {
        r["conv_id"]
        for r in curated.select("conv_id").distinct().collect()
    }
    # the exact copy drops, its canonical stays; the 1-of-8-pages overlap
    # is below BOTH modality thresholds and survives
    assert "conv-1" not in kept
    assert "conv-0" in kept and "conv-2" in kept
    assert len(kept) == 4  # 5 conversations - 1 dropped dup
    # the curated rows carry the text extracted from the REAL bytes
    row = curated.filter(
        (F.col("conv_id") == "conv-0") & (F.col("turn_idx") == 0)
    ).collect()[0]
    assert row["n_words"] > 0 and row["text"]
    # conv-0 page 0 text == conv-2 page 0 text (same scene, same bytes)
    twin = curated.filter(
        (F.col("conv_id") == "conv-2") & (F.col("turn_idx") == 0)
    ).collect()[0]
    assert twin["text"] == row["text"]


def test_pdf_curation_resume_skips_completed_buckets(spark, tmp_path, capsys):
    import jobs.run_pdf_curation as J

    src = str(tmp_path / "in_r")
    out = str(tmp_path / "out_r")
    _write_input(spark, src, n_convs=4, turns=4)
    args = ["--input", src, "--output", out, "--buckets", "4"]
    assert J.main(args + ["--run-id", "r1"], pdf_fn=_make_aliasing_pdf_fn()) == 0
    n1 = spark.read.parquet(os.path.join(out, "results")).count()
    capsys.readouterr()
    # complete run → resume is a clean no-op (no duplicate rows appended)
    assert (
        J.main(args + ["--resume", "--run-id", "r2"], pdf_fn=_make_aliasing_pdf_fn())
        == 0
    )
    assert "nothing to do: all buckets completed" in capsys.readouterr().out
    assert spark.read.parquet(os.path.join(out, "results")).count() == n1
