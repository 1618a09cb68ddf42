"""Edge cases in the curation operators found by review: empty documents
must not grow phantom lines (sequence(0, -1) is descending, not empty),
and a BPE round with an exhausted pair supply must be a no-op rather
than annihilate the word-type table through an empty cross join."""

import pytest
from pyspark.sql import functions as F

from gmft_spark.operators import curation


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_empty_doc_has_zero_lines(spark):
    df = spark.createDataFrame(
        [("a b c a b c",), ("",), ("   ",)], "text string"
    )
    sizes = [
        r["n"]
        for r in df.select(
            F.size(curation._lines_array()).alias("n")
        ).collect()
    ]
    assert sizes == [2, 0, 0]


def test_empty_doc_absent_from_line_dedup(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b c a b c", "en", "src00", 11),
            (2, "", "en", "src01", 0),
            (3, "   ", "en", "src02", 3),
        ],
    )
    within = curation.dedup_lines_within_doc(spark, sf).collect()
    assert [r["doc_id"] for r in within] == [1]
    assert within[0]["n_lines"] == 2 and within[0]["n_kept"] == 1
    corpus = curation.dedup_lines_corpus(spark, sf).collect()
    assert [r["doc_id"] for r in corpus] == [1]


def test_bpe_exhausted_pairs_is_noop(spark, tmp_path):
    # every word type is a single symbol -> zero pairs from round 1 on
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, "a b c", "en", "src00", 5), (2, "b c a", "en", "src01", 5)],
    )
    merges = curation.bpe_train_merges(spark, sf).collect()
    assert merges == []  # no learnable pair -> no merge rows, no crash
    enc = curation.bpe_encode_corpus(spark, sf).orderBy("doc_id").collect()
    # the word table must survive the empty rounds: both docs encoded,
    # every 1-char token stays 1 BPE symbol
    assert [r["doc_id"] for r in enc] == [1, 2]
    assert all(r["n_bpe_tokens"] == r["n_words"] == 3 for r in enc)


def test_bpe_run_is_memoized_per_app_and_corpus(spark, tmp_path):
    """One gate run must train the tokenizer once for the whole BPE query
    family: repeated _bpe_run calls with the same (app, sf_dir, doc_mod)
    return the SAME checkpointed frames; a different doc_mod retrains."""
    sf = _write_docs(
        spark, tmp_path, [(1, "ab ab ba", "en", "src00", 8)]
    )
    w1, m1 = curation._bpe_run(spark, sf, doc_mod=1)
    w2, m2 = curation._bpe_run(spark, sf, doc_mod=1)
    assert w1 is w2 and m1 is m2
    w3, _ = curation._bpe_run(spark, sf, doc_mod=2)
    assert w3 is not w1


def test_bpe_fertility_aggregates_the_encode_stats(spark, tmp_path):
    """Fertility per source must equal the per-doc encode stats rolled up
    by source (same trained table, same token stream)."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "aa aa bb", "en", "srcA", 8),
            (2, "aa bb bb cc", "en", "srcA", 11),
            (3, "zz zz zz", "en", "srcB", 8),
        ],
    )
    fert = {
        r["source"]: r
        for r in curation.bpe_fertility_by_source(spark, sf).collect()
    }
    enc = curation.bpe_encode_corpus(spark, sf).collect()
    docsrc = {1: "srcA", 2: "srcA", 3: "srcB"}
    agg = {}
    for r in enc:
        a = agg.setdefault(docsrc[r["doc_id"]], [0, 0, 0])
        a[0] += r["n_words"]
        a[1] += r["n_chars"]
        a[2] += r["n_bpe_tokens"]
    for src, (nw, nc, nb) in agg.items():
        f = fert[src]
        assert (f["n_words"], f["n_chars"], f["n_bpe_tokens"]) == (nw, nc, nb)
        assert f["fertility"] == round(nb / nw, 6)
        assert f["chars_per_token"] == round(nc / nb, 6)
    # the 2-char words compress: srcA fertility strictly under symbol rate
    assert fert["srcA"]["fertility"] < 2.0


def test_curation_funnel_stages_are_monotone_and_live(spark):
    """On the gate corpus every funnel stage must both keep and drop
    documents (branch-census rule), and the cumulative counts must be
    monotone non-increasing with a strict drop at every stage overall."""
    import pyspark.sql.functions as F

    tot = (
        curation.curation_funnel(spark, "/root/testdata/sf0.001")
        .agg(
            *[
                F.sum(c).alias(c)
                for c in [
                    "n_docs",
                    "n_pass_length",
                    "n_pass_lang",
                    "n_pass_quality",
                    "n_kept",
                ]
            ]
        )
        .collect()[0]
    )
    seq = [
        tot["n_docs"],
        tot["n_pass_length"],
        tot["n_pass_lang"],
        tot["n_pass_quality"],
        tot["n_kept"],
    ]
    assert all(a > b for a, b in zip(seq, seq[1:])), seq
    assert seq[-1] > 0


def test_curation_funnel_null_signals_fail_stages(spark, tmp_path):
    """A zero-token document is absent from the token-derived signal
    frames; its NULL signals must fail every stage (not crash, not
    pass-through) while still counting in n_docs."""
    rows = [(1, "", "en", "a", 0), (2, " ".join(["the"] * 30), "en", "a", 120)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    out = curation.curation_funnel(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # doc 1 (empty) counts in n_docs but passes nothing; doc 2 passes
    # length + lang ('the' is an en stopword) — quality/repetition
    # depend on the composite thresholds, so only assert the bounds
    assert r["n_docs"] == 2
    assert r["n_pass_length"] == 1
    assert r["n_pass_lang"] == 1


def test_curriculum_order_is_phased_sharded_and_deterministic(spark, tmp_path):
    """Phases follow the fixed quality thresholds, positions are
    contiguous 1..n per (phase, shard), the order is a pure function of
    doc_id (stable across partitionings), and zero-token docs drop."""
    rows = [
        # high quality: 120 tokens, half stopwords -> t1=500000 +
        # t2=150000 alone clears the phase-0 threshold
        (i, ("the fox " * 60).strip(), "en", "w", 479)
        for i in range(8)
    ] + [
        # low quality: one long opaque token -> phase 2
        (100 + i, "x" * 40, "en", "w", 40)
        for i in range(4)
    ] + [(999, "   ", "en", "w", 3)]  # zero tokens: excluded
    sf = _write_docs(spark, tmp_path, rows)
    out = curation.curriculum_order(spark, sf).collect()
    assert all(r["doc_id"] != 999 for r in out)
    by_phase = {}
    for r in out:
        by_phase.setdefault(r["phase"], []).append(r)
    assert set(by_phase) <= {0, 1, 2}
    assert all(r["quality"] >= curation.CURRICULUM_HI_FP / 1e6 for r in by_phase.get(0, []))
    assert all(r["quality"] < curation.CURRICULUM_LO_FP / 1e6 for r in by_phase.get(2, []))
    assert {r["doc_id"] for r in by_phase.get(0, [])} == set(range(8))
    assert {r["doc_id"] for r in by_phase.get(2, [])} == {100, 101, 102, 103}
    for (p, s) in {(r["phase"], r["shard"]) for r in out}:
        pos = sorted(r["pos"] for r in out if (r["phase"], r["shard"]) == (p, s))
        assert pos == list(range(1, len(pos) + 1))
    # determinism across partitionings: same rows from a repartitioned scan
    again = (
        curation.curriculum_order(spark, sf)
        .repartition(7)
        .orderBy("phase", "shard", "pos")
        .collect()
    )
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
