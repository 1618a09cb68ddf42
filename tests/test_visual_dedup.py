"""Visual near-dup detection (render.page_visual_signatures +
dedup_pages_visual): the banded Hamming join must be EXACT (pigeonhole:
d < 8 differing bits leave at least one of the 8 one-byte bands equal)
and agree with a brute-force kernel computation."""

import itertools

from pyspark.sql import functions as F

from gmft_spark.kernel.raster import block_ahash, render_words
from gmft_spark.kernel.synth import synth_scene
from gmft_spark.operators.render import (
    dedup_pages_visual,
    page_visual_signatures,
)
from gmft_spark.sources.transcripts import transcripts_from_documents

SF = "/root/testdata/sf0.001"


def _brute_pairs(t_rows, max_hamming):
    sigs = []
    for conv_id, turn_idx in t_rows:
        sc = synth_scene(conv_id, turn_idx)
        arr = render_words(sc.word_boxes, sc.page_width, sc.page_height)
        _s, bits = block_ahash(arr)
        sigs.append(((conv_id, turn_idx), bits.flatten()))
    out = set()
    for (ka, ba), (kb, bb) in itertools.combinations(sorted(sigs), 2):
        d = int((ba != bb).sum())
        if d <= max_hamming:
            out.add((ka, kb, d))
    return out


def test_banded_join_is_exact_vs_brute_force(spark):
    t = transcripts_from_documents(spark, SF, sample_mod=16)
    keys = [(r["conv_id"], r["turn_idx"]) for r in t.select("conv_id", "turn_idx").collect()]
    got = {
        ((r["conv_a"], r["turn_a"]), (r["conv_b"], r["turn_b"]), r["hamming"])
        for r in dedup_pages_visual(page_visual_signatures(t)).collect()
    }
    assert got == _brute_pairs(keys, 2)
    assert got, "fixture subsample must contain visual near-dups"


def test_banding_exact_up_to_seven_bits(spark):
    """Synthetic signatures: pairs at hamming 7 must be found (>= one
    clean band); max_hamming >= 8 is a loud error, never silent recall
    loss (a one-flip-per-band pair would share no band bucket)."""
    rows = []
    # base page: all-zero signature
    rows.append(("p", 0, 0, 0))
    # 7 bits flipped in 7 different bands -> hamming 7, band 7 clean
    lo7 = sum(1 << (8 * b) for b in range(4))
    hi7 = sum(1 << (8 * b) for b in range(3))
    rows.append(("p", 1, lo7, hi7))
    # 8 bits flipped, one per band -> no clean band, invisible to banding
    lo8, hi8 = (
        sum(1 << (8 * b) for b in range(4)),
        sum(1 << (8 * b) for b in range(4)),
    )
    rows.append(("p", 2, lo8, hi8))
    sigs = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, sig_lo long, sig_hi long"
    )
    got = {
        (r["turn_a"], r["turn_b"], r["hamming"])
        for r in dedup_pages_visual(sigs, max_hamming=7).collect()
    }
    assert (0, 1, 7) in got  # hamming-7 pair found via its clean band
    assert (1, 2, 1) in got  # pages 1,2 differ in the single band-7 bit
    assert (0, 2, 8) not in got  # above threshold

    import pytest

    with pytest.raises(ValueError, match="max_hamming"):
        dedup_pages_visual(sigs, max_hamming=8)


def test_no_pair_enumeration_in_plan(spark):
    t = transcripts_from_documents(spark, SF, sample_mod=16)
    plan = (
        dedup_pages_visual(page_visual_signatures(t))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_signatures_match_ahash_parity_bits(spark):
    """sig_lo/sig_hi must pack exactly the bits page_ahash emits."""
    from gmft_spark.operators.render import page_ahash

    t = transcripts_from_documents(spark, SF, sample_mod=50)
    sig = {
        (r["conv_id"], r["turn_idx"]): (r["sig_lo"], r["sig_hi"])
        for r in page_visual_signatures(t).collect()
    }
    bits = {}
    for r in page_ahash(t).collect():
        bits.setdefault((r["conv_id"], r["turn_idx"]), {})[
            r["block_y"] * 8 + r["block_x"]
        ] = r["bit"]
    for k, tiles in bits.items():
        lo = sum(tiles[i] << i for i in range(32))
        hi = sum(tiles[i] << (i - 32) for i in range(32, 64))
        assert sig[k] == (lo, hi)


def test_pack_matches_direct_signatures(spark):
    """pack_visual_signatures (JVM bit-pack of an ahash frame — the
    gate's shared-kernel-pass path) must equal page_visual_signatures
    (direct rasterization) row for row."""
    from gmft_spark.operators.render import page_ahash, pack_visual_signatures

    t = transcripts_from_documents(spark, SF, sample_mod=16)
    direct = {
        (r["conv_id"], r["turn_idx"]): (r["sig_lo"], r["sig_hi"])
        for r in page_visual_signatures(t).collect()
    }
    packed = {
        (r["conv_id"], r["turn_idx"]): (r["sig_lo"], r["sig_hi"])
        for r in pack_visual_signatures(page_ahash(t)).collect()
    }
    assert packed == direct
