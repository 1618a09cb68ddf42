"""Scale caps as code (VERDICT r3 item #4): the two documented-not-applied
hot-spot bounds are now real, config-gated, and output-safe at their
defaults.

1. conv_near_dup's hot-shingle df cap — boilerplate shingles shared by
   more conversations than CONV_NEAR_DUP_MAX_DF leave the inverted index
   (broadcast anti-join) but never the Jaccard denominators, so the pair
   set stays a SUBSET of the exact answer with exact J values on every
   surviving pair.
2. extract_tables_from_conversation_pdfs' page-range split — a
   conversation longer than MAX_PAGES_PER_TASK pages is sliced into
   contiguous turn ranges, each decoded+extracted in its own task; page
   scenes are per-turn independent so output is invariant at ANY cap.
"""

import pytest
from pyspark.sql import functions as F

from gmft_spark.operators.convstats import (
    CONV_NEAR_DUP_MAX_DF,
    NEAR_DUP_THRESHOLD,
    conv_near_dup_frame,
)
from gmft_spark.operators.pdf_extract import (
    MAX_PAGES_PER_TASK,
    _split_turn_ranges,
    extract_tables_from_conversation_pdfs,
)


def _pairs(df):
    return {
        (r["conv_a"], r["conv_b"]): r["jaccard"]
        for r in df.collect()
    }


@pytest.fixture
def boilerplate_corpus(spark):
    """Every conversation opens with the same system preamble (one hot
    shingle family); convs a/b additionally share enough rare content to
    be true near-dups; conv z shares ONLY the boilerplate with anyone."""
    boiler = "you are a helpful assistant ."
    rows = []
    for cid, body in [
        ("a", "alpha beta gamma delta epsilon zeta eta theta"),
        ("b", "alpha beta gamma delta epsilon zeta eta iota"),
        ("z", "completely unrelated content about sailing ships"),
        ("w", "another distinct conversation concerning baking bread"),
    ]:
        rows.append((cid, 0, boiler))
        rows.append((cid, 1, body))
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")


def test_df_cap_drops_only_hot_shingles_and_keeps_exact_jaccard(
    spark, boilerplate_corpus
):
    exact = _pairs(conv_near_dup_frame(boilerplate_corpus, max_shingle_df=None))
    capped = _pairs(conv_near_dup_frame(boilerplate_corpus, max_shingle_df=3))
    # conservative: capped pairs are a subset of the exact pairs
    assert set(capped) <= set(exact)
    # the genuine near-dup pair survives the cap — its certifying shingles
    # are rare — but its J drops (boilerplate intersections no longer
    # counted while denominators stay full): one-sided estimate, J' <= J
    assert ("a", "b") in capped
    assert capped[("a", "b")] <= exact[("a", "b")]
    assert capped[("a", "b")] >= NEAR_DUP_THRESHOLD
    # boilerplate-only pairs cannot be certified by the capped index
    for pair in capped:
        assert "z" not in pair and "w" not in pair


def test_df_cap_is_inert_below_threshold(spark, boilerplate_corpus):
    """At the default cap the gate corpus (64 conversations) can never
    reach the df bound, so capped == exact — the property the DuckDB twin
    relies on."""
    assert CONV_NEAR_DUP_MAX_DF >= 1000
    exact = _pairs(conv_near_dup_frame(boilerplate_corpus, max_shingle_df=None))
    dflt = _pairs(conv_near_dup_frame(boilerplate_corpus))
    assert dflt == exact


def test_df_cap_filter_is_broadcast_anti_join(spark, boilerplate_corpus):
    plan = (
        conv_near_dup_frame(boilerplate_corpus, max_shingle_df=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_split_turn_ranges_slices_contiguously(spark):
    convs = spark.createDataFrame(
        [("big", list(range(50))), ("small", [0, 1, 2])],
        "conv_id string, turns array<int>",
    )
    out = (
        _split_turn_ranges(convs, 8)
        .groupBy("conv_id")
        .agg(F.sort_array(F.collect_list("turns")).alias("chunks"))
        .collect()
    )
    got = {r["conv_id"]: r["chunks"] for r in out}
    assert len(got["big"]) == 7  # ceil(50/8)
    assert max(len(c) for c in got["big"]) == 8
    flat = sorted(t for c in got["big"] for t in c)
    assert flat == list(range(50))
    # disjoint contiguous ranges
    assert sum(len(c) for c in got["big"]) == 50
    assert got["small"] == [[0, 1, 2]]


def test_page_range_split_bounds_hot_conversation_invariantly(spark):
    """A 40-page conversation extracts IDENTICALLY with the split at 8
    pages/task (5 sub-documents) and with the split disabled — and the
    split frame proves the per-task page bound."""
    t = spark.createDataFrame(
        [("conv-hot", i) for i in range(40)] + [("conv-cold", 0)],
        "conv_id string, turn_idx int",
    )
    unsplit = extract_tables_from_conversation_pdfs(
        t, max_pages_per_task=None
    ).orderBy("conv_id", "turn_idx", "table_id")
    split = extract_tables_from_conversation_pdfs(
        t, max_pages_per_task=8
    ).orderBy("conv_id", "turn_idx", "table_id")
    assert unsplit.collect() == split.collect()


def test_corrupt_document_error_rows_survive_the_split(spark):
    """The corrupt-payload path emits one error row per TURN under the
    split exactly as it does whole (each slice fails independently)."""
    t = spark.createDataFrame(
        [("conv-bad", i) for i in range(20)],
        "conv_id string, turn_idx int",
    )

    def bad_pdf(conv_id, turns):
        return b"%PDF-1.7 garbage"

    out = extract_tables_from_conversation_pdfs(
        t, pdf_fn=bad_pdf, max_pages_per_task=6
    ).toPandas()
    assert len(out) == 20
    assert set(out["status"]) == {"error"}
    assert sorted(out["turn_idx"]) == list(range(20))


def test_default_page_cap_never_triggers_at_gate_scale():
    assert MAX_PAGES_PER_TASK >= 256
