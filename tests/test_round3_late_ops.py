"""Semantics of the late-round-3 curation operators: tool-turn folding,
CCNet perplexity terciles, hard-negative mining, and k-means cluster
purity. Oracle parity at sf0.001 is covered by test_oracle_parity (all
four are registered with SQL twins); these tests pin the SEMANTICS on
hand-built corpora and structural invariants on the real test data."""

from gmft_spark.operators.convstats import sft_fold_tool_turns
from gmft_spark.operators.similarity import (
    embedding_cluster_purity,
    hard_negative_mining,
)
from gmft_spark.operators.textstats import ccnet_perplexity_buckets

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()



def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_fold_merges_tool_turns_into_preceding_anchor(spark, tmp_path):
    """doc_id % 3 drives roles: conv-a-1 is assistant(t0), tool(t1),
    user(t2), assistant(t3), tool(t4) — each tool turn folds into the
    turn before it, tool rows vanish, indices re-pack densely."""
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, "a", "A"),  # 1 % 3 = 1 -> assistant, turn 0
            (17, "a", "T1"),  # 2 -> tool, turn 1
            (33, "a", "U"),  # 0 -> user, turn 2
            (49, "a", "B"),  # 1 -> assistant, turn 3
            (65, "a", "T2"),  # 2 -> tool, turn 4
        ],
    )
    out = sft_fold_tool_turns(spark, d).collect()
    got = [(r["turn_idx"], r["role"], r["n_folds"], r["text"]) for r in out]
    assert got == [
        (0, "assistant", 1, "A\n[tool] T1"),
        (1, "user", 0, "U"),
        (2, "assistant", 1, "B\n[tool] T2"),
    ]


def test_fold_keeps_orphan_leading_tool_turns(spark, tmp_path):
    """A conversation OPENING with a tool turn has no anchor: the row
    survives as its own (role 'tool', text tool-prefixed) — folding is
    lossless, never a silent drop."""
    d = _write_docs(
        spark,
        tmp_path,
        [
            (2, "b", "T0"),  # 2 % 3 = 2 -> tool, turn 0 (no anchor)
            (18, "b", "U"),  # 0 -> user, turn 1
            (34, "b", "A"),  # 1 -> assistant, turn 2
            (50, "b", "T1"),  # 2 -> tool, turn 3
        ],
    )
    out = sft_fold_tool_turns(spark, d).collect()
    got = [(r["turn_idx"], r["role"], r["n_folds"], r["text"]) for r in out]
    assert got == [
        (0, "tool", 0, "[tool] T0"),
        (1, "user", 0, "U"),
        (2, "assistant", 1, "A\n[tool] T1"),
    ]
    # turn conservation: every input turn lands in exactly one output text
    assert sum(r["n_folds"] for r in out) + len(out) == 4


def test_dpo_pairs_anchor_by_role_not_position(spark, tmp_path):
    """Hand-built conversation (source 'a', doc_id % 16 == 1): assistant
    A1 (doc 49), FAILING tool (161: %3=2 tool, %7=0), assistant A2 (193),
    SUCCEEDING tool (209: %7=6). The pair must take rejected from the
    assistant BEFORE the failure and chosen from the assistant before the
    recovery — and with no user turn anywhere, prompt is NULL, never a
    positional neighbor."""
    from gmft_spark.operators.convstats import dpo_pairs_from_retries

    d = _write_docs(
        spark,
        tmp_path,
        [(49, "a", "A1"), (161, "a", "TF"), (193, "a", "A2"), (209, "a", "TS")],
    )
    out = dpo_pairs_from_retries(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["conv_id"] == "conv-a-1"
    assert (r["failed_turn_idx"], r["recovered_turn_idx"]) == (10, 13)
    assert r["prompt"] is None
    assert (r["rejected"], r["chosen"]) == ("A1", "A2")


def test_dpo_pairs_drop_unrecovered_and_unattributable_failures(spark, tmp_path):
    """A failure with no later successful tool call yields no pair; a
    failure with no prior assistant turn yields no pair (nothing to
    reject)."""
    from gmft_spark.operators.convstats import dpo_pairs_from_retries

    d = _write_docs(
        spark,
        tmp_path,
        [
            # conv-b-14: failing tool OPENS the conversation (doc 14),
            # later success (doc 62: %3=2, %7=6) but no assistant before
            # the failure -> unattributable
            (14, "b", "TF"),
            (62, "b", "TS"),
            # conv-c-1: assistant then failing tool, NO later success
            (49, "c", "A1"),
            (161, "c", "TF"),
        ],
    )
    assert dpo_pairs_from_retries(spark, d).count() == 0


def test_ccnet_buckets_are_per_source_terciles(spark):
    rows = ccnet_perplexity_buckets(spark, SF).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert len(by_source) > 1
    for source, members in by_source.items():
        sizes = {b: 0 for b in (1, 2, 3)}
        for r in members:
            sizes[r["bucket"]] += 1
            assert r["bucket_label"] == {1: "head", 2: "middle", 3: "tail"}[
                r["bucket"]
            ]
        # NTILE: earlier buckets take the ceil-sized groups
        assert sizes[1] >= sizes[2] >= sizes[3] >= sizes[1] - 1
        # the rank is on nll ascending: no head doc scores above a tail doc
        head_max = max(r["nll"] for r in members if r["bucket"] == 1)
        tail_min = min(r["nll"] for r in members if r["bucket"] == 3)
        assert head_max <= tail_min


def test_hard_negatives_cross_labels_and_maximize_cosine(spark):
    rows = hard_negative_mining(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["label"] != r["neg_label"]
        assert -1.000001 <= r["cosine"] <= 1.000001
        assert r["vec_id"] not in seen  # rank-1 per anchor
        seen.add(r["vec_id"])
    # spot-check argmax against brute force for the smallest anchors:
    # the banded candidate set is a subset of all cross-label vectors, so
    # the mined cosine can never EXCEED the brute-force best
    emb = {
        r["vec_id"]: (r["label"], r["embedding"])
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb)

    for r in rows[:10]:
        lab, v = emb[r["vec_id"]]
        best = max(
            cos(v, w)
            for vid, (lw, w) in emb.items()
            if lw != lab and vid != r["vec_id"]
        )
        assert r["cosine"] <= round(best, 6) + 1e-9


def test_cluster_purity_partitions_the_corpus(spark):
    rows = embedding_cluster_purity(spark, SF).collect()
    n_total = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r["n_vecs"] for r in rows) == n_total
    for r in rows:
        assert 1 <= r["top_n"] <= r["n_vecs"]
        assert r["purity"] == round(r["top_n"] / r["n_vecs"], 6)


def test_hard_negative_plan_is_banded_equi_join(spark):
    """Mirror of test_knn_join_is_banded_bucket_join: candidates come only
    from per-band bucket equi-joins — no pair enumeration."""
    from gmft_spark.operators.similarity import KNN_BANDS

    plan = _plan(hard_negative_mining(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    n_equi = (
        plan.count("SortMergeJoin")
        + plan.count("ShuffledHashJoin")
        + plan.count("BroadcastHashJoin")
    )
    assert n_equi >= KNN_BANDS


def test_fold_plan_is_single_conv_exchange(spark):
    """The running-max window, the anchor fold, and the re-index window
    all key on conv_id: one shuffle, not three."""
    plan = _plan(sft_fold_tool_turns(spark, SF))
    # exchanges: one hashpartitioning(conv_id...) for window+agg chain,
    # plus the final presentation sort
    assert plan.count("Exchange") <= 2
