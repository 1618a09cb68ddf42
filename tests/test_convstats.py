"""SFT pair assembly semantics on a hand-built conversation: suffix
budget keeps the newest prior turns that fit, drops older ones whole,
and a context-less assistant turn gets an empty prompt. Plus
conversation near-dup semantics: shingles span turn boundaries, and
zero-overlap conversations never materialize a pair."""

import pytest

from gmft_spark.operators.convstats import (
    SFT_BUDGET,
    conv_near_dup,
    sft_pair_assembly,
)


@pytest.fixture()
def sf_dir(spark, tmp_path):
    """One conversation (source='a', doc_id % 16 == 1) with four turns:
    t0 assistant (100 tok), t1 tool (60), t2 user (50), t3 assistant.
    At t3 the suffix costs are t2:50, t1:110, t0:210 — so a budget of
    120 keeps t1+t2 and drops t0."""
    assert SFT_BUDGET == 120  # the fixture's token counts encode this
    rows = [
        (1, "a", " ".join(["w"] * 100)),
        (17, "a", " ".join(["x"] * 60)),
        (33, "a", " ".join(["y"] * 50)),
        (49, "a", " ".join(["z"] * 5)),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_sft_pairs_apply_the_suffix_budget(spark, sf_dir):
    out = {r["turn_idx"]: r for r in sft_pair_assembly(spark, sf_dir).collect()}
    assert sorted(out) == [0, 3]  # the two assistant turns

    first = out[0]  # no prior turns: empty prompt
    assert (first["n_context_turns"], first["prompt_tokens"]) == (0, 0)
    assert first["prompt"] == ""
    assert first["response"] == " ".join(["w"] * 100)

    last = out[3]  # t0 (100 tok) doesn't fit; t1+t2 do
    assert (last["n_context_turns"], last["prompt_tokens"]) == (2, 110)
    assert last["prompt"] == (
        "tool: " + " ".join(["x"] * 60) + "\nuser: " + " ".join(["y"] * 50)
    )
    assert last["response"] == " ".join(["z"] * 5)


@pytest.fixture()
def neardup_sf_dir(spark, tmp_path):
    """Four single-source conversations with controlled 3-shingle overlap:
    A = two turns 'p q r s t' / 'u v w x y' (so its shingle set includes
    the CROSS-TURN boundary shingles 's t u', 't u v'); B = the same ten
    tokens in ONE turn (identical shingle set iff boundaries count);
    D shares A's first five tokens (J = 3/13); C is disjoint."""
    rows = [
        (1, "a", "p q r s t"),
        (17, "a", "u v w x y"),
        (2, "b", "p q r s t u v w x y"),
        (3, "c", "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
        (4, "d", "p q r s t d1 d2 d3 d4 d5"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_conv_near_dup_spans_turn_boundaries(spark, neardup_sf_dir):
    pairs = {
        (r["conv_a"], r["conv_b"]): r["jaccard"]
        for r in conv_near_dup(spark, neardup_sf_dir).collect()
    }
    # A's two turns concatenate to exactly B's one turn: J = 1.0 is only
    # reachable if shingles cross the turn boundary.
    assert pairs[("conv-a-1", "conv-b-2")] == 1.0
    assert pairs[("conv-a-1", "conv-d-4")] == round(3 / 13, 6)
    assert pairs[("conv-b-2", "conv-d-4")] == round(3 / 13, 6)
    # the disjoint conversation shares no shingle — it never even
    # materializes a candidate pair, let alone a flagged one
    assert not any("conv-c-3" in p for p in pairs)
    assert len(pairs) == 3


def test_conv_near_dup_survives_null_text_turns(spark, tmp_path):
    """A NULL-text turn must contribute zero tokens, not poison the whole
    conversation: split(NULL)=NULL element makes F.flatten return NULL
    (size -1), which silently dropped conv-a from the shingle index while
    the DuckDB oracle's string_agg skipped the NULL and kept the pair."""
    rows = [
        (1, "a", "p q r s t"),
        (17, "a", None),
        (2, "b", "p q r s t u v w x y"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    pairs = {
        (r["conv_a"], r["conv_b"]): r["jaccard"]
        for r in conv_near_dup(spark, d).collect()
    }
    # conv-a keeps its 5-token turn: 3 shingles, all shared with conv-b's
    # 8 → J = 3/8. Before the coalesce fix this returned NO rows.
    assert pairs == {("conv-a-1", "conv-b-2"): round(3 / 8, 6)}


def test_turn_grounding_measures_tool_overlap(spark, tmp_path):
    """Grounding = share of the assistant turn's distinct 3-shingles
    present in the LATEST prior tool turn. Corpus layout (conv-a-2, role
    = doc_id % 3, turn = doc_id // 16): doc 2 tool 'p q r s t u', doc 18
    user, doc 34 assistant 'p q r s x y' (shingles pqr/qrs/rsx/sxy — 2 of
    4 grounded), doc 50 tool with NULL text (skipped by ignorenulls),
    doc 66 user, doc 82 assistant 'a b c d' (0 of 2 grounded, still
    against doc 2's text), doc 98 user, doc 114 assistant 'x y' (<3
    tokens: excluded)."""
    from gmft_spark.operators.convstats import turn_grounding

    rows = [
        (2, "a", "p q r s t u"),
        (18, "a", "u1"),
        (34, "a", "p q r s x y"),
        (50, "a", None),
        (66, "a", "u2"),
        (82, "a", "a b c d"),
        (98, "a", "u3"),
        (114, "a", "x y"),
        # conv-a-1: assistant with NO prior tool turn — excluded entirely
        (1, "a", "m n o p q"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    out = {
        (r["conv_id"], r["turn_idx"]): (
            r["n_shingles"], r["n_grounded"], r["grounding"]
        )
        for r in turn_grounding(spark, d).collect()
    }
    assert out == {
        ("conv-a-2", 2): (4, 2, 0.5),
        ("conv-a-2", 5): (2, 0, 0.0),
    }


def test_assistant_self_repetition_flags_verbatim_loops(spark, tmp_path):
    """conv-a-1 assistant turns (doc_id % 3 == 1, stride 48 inside the
    conversation): docs 1, 49, 97, 145. Doc 49 repeats doc 1 verbatim
    (J = 1.0), doc 97 shares a 4-token run with doc 49 ('q r s t' → 2 of
    its 3 shingles; union 3+3-2), doc 145 is disjoint (J = 0)."""
    from gmft_spark.operators.convstats import assistant_self_repetition

    rows = [
        (1, "a", "p q r s t"),
        (49, "a", "p q r s t"),
        (97, "a", "q r s t z"),
        (145, "a", "m n o"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    out = {
        r["turn_idx"]: (r["n_shared"], r["jaccard_prev"])
        for r in assistant_self_repetition(spark, d).collect()
    }
    assert out == {
        3: (3, 1.0),            # doc 49 vs doc 1: verbatim repeat
        6: (2, 0.5),            # doc 97 vs 49: qrs,rst shared; union 4
        9: (0, 0.0),            # doc 145 vs 97: disjoint
    }


def test_conv_render_spans_reconstruct_the_transcript(spark, tmp_path):
    """The offsets are the contract: slicing the conversation rendered as
    'role: text' lines joined by newline at [start_char, end_char) must
    reproduce each turn's own segment exactly, with loss_mask 1 on
    exactly the assistant turns. NULL-text turns vanish from both the
    rendering and the span table (the string_agg convention)."""
    from gmft_spark.operators.convstats import conv_render_spans

    rows = [
        (1, "a", "hello there"),   # conv-a-1 assistant
        (17, "a", None),           # tool with NULL text: skipped
        (33, "a", "ok"),           # user
        (49, "a", "resp two"),     # assistant
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    spans = conv_render_spans(spark, d).collect()
    rendered = "assistant: hello there\nuser: ok\nassistant: resp two"
    segs = {
        r["turn_idx"]: (
            rendered[r["start_char"]:r["end_char"]], r["loss_mask"]
        )
        for r in spans
    }
    assert segs == {
        0: ("assistant: hello there", 1),
        2: ("user: ok", 0),
        3: ("assistant: resp two", 1),
    }


def test_conv_split_is_leakage_safe_and_append_stable(spark):
    """Every turn of a conversation carries its conversation's split (the
    hash keys on conv_id alone), and adding conversations never moves
    existing ones. Runs on the real sf0.001 corpus so all three splits
    are populated."""
    from pyspark.sql import functions as F

    from gmft_spark.operators.convstats import conv_split_assignment
    from gmft_spark.operators.textstats import _KMV_SPACE, _md5_lower64
    from gmft_spark.sources.transcripts import transcripts_from_documents

    sf_dir = "/root/testdata/sf0.001"
    out = conv_split_assignment(spark, sf_dir).collect()
    assert {r["split"] for r in out} == {"train", "val", "test"}
    # per-turn inlined hash agrees with the per-conv assignment for every
    # turn — the leakage-safety property
    t = transcripts_from_documents(spark, sf_dir)
    frac = _md5_lower64(F.col("conv_id")) / F.lit(_KMV_SPACE)
    per_turn = t.select(
        "conv_id",
        F.when(frac < 0.8, "train")
        .when(frac < 0.9, "val")
        .otherwise("test")
        .alias("split"),
    ).distinct()
    assert per_turn.count() == len(out)  # one split per conversation
    byconv = {r["conv_id"]: r["split"] for r in out}
    assert all(byconv[r["conv_id"]] == r["split"] for r in per_turn.collect())
    # turn counts sum to the corpus size (no conversation dropped)
    assert sum(r["n_turns"] for r in out) == t.count()


def test_split_decontamination_counts_train_shingle_hits(spark, tmp_path):
    """Eval-conv contamination = share of its distinct 3-shingles present
    in ANY train conversation. Sources chosen by the same md5 fraction the
    operator inlines (verified in-test, not assumed): s0 → train,
    s13 → val, s38 → test, s54 → val. s13 copies the train text verbatim
    (contamination 1.0), s38 shares 2 of its 3 shingles, s54 is disjoint
    (0.0); the train conversation itself must not be emitted."""
    import hashlib

    from gmft_spark.operators.convstats import split_decontamination

    def frac(s):
        return (
            int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
            / 2**64
        )

    assert frac("conv-s0-1") < 0.8
    assert 0.8 <= frac("conv-s13-1") < 0.9
    assert frac("conv-s38-1") >= 0.9
    assert 0.8 <= frac("conv-s54-1") < 0.9
    rows = [
        (1, "s0", "p q r s t"),
        (17, "s13", "p q r s t"),
        (33, "s38", "p q r s z"),
        (49, "s54", "d1 d2 d3 d4 d5"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    out = {r["conv_id"]: r for r in split_decontamination(spark, d).collect()}
    assert set(out) == {"conv-s13-1", "conv-s38-1", "conv-s54-1"}
    e = out["conv-s13-1"]
    assert (e["split"], e["n_shingles"], e["n_contaminated"]) == ("val", 3, 3)
    assert e["contamination"] == 1.0
    e = out["conv-s38-1"]
    assert (e["split"], e["n_shingles"], e["n_contaminated"]) == ("test", 3, 2)
    assert e["contamination"] == round(2 / 3, 6)
    e = out["conv-s54-1"]
    assert (e["split"], e["n_shingles"], e["n_contaminated"]) == ("val", 3, 0)
    assert e["contamination"] == 0.0


def test_conversation_funnel_recomposes_its_signals(spark):
    """Funnel totals must equal a brute-force recomposition from the four
    constituent operators (lint, near-dup conv_b set, max self-repetition,
    split hash), and every cumulative stage must strictly drop on the real
    sf0.001 corpus (branch-census rule)."""
    import hashlib

    from pyspark.sql import functions as F

    from gmft_spark.operators.convstats import (
        REP_MAX_JACCARD,
        assistant_self_repetition,
        conv_near_dup,
        conversation_funnel,
        transcript_lint,
    )

    sf = "/root/testdata/sf0.001"
    tot = conversation_funnel(spark, sf).agg(
        *[
            F.sum(c).alias(c)
            for c in [
                "n_convs",
                "n_pass_lint",
                "n_pass_dedup",
                "n_pass_repetition",
                "n_kept",
            ]
        ]
    ).collect()[0]
    seq = [
        tot["n_convs"],
        tot["n_pass_lint"],
        tot["n_pass_dedup"],
        tot["n_pass_repetition"],
        tot["n_kept"],
    ]
    assert all(a > b for a, b in zip(seq, seq[1:])), seq
    assert seq[-1] > 0

    lint = {
        r["conv_id"]: r["n_ts_inversions"]
        for r in transcript_lint(spark, sf).collect()
    }
    dup_b = {r["conv_b"] for r in conv_near_dup(spark, sf).collect()}
    max_rep = {}
    for r in assistant_self_repetition(spark, sf).collect():
        k = r["conv_id"]
        max_rep[k] = max(max_rep.get(k, 0.0), r["jaccard_prev"])

    def is_train(cid):
        f = (
            int.from_bytes(hashlib.md5(cid.encode()).digest()[8:16], "little")
            / 2**64
        )
        return f < 0.8

    s1 = {c for c, inv in lint.items() if inv == 0}
    s2 = {c for c in s1 if c not in dup_b}
    s3 = {c for c in s2 if max_rep.get(c, 0.0) < REP_MAX_JACCARD}
    s4 = {c for c in s3 if is_train(c)}
    assert seq == [len(lint), len(s1), len(s2), len(s3), len(s4)]


@pytest.fixture()
def lint_sf_dir(spark, tmp_path):
    """One conversation with every lint violation class: the corpus stride
    (80 doc_ids = 80 s) is under LINT_JITTER_SPAN_US only on the real
    corpus — here doc_ids are ADJACENT (16 apart, 16 s stride), so every
    adjacent pair is a jitter coin-flip; the role/tool violations are
    structural (doc_id % 3 vs % 5 misalign by construction)."""
    # conv-a-1 (docs 1,17,33,49,65): roles asst/tool/user/asst/tool; only
    # doc 17's tool turn lacks a name (17%5!=0; 65%5==0 is the clean one).
    # conv-a-3 (doc 35): a single NAMED tool turn that OPENS the conv.
    # conv-a-8 (doc 40): assistant role (40%3=1) carrying a tool name.
    rows = [
        (1, "a", "t"),
        (17, "a", "t"),
        (33, "a", "t"),
        (49, "a", "t"),
        (65, "a", "t"),
        (35, "a", "t"),
        (40, "a", "t"),  # conv-a-8: %3=1 assistant, %5=0 → named tool
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_transcript_lint_flags_protocol_violations(spark, lint_sf_dir):
    from gmft_spark.operators.convstats import transcript_lint

    out = {r["conv_id"]: r for r in transcript_lint(spark, lint_sf_dir).collect()}
    a1 = out["conv-a-1"]
    assert a1["n_turns"] == 5
    # doc 17 is the only role='tool' turn with tool IS NULL (65 is named)
    assert a1["n_tool_missing_name"] == 1
    assert a1["n_tool_wrong_role"] == 0
    assert a1["first_role"] == "assistant"  # doc_id 1 % 3 == 1
    # conv-a-3 (doc 35): single tool turn, named (35 % 5 == 0), opens 'tool'
    a3 = out["conv-a-3"]
    assert (a3["n_tool_missing_name"], a3["first_role"]) == (0, "tool")
    # conv-a-8 (doc 40): assistant role carrying a tool name
    assert out["conv-a-8"]["n_tool_wrong_role"] == 1


def test_transcript_lint_inversion_branch_is_live(spark):
    """On the driver corpus the 120 s jitter must actually produce
    timestamp inversions across the 80 s slot stride (the named-draw
    branch census rule: every lint counter ≥ 1 on the gate input)."""
    import os

    import pyspark.sql.functions as F

    from gmft_spark.operators.convstats import transcript_lint

    sf = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("driver corpus not present")
    tot = transcript_lint(spark, sf).agg(
        F.sum("n_ts_inversions").alias("inv"),
        F.sum("n_tool_missing_name").alias("miss"),
        F.sum("n_tool_wrong_role").alias("wrong"),
    ).collect()[0]
    assert tot["inv"] > 0 and tot["miss"] > 0 and tot["wrong"] > 0


@pytest.fixture()
def profile_sf_dir(spark, tmp_path):
    """Two conversations over a hand-built full-width embedding table:
    conv-a-1 has labels {0,0,1}, conv-a-2 has a 1-vs-1 label TIE {2,1}
    (the smaller label must win the vote)."""
    from gmft_spark.operators.convstats import EMBED_DIM

    docs = [(1, "a"), (17, "a"), (33, "a"), (2, "a"), (18, "a")]
    spark.createDataFrame(docs, "doc_id long, source string").coalesce(
        1
    ).write.parquet(f"{tmp_path}/documents.parquet")
    # component j of vec i = i + j/8 (exactly representable in float32)
    emb = [
        (i, [float(i + j / 8.0) for j in range(EMBED_DIM)], lab)
        for i, lab in [(1, 0), (17, 0), (33, 1), (2, 2), (18, 1)]
    ]
    spark.createDataFrame(
        emb, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{tmp_path}/embeddings.parquet")
    return str(tmp_path)


def test_conv_embedding_profile_pools_and_votes(spark, profile_sf_dir):
    import hashlib

    from gmft_spark.operators.convstats import (
        EMBED_DIM,
        conv_embedding_profile,
    )

    out = {
        r["conv_id"]: r
        for r in conv_embedding_profile(spark, profile_sf_dir).collect()
    }
    a1, a2 = out["conv-a-1"], out["conv-a-2"]
    assert (a1["n_vecs"], a1["majority_label"]) == (3, 0)
    # label tie 1-vs-1 between labels 2 and 1: the smaller label wins
    assert (a2["n_vecs"], a2["majority_label"]) == (2, 1)
    # fingerprint = md5 of the comma-joined fixed-point component sums
    sums = [
        sum(int((i + j / 8.0) * 1e6 + 0.5) for i in (1, 17, 33))
        for j in range(EMBED_DIM)
    ]
    want = hashlib.md5(",".join(str(s) for s in sums).encode()).hexdigest()
    assert a1["pool_md5"] == want
