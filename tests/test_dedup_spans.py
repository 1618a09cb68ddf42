"""Known-answer and scale-shape tests for the ExactSubstr-style
duplicate-span operator (operators/dedup.py:duplicate_spans_frame).

Reference behaviour modelled: dedup at the span level rather than the
document level — find maximal runs of >= SPAN_L consecutive tokens shared
verbatim between two documents (the "ExactSubstr" notion from the
deduplication literature), via sliding-window hashing + the
diagonal-islands merge instead of a suffix array.
"""

from pyspark.sql import functions as F

from gmft_spark.operators.dedup import (
    SPAN_L,
    SPAN_MAX_BUCKET,
    duplicate_spans_frame,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_single_maximal_span(spark):
    # doc1/doc2 share the 6-token run "a b c d e f": two overlapping
    # 5-token windows on one diagonal -> merged into ONE span of 6.
    out = duplicate_spans_frame(
        _docs(
            spark,
            [
                (1, "a b c d e f g h"),
                (2, "x a b c d e f y"),
                (3, "p q r s t"),
            ],
        )
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.n_spans == 1
    assert r.max_span_tokens == 6
    assert r.dup_tokens == 6


def test_two_disjoint_spans_not_merged(spark):
    # Shared runs "a b c d e" and "v w x y z" sit on different diagonals
    # and are separated by non-matching tokens -> two spans of 5 each.
    out = duplicate_spans_frame(
        _docs(
            spark,
            [
                (1, "a b c d e m n o v w x y z"),
                (2, "a b c d e q r s v w x y z"),
            ],
        )
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_spans == 2
    assert r.max_span_tokens == 5
    assert r.dup_tokens == 10


def test_below_threshold_overlap_invisible(spark):
    # A shared run of SPAN_L-1 tokens produces no window match at all.
    shared = " ".join(chr(ord("a") + i) for i in range(SPAN_L - 1))
    out = duplicate_spans_frame(
        _docs(spark, [(1, shared + " p q r s t"), (2, shared + " u v w x y")])
    ).collect()
    assert out == []


def test_short_docs_do_not_crash(spark):
    out = duplicate_spans_frame(
        _docs(spark, [(1, "a b"), (2, "a b"), (3, "")])
    ).collect()
    assert out == []


def test_hot_window_bucket_cap(spark):
    # The same SPAN_L-token boilerplate in > SPAN_MAX_BUCKET docs: the
    # bucket is dropped (document-frequency cap), so no pairs emerge.
    boiler = " ".join(f"t{i}" for i in range(SPAN_L))
    rows = [(i, f"u{i} " + boiler) for i in range(SPAN_MAX_BUCKET + 1)]
    assert duplicate_spans_frame(_docs(spark, rows)).collect() == []
    # At exactly the cap the bucket survives and all pairs report the span.
    rows = [(i, f"u{i} " + boiler) for i in range(SPAN_MAX_BUCKET)]
    out = duplicate_spans_frame(_docs(spark, rows)).collect()
    n = SPAN_MAX_BUCKET
    assert len(out) == n * (n - 1) // 2
    assert all(r.max_span_tokens == SPAN_L for r in out)


def test_intra_doc_repeats_ignored(spark):
    # The same window twice WITHIN one doc is not a duplicate pair.
    out = duplicate_spans_frame(
        _docs(spark, [(1, "a b c d e a b c d e"), (2, "z y x w v")])
    ).collect()
    assert out == []


def test_span_plan_shuffle_budget(spark):
    """Only the window-hash groupBy shuffles corpus-sized data; the
    distinct / window / span aggregations / sort all run over candidate
    pairs (a vanishing fraction after the bucket filter). Pin the total
    so a refactor can't silently reintroduce a wide pair stage."""
    docs = _docs(spark, [(1, "a b c d e f"), (2, "a b c d e g")])
    plan = (
        duplicate_spans_frame(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 6
    assert "CartesianProduct" not in plan
