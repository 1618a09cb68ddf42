"""DSIR importance weighting: the test recomputes the hashed-bucket
log-ratio model literally (hashlib + math, same fixed-point recipe) and
asserts the operator's integer scores and top-k selection exactly."""

import hashlib
import math

from gmft_spark.operators.curation import (
    DSIR_BUCKETS,
    DSIR_KEEP_FRAC,
    DSIR_TARGET_LANG,
    dsir_importance,
)


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[30:32], 16) % DSIR_BUCKETS


def _fp(x: float) -> int:
    return math.floor(x * 1000000.0 + 0.5)


def _dsir_reference(docs):
    """docs: list of (doc_id, tokens, lang) → {doc_id: (n, total, avg)}"""
    raw, tgt = {}, {}
    tr = tt = 0
    for _, tk, lg in docs:
        for t in tk:
            b = _bucket(t)
            raw[b] = raw.get(b, 0) + 1
            tr += 1
            if lg == DSIR_TARGET_LANG:
                tgt[b] = tgt.get(b, 0) + 1
                tt += 1
    lr = {
        b: _fp(math.log(tgt.get(b, 0) + 1) - math.log(tt + DSIR_BUCKETS))
        - _fp(math.log(raw[b] + 1) - math.log(tr + DSIR_BUCKETS))
        for b in raw
    }
    out = {}
    for doc_id, tk, _ in docs:
        if not tk:
            continue
        total = sum(lr[_bucket(t)] for t in tk)
        out[doc_id] = (
            len(tk),
            total,
            math.floor(total * 1000.0 / len(tk)),
        )
    return out


def test_dsir_matches_hand_computed_log_ratios(spark, tmp_path):
    rows = [
        (1, "x x y", "en", "s", 5),
        (2, "y z z w", "de", "s", 7),
        (3, "x z", "en", "s", 3),
        (4, "w w q", "fr", "s", 5),
        (5, "x y z", "de", "s", 5),
        (6, "", "en", "s", 0),  # zero tokens: no per-doc row
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["logratio_fp"],
            r["avg_mlr"],
            r["selected"],
        )
        for r in dsir_importance(spark, sf).collect()
    }
    docs = [(i, text.split(), lg) for i, text, lg, _, _ in rows]
    want = _dsir_reference(docs)
    assert set(got) == set(want)  # doc 6 absent
    for doc_id, (n, total, avg) in want.items():
        assert got[doc_id][:3] == (n, total, avg), doc_id
    # selection: top ceil(0.2 * 5) = 1 doc by (avg_mlr desc, doc_id asc)
    ranked = sorted(want, key=lambda d: (-want[d][2], d))
    k = math.ceil(DSIR_KEEP_FRAC * len(want))
    assert {d for d in got if got[d][3] == 1} == set(ranked[:k])


def test_dsir_target_docs_score_higher_on_the_real_corpus(spark):
    """On sf0.001 the mean per-token log-ratio of target-language docs
    must exceed the non-target mean (the importance weight points at the
    target distribution) and selection must keep exactly ceil(20%)."""
    from pyspark.sql import functions as F

    out = dsir_importance(spark, "/root/testdata/sf0.001")
    m = (
        out.join(
            spark.read.parquet(
                "/root/testdata/sf0.001/documents.parquet"
            ).select("doc_id", "lang"),
            "doc_id",
        )
        .groupBy(F.col("lang") == DSIR_TARGET_LANG)
        .agg(F.avg("avg_mlr").alias("m"), F.count("*").alias("n"))
        .collect()
    )
    by = {r[0]: r for r in m}
    assert by[True]["m"] > by[False]["m"]
    total = by[True]["n"] + by[False]["n"]
    assert out.filter("selected = 1").count() == math.ceil(
        DSIR_KEEP_FRAC * total
    )
