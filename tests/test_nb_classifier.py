"""Naive Bayes language classifier: the trained-classifier curation
filter. The test recomputes the whole fixed-point model by hand (same
floor(ln·1e6 + 0.5) recipe) and asserts the operator's integer scores and
argmax predictions exactly."""

import math

from gmft_spark.operators.textstats import nb_lang_classify


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _fp(x: float) -> int:
    return math.floor(x * 1000000.0 + 0.5)


def _nb_reference(docs):
    """docs: list of (doc_id, tokens, lang). Returns {doc_id: (pred,
    score_fp)} via the literal NB definition."""
    langs = sorted({lg for _, _, lg in docs})
    vocab = sorted({t for _, tk, _ in docs for t in tk})
    c = {}
    tot = dict.fromkeys(langs, 0)
    nd = dict.fromkeys(langs, 0)
    for _, tk, lg in docs:
        nd[lg] += 1
        for t in tk:
            c[(lg, t)] = c.get((lg, t), 0) + 1
            tot[lg] += 1
    n = len(docs)
    out = {}
    for doc_id, tk, _ in docs:
        best = None
        for lg in langs:
            s = sum(_fp(math.log(c.get((lg, t), 0) + 1)) for t in tk)
            s -= len(tk) * _fp(math.log(tot[lg] + len(vocab)))
            s += _fp(math.log(nd[lg]) - math.log(n))
            # argmax, ties to the lexicographically-smaller language
            if best is None or (s, [-ord(x) for x in lg]) > (
                best[1],
                [-ord(x) for x in best[0]],
            ):
                best = (lg, s)
        out[doc_id] = best
    return out


def test_nb_matches_hand_computed_fixed_point_model(spark, tmp_path):
    rows = [
        (1, "x x y", "aa", "s", 5),
        (2, "y z z", "bb", "s", 5),
        (3, "x z", "aa", "s", 3),
        (4, "z z", "bb", "s", 3),
        (5, "x y z", "cc", "s", 5),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["pred_lang"], r["score_fp"], r["lang"], r["correct"])
        for r in nb_lang_classify(spark, sf).collect()
    }
    docs = [(i, text.split(), lg) for i, text, lg, _, _ in rows]
    want = _nb_reference(docs)
    assert set(got) == set(want)
    for doc_id, (pred, score) in want.items():
        assert got[doc_id][0] == pred, doc_id
        assert got[doc_id][1] == score, doc_id
        assert got[doc_id][3] == int(got[doc_id][2] == pred)
    # the scenario exercises both outcome branches
    assert {g[3] for g in got.values()} == {0, 1}


def test_nb_zero_token_doc_falls_back_to_prior(spark, tmp_path):
    """A document with no tokens scores prior-only: the majority-prior
    language wins (ties to lexicographic order)."""
    rows = [
        (1, "", "bb", "s", 0),
        (2, "x", "aa", "s", 1),
        (3, "y", "aa", "s", 1),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in nb_lang_classify(spark, sf).collect()}
    assert got[1]["pred_lang"] == "aa"  # prior 2/3 beats 1/3
    assert got[1]["score_fp"] == _fp(math.log(2) - math.log(3))
    assert got[1]["correct"] == 0
