"""Character-entropy quality signal: closed-form cases + exclusions."""

import math

from gmft_spark.operators.textstats import char_entropy


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


def test_char_entropy_closed_forms(spark, tmp_path):
    rows = [
        (1, "aaaa", "en", "s", 4),  # degenerate: H = 0
        (2, "ab", "en", "s", 2),  # uniform 2: H = ln 2
        (3, "abcd", "en", "s", 4),  # uniform 4: H = ln 4
        (4, "aab", "en", "s", 3),  # mixed: ln 3 - 2·ln 2 / 3
        (5, "", "en", "s", 0),  # no chars: excluded
        (6, None, "en", "s", 0),  # NULL text: excluded
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["n_chars_counted"], r["n_distinct_chars"], r["entropy"])
        for r in char_entropy(spark, sf).collect()
    }
    assert set(got) == {1, 2, 3, 4}

    def h(counts):
        n = sum(counts)
        s = sum(c * _fp(math.log(c)) for c in counts)
        return round(math.log(n) - s / (1000000.0 * n), 6)

    assert got[1] == (4, 1, h([4]))
    assert got[1][2] == round(math.log(4) - _fp(math.log(4)) / 1e6, 6)
    assert got[2] == (2, 2, h([1, 1]))
    assert abs(got[2][2] - math.log(2)) < 1e-5
    assert got[3] == (4, 4, h([1, 1, 1, 1]))
    assert abs(got[3][2] - math.log(4)) < 1e-5
    assert got[4] == (3, 2, h([2, 1]))
    # low-entropy repetition scores strictly under the mixed doc
    assert got[1][2] < got[4][2] < got[3][2]
