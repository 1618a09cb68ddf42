"""K-means (Lloyd) trainer: differential test against a naive numpy
transcription of the same fixed-point semantics, plus the empty-cluster
fallback. The cross-engine value-hash is covered by test_oracle_parity
(`ann_kmeans_train` registered in similarity.QUERIES)."""

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from gmft_spark.operators.similarity import (
    KMEANS_ITERS,
    KMEANS_K,
    _FP,
    _kmeans_update,
    ann_kmeans_train,
)

SF_DIR = "/root/testdata/sf0.001"


def _naive_lloyd(vectors: np.ndarray, k: int, iters: int):
    """Deliberately loop-based re-statement of the operator's contract:
    fixed-point vectors, max-integer-dot assignment with low-cid ties,
    floor(sum/cnt + 0.5) means, empty clusters keep their centroid."""
    q = np.floor(vectors * _FP + 0.5).astype(np.int64)
    cents = q[:k].copy()
    assign = np.zeros(len(q), dtype=np.int64)
    for _ in range(iters):
        for i in range(len(q)):
            best, best_dot = 0, None
            for c in range(k):
                d = int(np.dot(q[i], cents[c]))
                if best_dot is None or d > best_dot:
                    best, best_dot = c, d
            assign[i] = best
        for c in range(k):
            members = q[assign == c]
            if len(members):
                s = members.sum(axis=0, dtype=np.int64)
                cents[c] = np.floor(
                    s.astype(np.float64) / len(members) + 0.5
                ).astype(np.int64)
    counts = np.bincount(assign, minlength=k)
    return cents, counts


def test_matches_naive_lloyd(spark):
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    order = np.argsort(np.asarray(emb.column("vec_id")))
    vectors = np.asarray(emb.column("embedding").to_pylist(), dtype=np.float64)[
        order
    ]
    exp_c, exp_n = _naive_lloyd(vectors, KMEANS_K, KMEANS_ITERS)

    rows = ann_kmeans_train(spark, SF_DIR).collect()
    got_c = np.zeros((KMEANS_K, vectors.shape[1]), dtype=np.int64)
    got_n = np.zeros(KMEANS_K, dtype=np.int64)
    for r in rows:
        got_c[r["centroid_id"], r["dim"]] = r["c_fixed"]
        got_n[r["centroid_id"]] = r["n_members"]
    assert np.array_equal(got_c, exp_c)
    assert np.array_equal(got_n, exp_n)


def test_empty_cluster_keeps_previous_centroid(spark):
    prev = spark.createDataFrame(
        [(0, [1, 2]), (1, [30, 40])], "cid int, c array<bigint>"
    )
    # every member lands in cluster 0 — cluster 1 must keep [30, 40]
    assigned = spark.createDataFrame(
        [(10, 0, [3, 5]), (11, 0, [5, 9])],
        "vec_id long, cid int, q array<bigint>",
    )
    got = {
        r["cid"]: r["c"] for r in _kmeans_update(assigned, prev).collect()
    }
    assert got[0] == [4, 7]  # per-dim rounded means
    assert got[1] == [30, 40]


def test_iterations_reduce_inertia(spark):
    """One sanity invariant beyond the transcription: training moved the
    centroids off their init (the first K raw vectors) for this data."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    init = {
        (int(r["vec_id"]), d): int(np.floor(v * _FP + 0.5))
        for r in e.filter(F.col("vec_id") < KMEANS_K).collect()
        for d, v in enumerate(r["embedding"])
    }
    trained = {
        (r["centroid_id"], r["dim"]): r["c_fixed"]
        for r in ann_kmeans_train(spark, SF_DIR).collect()
    }
    assert trained != init


def test_cluster_balanced_sample_keeps_min_k_per_cluster(spark):
    """Per cluster: rk is a 1..size permutation, kept == min(K, size),
    and the draw is a pure function of vec_id (two invocations agree)."""
    from pyspark.sql import functions as F

    from gmft_spark.operators.similarity import (
        CLUSTER_SAMPLE_K,
        cluster_balanced_sample,
    )

    sf = "/root/testdata/sf0.01"
    out = cluster_balanced_sample(spark, sf)
    stats = out.groupBy("cluster_id").agg(
        F.count("*").alias("n"),
        F.sum("kept").alias("k"),
        F.min("rk").alias("lo"),
        F.max("rk").alias("hi"),
        F.count_distinct("rk").alias("d"),
    )
    for r in stats.collect():
        assert (r["lo"], r["hi"], r["d"]) == (1, r["n"], r["n"])
        assert r["k"] == min(CLUSTER_SAMPLE_K, r["n"])
    rows = {r["vec_id"]: r["rk"] for r in out.collect()}
    again = {r["vec_id"]: r["rk"] for r in cluster_balanced_sample(spark, sf).collect()}
    assert rows == again
