"""Transitive canonicalization (connected_components_min): chain-shaped
near-dup clusters must collapse to ONE canonical id — the failure mode of
one-hop min-neighbor canonicalization (a~b~c kept two canonicals)."""

from pyspark.sql import functions as F

from gmft_spark.operators.similarity import connected_components_min


def _run(spark, n_vertices, pairs):
    vertices = spark.createDataFrame(
        [(i,) for i in range(n_vertices)], "vec_id long"
    )
    sym = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(sym or [(0, 0)], "vec_id long, nb long")
    if not pairs:
        edges = edges.limit(0)
    out = connected_components_min(vertices, edges)
    return {r["vec_id"]: r["canonical_id"] for r in out.collect()}


def test_chain_collapses_to_single_canonical(spark):
    # 0-1, 1-2, 2-3: one-hop min would give canon(3)=2; closure gives 0
    labels = _run(spark, 5, [(0, 1), (1, 2), (2, 3)])
    assert labels == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4}


def test_two_components_and_isolates(spark):
    labels = _run(spark, 8, [(5, 6), (6, 7), (1, 3)])
    assert labels == {0: 0, 1: 1, 2: 2, 3: 1, 4: 4, 5: 5, 6: 5, 7: 5}


def test_long_path_converges(spark):
    # a 20-vertex path stresses the iteration count (diameter > 1 round)
    n = 20
    labels = _run(spark, n, [(i, i + 1) for i in range(n - 1)])
    assert set(labels.values()) == {0}


def test_no_edges_identity(spark):
    labels = _run(spark, 4, [])
    assert labels == {0: 0, 1: 1, 2: 2, 3: 3}
