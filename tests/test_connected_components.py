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


def _run_star(spark, n_vertices, pairs, max_iters=25):
    from gmft_spark.operators.similarity import connected_components_star

    vertices = spark.createDataFrame(
        [(i,) for i in range(n_vertices)], "vec_id long"
    )
    sym = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(sym or [(0, 0)], "vec_id long, nb long")
    if not pairs:
        edges = edges.limit(0)
    out = connected_components_star(vertices, edges, max_iters=max_iters)
    return {r["vec_id"]: r["canonical_id"] for r in out.collect()}


def _truth(n_vertices, pairs):
    # tiny union-find ground truth
    parent = list(range(n_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = component min: path-compress through min-merging above
    return {i: find(i) for i in range(n_vertices)}


def test_star_matches_truth_on_random_graphs(spark):
    import random

    rng = random.Random(42)
    for trial in range(4):
        n = 40
        pairs = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(5, 60))
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        assert _run_star(spark, n, pairs) == _truth(n, pairs), trial


def test_star_basic_shapes(spark):
    assert _run_star(spark, 5, [(0, 1), (1, 2), (2, 3)]) == {
        0: 0, 1: 0, 2: 0, 3: 0, 4: 4}
    assert _run_star(spark, 4, []) == {0: 0, 1: 1, 2: 2, 3: 3}


def test_star_converges_on_long_chain_where_propagation_cannot(spark):
    """The scale rationale: a 200-vertex chain needs 199 min-propagation
    rounds (more than connected_components_min's 50-round budget) but
    O(log) star rounds — star must fully collapse it within 25."""
    n = 200
    pairs = [(i, i + 1) for i in range(n - 1)]
    labels = _run_star(spark, n, pairs)
    assert set(labels.values()) == {0}
    # and the propagation variant, capped at its default budget, provably
    # does NOT finish this shape — the reason star is the deep-chain path
    capped = _run(spark, n, pairs)
    assert set(capped.values()) != {0}
