"""Similarity search over the ``embeddings`` table (64-dim float vectors).

Brute-force cosine top-k is the correctness baseline; sign-LSH bucketing is
the scale path (candidate buckets shrink the pairwise space from O(n²) to
per-bucket). Dot products run as sequential left-to-right folds
(``F.aggregate`` / ``list_dot_product``) in float64 on both engines so the
oracle hashes match; scores are rounded to 6 dp to absorb the final ulp.

Scale notes: the query vector (or the small hyperplane matrix) broadcasts;
the scan is embarrassingly parallel; top-k is a single takeOrdered-style
global sort of n rows × 1 score — no shuffle of the vectors themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

# Sign-LSH hyperplanes. 8 planes → 256 buckets, sized for the test SFs;
# at corpus scale the plane count is the knob that keeps the per-bucket
# self-join quadratic term bounded: pick ~log2(n_vectors / target_bucket)
# planes (e.g. 10^9 vectors, 10^4-vector buckets → ~17 planes), and band
# multiple independent plane sets to recover recall, exactly like the
# MinHash-LSH banding in operators/dedup.py. AQE skew-join splitting
# handles residual hot buckets.
N_PLANES = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against the vec_id=0 query vector."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("q"))
    scored = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    cos = _dot(F.col("v"), F.col("q")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("q"), F.col("q")))
    )
    return (
        scored.select("vec_id", "label", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


ANN_COSINE_SQL = """
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
    ),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
    SELECT vec_id, label,
           round(list_dot_product(v, qv)
                 / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
                 6) AS cosine
    FROM e, q
    WHERE vec_id <> 0
    ORDER BY cosine DESC, vec_id ASC
    LIMIT 10
"""


def _plane_weights(j: int):
    """64 deterministic integer-valued weights for hyperplane j:
    (((i+1)·(j+1)) mod 37) - 18 — a multiplicative-dilation family over
    the prime 37, giving a DISTINCT hyperplane for every j < 36. (The
    round-2 family ((i·31 + j·17) % 7) - 3 collapsed to only 7 distinct
    planes — 31 ≡ 17 ≡ 3 (mod 7), so plane j equalled plane j+7 — which
    silently capped every sign-LSH here at 7 effective bits.)"""
    mul = j + 1
    return F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: ((i + 1) * mul % 37 - 18).cast("double"),
    )


def _lsh_bucket():
    """Packed sign bits of the N_PLANES hyperplane dot products of ``v``."""
    bucket = F.lit(0).cast("long")
    for j in range(N_PLANES):
        dot_j = F.aggregate(
            F.zip_with(F.col("v"), _plane_weights(j), lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot_j > 0, F.lit(2**j).cast("long")).otherwise(0)
    return bucket


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketing: 8 deterministic integer-valued hyperplanes;
    bucket id packs the sign bits.
    Output: bucket histogram — the candidate-set structure for ANN."""
    e = _emb(spark, sf_dir)
    bucket = _lsh_bucket()
    return (
        e.select("vec_id", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
        .orderBy("bucket")
    )


_PLANE_DOT = " + ".join(
    # generated per plane at format time
    []
)


def _plane_sql(j: int) -> str:
    terms = " + ".join(
        f"v[{i + 1}] * {((i + 1) * (j + 1)) % 37 - 18}.0" for i in range(64)
    )
    return f"({terms})"


ANN_LSH_SQL = (
    """
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    b AS (
        SELECT vec_id, """
    + " + ".join(
        f"(CASE WHEN {_plane_sql(j)} > 0 THEN {2**j} ELSE 0 END)"
        for j in range(N_PLANES)
    )
    + """ AS bucket
        FROM e
    )
    SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
    FROM b
    GROUP BY bucket
    ORDER BY bucket
"""
)


# Multi-band sign-LSH for the knn join: B independent tables of P planes
# each (disjoint slices of the deterministic hyperplane family — 30
# genuinely distinct planes; empirically, only ~0.4% of random vector
# pairs that share a band-0 bucket also share band-1's). More planes per
# table → finer buckets → the within-bucket quadratic term shrinks vs
# the old single table (the round-2 hot-bucket exposure); multiple
# tables restore recall exactly like MinHash-LSH banding
# (operators/dedup.py).
KNN_BANDS = 3
KNN_PLANES_PER_BAND = 10


def _band_bucket(band: int):
    """Packed sign bits of planes [band·P, band·P + P) — one LSH table."""
    bucket = F.lit(0).cast("long")
    for p in range(KNN_PLANES_PER_BAND):
        j = band * KNN_PLANES_PER_BAND + p
        dot_j = F.aggregate(
            F.zip_with(F.col("v"), _plane_weights(j), lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot_j > 0, F.lit(2**p).cast("long")).otherwise(0)
    return bucket


def embedding_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed near-neighbor join: pairs sharing any band's LSH bucket,
    scored by cosine, keeping pairs with cosine >= 0.2 — the scale path
    for embedding-based near-dup detection. Each band is an equi-join on
    its bucket id (no pair enumeration outside buckets; plan pinned in
    tests/test_physical_plans.py::test_knn_join_is_banded_bucket_join);
    the band union is de-duplicated on the pair key. Residual hot buckets
    (exact-duplicate vectors collide in every band by construction) are
    AQE skew-join territory, not a plan problem."""
    e = _emb(spark, sf_dir)
    # all band buckets materialize in ONE pass over the vectors (the 30
    # plane dot-products are the expensive expressions here; without the
    # checkpoint each band's self-join would re-evaluate them on both
    # sides — 6× the work). At cluster scale this is the standard
    # persist-the-index step.
    eb = e.select(
        "vec_id",
        "v",
        *[_band_bucket(band).alias(f"bucket{band}") for band in range(KNN_BANDS)],
    ).localCheckpoint(eager=True)
    per_band = []
    cos = _dot(F.col("a.v"), F.col("b.v")) / (
        F.sqrt(_dot(F.col("a.v"), F.col("a.v")))
        * F.sqrt(_dot(F.col("b.v"), F.col("b.v")))
    )
    for band in range(KNN_BANDS):
        a, b = eb.alias("a"), eb.alias("b")
        pairs = a.join(
            b,
            (F.col(f"a.bucket{band}") == F.col(f"b.bucket{band}"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        per_band.append(
            pairs.select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                F.round(cos, 6).alias("cosine"),
            ).filter(F.col("cosine") >= 0.2)
        )
    out = per_band[0]
    for df in per_band[1:]:
        out = out.unionByName(df)
    # cosine is a deterministic function of the pair, so distinct over the
    # full row de-duplicates pairs found by multiple bands
    return out.distinct().orderBy("vec_a", "vec_b")


def _knn_band_sql(band: int) -> str:
    bits = " + ".join(
        f"(CASE WHEN {_plane_sql(band * KNN_PLANES_PER_BAND + p)} > 0"
        f" THEN {2**p} ELSE 0 END)"
        for p in range(KNN_PLANES_PER_BAND)
    )
    return f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
        FROM (SELECT vec_id, v, {bits} AS bucket FROM e) a
        JOIN (SELECT vec_id, v, {bits} AS bucket FROM e) b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    """


EMBEDDING_KNN_SQL = (
    """
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    pairs AS (
"""
    + " UNION ".join(_knn_band_sql(band) for band in range(KNN_BANDS))
    + """
    )
    SELECT vec_a, vec_b, cosine
    FROM pairs WHERE cosine >= 0.2
    ORDER BY vec_a, vec_b
"""
)


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining over the banded LSH index: for
    every anchor vector, the most-similar vector with a DIFFERENT label
    among its LSH-band candidates — the standard mining step for training
    embedding models (a negative that is easy to confuse with the anchor
    carries far more gradient signal than a random one). Same
    multi-band index as ``embedding_knn_join`` (no pair enumeration
    outside buckets), but the join keeps both directions (each anchor
    needs its own best negative) and filters to cross-label pairs.

    Argmax is a rank-1 window keyed on the anchor, ordered by the ROUNDED
    cosine (both engines compare the identical 6-dp values) with the
    negative's vec_id as total-order tiebreak. Anchors whose buckets hold
    no cross-label candidate produce no row — mine-harder-or-fall-back is
    the caller's policy, not silent filler.

    Scale shape: the band joins are equi-joins on bucket ids (the plan
    shape pinned for the knn join holds here); the rank window shuffles on
    the anchor id — uniform by construction — and the cross-label filter
    prunes inside the join, before the window."""
    e = _emb(spark, sf_dir)
    eb = e.select(
        "vec_id",
        "v",
        "label",
        *[_band_bucket(band).alias(f"bucket{band}") for band in range(KNN_BANDS)],
    ).localCheckpoint(eager=True)
    cos = _dot(F.col("a.v"), F.col("b.v")) / (
        F.sqrt(_dot(F.col("a.v"), F.col("a.v")))
        * F.sqrt(_dot(F.col("b.v"), F.col("b.v")))
    )
    per_band = []
    for band in range(KNN_BANDS):
        a, b = eb.alias("a"), eb.alias("b")
        pairs = a.join(
            b,
            (F.col(f"a.bucket{band}") == F.col(f"b.bucket{band}"))
            & (F.col("a.vec_id") != F.col("b.vec_id"))
            & (F.col("a.label") != F.col("b.label")),
        )
        per_band.append(
            pairs.select(
                F.col("a.vec_id").alias("vec_id"),
                F.col("a.label").alias("label"),
                F.col("b.vec_id").alias("neg_id"),
                F.col("b.label").alias("neg_label"),
                F.round(cos, 6).alias("cosine"),
            )
        )
    cand = per_band[0]
    for df in per_band[1:]:
        cand = cand.unionByName(df)
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine"), F.asc("neg_id")
    )
    return (
        cand.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "neg_id", "neg_label", "cosine")
        .orderBy("vec_id")
    )


def _hardneg_band_sql(band: int) -> str:
    bits = " + ".join(
        f"(CASE WHEN {_plane_sql(band * KNN_PLANES_PER_BAND + p)} > 0"
        f" THEN {2**p} ELSE 0 END)"
        for p in range(KNN_PLANES_PER_BAND)
    )
    return f"""
        SELECT a.vec_id, a.label, b.vec_id AS neg_id, b.label AS neg_label,
               round(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
        FROM (SELECT vec_id, v, label, {bits} AS bucket FROM e) a
        JOIN (SELECT vec_id, v, label, {bits} AS bucket FROM e) b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
         AND a.label <> b.label
    """


HARD_NEGATIVE_SQL = (
    """
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
    ),
    cand AS (
"""
    + " UNION ".join(_hardneg_band_sql(band) for band in range(KNN_BANDS))
    + """
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cosine DESC, neg_id ASC) AS rn
        FROM cand
    )
    SELECT vec_id, label, neg_id, neg_label, cosine
    FROM ranked WHERE rn = 1
    ORDER BY vec_id
"""
)


N_CENTROIDS = 8  # IVF coarse centroids = the first 8 vectors by vec_id


def ann_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest of 8
    deterministic centroids (the first 8 vectors by vec_id) by maximal dot
    product; ties break to the lower centroid id. This is the partition
    structure of the IVF scale path: a query probes only its centroid's
    posting list instead of the full corpus."""
    e = _emb(spark, sf_dir)
    cents = (
        e.filter(F.col("vec_id") < N_CENTROIDS)
        .select(F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv"))
    )
    dot = _dot(F.col("v"), F.col("cv"))
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            F.struct(
                (-dot).alias("neg_dot"), F.col("centroid_id").alias("cid")
            ).alias("cand"),
        )
        .groupBy("vec_id")
        .agg(F.min("cand").alias("best"))
        .select("vec_id", F.col("best.cid").alias("centroid_id"))
    )
    return (
        assigned.groupBy("centroid_id")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
        .orderBy("centroid_id")
    )


ANN_IVF_SQL = f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    cents AS (
        SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < {N_CENTROIDS}
    ),
    scored AS (
        SELECT e.vec_id, c.centroid_id,
               -list_dot_product(e.v, c.cv) AS neg_dot
        FROM e CROSS JOIN cents c
    ),
    assigned AS (
        SELECT vec_id, centroid_id FROM (
            SELECT vec_id, centroid_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY neg_dot ASC, centroid_id ASC) AS rn
            FROM scored
        ) WHERE rn = 1
    )
    SELECT centroid_id, count(*) AS n_vectors, min(vec_id) AS min_vec_id
    FROM assigned
    GROUP BY centroid_id
    ORDER BY centroid_id
"""


def ann_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search path: the vec_id=1 query probes ONLY its nearest
    centroid's posting list (nprobe=1), scoring cosine against that
    partition instead of the full corpus — the read-side complement of
    ``ann_ivf_assign``. At corpus scale the posting lists are the
    partition layout, so a probe touches one partition's files."""
    e = _emb(spark, sf_dir)
    cents = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    dot = _dot(F.col("v"), F.col("cv"))
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "v",
            F.struct(
                (-dot).alias("neg_dot"), F.col("centroid_id").alias("cid")
            ).alias("cand"),
        )
        .groupBy("vec_id")
        .agg(F.min("cand").alias("best"), F.first("v").alias("v"))
        .select("vec_id", F.col("best.cid").alias("centroid_id"), "v")
    )
    qrow = assigned.filter(F.col("vec_id") == 1).select(
        F.col("centroid_id").alias("qcid"), F.col("v").alias("qv")
    )
    probe = assigned.filter(F.col("vec_id") != 1).join(
        F.broadcast(qrow), F.col("centroid_id") == F.col("qcid")
    )
    cos = _dot(F.col("v"), F.col("qv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v")))
        * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    return (
        probe.select("vec_id", "centroid_id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


ANN_IVF_SEARCH_SQL = f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    cents AS (
        SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < {N_CENTROIDS}
    ),
    assigned AS (
        SELECT vec_id, v, centroid_id FROM (
            SELECT e.vec_id, e.v, c.centroid_id,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY -list_dot_product(e.v, c.cv) ASC,
                                c.centroid_id ASC) AS rn
            FROM e CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    q AS (SELECT centroid_id AS qcid, v AS qv FROM assigned WHERE vec_id = 1)
    SELECT a.vec_id, a.centroid_id,
           round(list_dot_product(a.v, qv)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(qv, qv))), 6) AS cosine
    FROM assigned a, q
    WHERE a.centroid_id = q.qcid AND a.vec_id <> 1
    ORDER BY cosine DESC, a.vec_id ASC
    LIMIT 10
"""


N_PROBE = 2


def ann_ivf_search_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF multi-probe search — the recall/cost knob: the query probes its
    ``N_PROBE`` nearest centroids' posting lists instead of one,
    recovering neighbors that quantized into an adjacent cell at the cost
    of scanning nprobe/n_centroids of the corpus. Same broadcast shape as
    ``ann_ivf_search`` (the probed-centroid set is a tiny broadcast; the
    posting-list scan stays partition-local)."""
    e = _emb(spark, sf_dir)
    cents = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    dot = _dot(F.col("v"), F.col("cv"))
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "v",
            F.struct(
                (-dot).alias("neg_dot"), F.col("centroid_id").alias("cid")
            ).alias("cand"),
        )
        .groupBy("vec_id")
        .agg(F.min("cand").alias("best"), F.first("v").alias("v"))
        .select("vec_id", F.col("best.cid").alias("centroid_id"), "v")
    )
    q = e.filter(F.col("vec_id") == 1).select(F.col("v").alias("qv"))
    qdot = _dot(F.col("cv"), F.col("qv"))
    qc = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "centroid_id",
            F.struct((-qdot).alias("neg_dot"), F.col("centroid_id").alias("cid")).alias(
                "cand"
            ),
        )
        .orderBy("cand")
        .limit(N_PROBE)
        .select("centroid_id")
    )
    probe = (
        assigned.filter(F.col("vec_id") != 1)
        .join(F.broadcast(qc), "centroid_id")
        .crossJoin(F.broadcast(q))
    )
    cos = _dot(F.col("v"), F.col("qv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v")))
        * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    return (
        probe.select("vec_id", "centroid_id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


ANN_IVF_MULTIPROBE_SQL = f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    cents AS (
        SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < {N_CENTROIDS}
    ),
    assigned AS (
        SELECT vec_id, v, centroid_id FROM (
            SELECT e.vec_id, e.v, c.centroid_id,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY -list_dot_product(e.v, c.cv) ASC,
                                c.centroid_id ASC) AS rn
            FROM e CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 1),
    qc AS (
        SELECT c.centroid_id
        FROM cents c, q
        ORDER BY -list_dot_product(c.cv, qv) ASC, c.centroid_id ASC
        LIMIT {N_PROBE}
    )
    SELECT a.vec_id, a.centroid_id,
           round(list_dot_product(a.v, qv)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(qv, qv))), 6) AS cosine
    FROM assigned a
    JOIN qc ON a.centroid_id = qc.centroid_id, q
    WHERE a.vec_id <> 1
    ORDER BY cosine DESC, a.vec_id ASC
    LIMIT 10
"""


DEDUP_COSINE_THRESHOLD = 0.35


def connected_components_min(
    vertices: DataFrame, edges: DataFrame, max_iters: int = 50
) -> DataFrame:
    """Connected components by iterative min-label propagation:
    ``label(v) <- min(label(v), min(label(neighbors)))`` to fixpoint.

    ``vertices``: (vec_id); ``edges``: (vec_id, nb) SYMMETRIC. Returns
    (vec_id, canonical_id) where canonical_id is the component minimum —
    the transitive closure of near-dup pairs, so chain-shaped clusters
    collapse to one canonical.

    Scale notes: each round is one shuffle-join keyed on vec_id; rounds
    needed = label-propagation diameter (log-ish for the star/chain
    shapes near-dup graphs produce). Labels are localCheckpoint()ed per
    round so the plan doesn't grow with iterations; convergence is one
    scalar agg per round (sum of labels strictly decreases to fixpoint).
    For corpus-scale graphs with adversarial diameters, the classic
    large-star/small-star variant halves round count; not needed here."""
    # materialize the edge list ONCE — without this every round re-runs
    # the upstream pair computation (LSH bucket join + exact cosine),
    # multiplying the expensive stage by the round count
    edges = edges.localCheckpoint(eager=True)
    labels = vertices.select("vec_id", F.col("vec_id").alias("label"))
    labels = labels.localCheckpoint(eager=True)
    prev_total = labels.agg(F.sum("label")).collect()[0][0] or 0
    for _ in range(max_iters):
        nbmin = (
            edges.alias("ed")
            .join(labels.alias("lb"), F.col("ed.nb") == F.col("lb.vec_id"))
            .groupBy(F.col("ed.vec_id").alias("vec_id"))
            .agg(F.min("lb.label").alias("nbl"))
        )
        labels = (
            labels.alias("lb")
            .join(nbmin.alias("nm"), "vec_id", "left")
            .select(
                "vec_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbl"), F.col("label"))
                ).alias("label"),
            )
            # eager checkpoint, NOT persist: labels feeds the next round's
            # plan twice, so without lineage truncation the logical plan
            # doubles per round and long chains OOM the planner
            .localCheckpoint(eager=True)
        )
        total = labels.agg(F.sum("label")).collect()[0][0] or 0
        if total == prev_total:
            break
        prev_total = total
    return labels.select("vec_id", F.col("label").alias("canonical_id"))


def connected_components_star(
    vertices: DataFrame, edges: DataFrame, max_iters: int = 25
) -> DataFrame:
    """Connected components via alternating large-star/small-star edge
    rewriting (the MapReduce-era algorithm whose round count is
    O(log diameter), vs min-label propagation's O(diameter)): each round,
    every vertex rewires its larger neighbors (large-star) then its
    smaller neighborhood (small-star) to its neighborhood minimum; the
    edge set converges to stars centered at component minima.

    Same interface as ``connected_components_min``; use THIS one when
    component diameters are unbounded — a 200-long near-dup chain
    converges in ~8 rounds here but needs 200 propagation rounds (the
    equivalence and divergence are pinned in
    tests/test_connected_components.py). Each round is two
    groupBy+join passes keyed on vertex id; edges are eagerly
    checkpointed per round (CLAUDE.md plan-growth rule)."""
    # canonical undirected edge set (a < b), no self-loops
    e = (
        edges.filter(F.col("vec_id") != F.col("nb"))
        .select(
            F.least("vec_id", "nb").alias("a"),
            F.greatest("vec_id", "nb").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sym(df: DataFrame) -> DataFrame:
        return df.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            df.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )

    prev = e
    prev_n = e.count()
    for _ in range(max_iters):
        # large-star: u connects every LARGER neighbor to min(N(u) ∪ {u})
        sym = _sym(e)
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
        )
        e2 = (
            large.filter(F.col("x") != F.col("y"))
            .select(
                F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
            )
            .distinct()
        )
        # small-star: u connects its SMALLER neighborhood (and itself) to
        # the minimum of that neighborhood
        symle = _sym(e2).filter(F.col("v") < F.col("u"))
        minsle = symle.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            symle.join(minsle, "u")
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
            .union(
                minsle.select(F.col("u").alias("x"), F.col("m").alias("y"))
            )
        )
        e = (
            small.filter(F.col("x") != F.col("y"))
            .select(
                F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        # EXACT fixpoint test (a hash/sum signature can collide, and the
        # rewrite rounds are deterministic functions of the edge set, so
        # set equality IS convergence): compare counts, then set-diff
        n = e.count()
        if n == prev_n and e.exceptAll(prev).isEmpty():
            break
        prev, prev_n = e, n
    # at the fixpoint edges are (root, member) stars
    roots = e.groupBy(F.col("b").alias("vec_id")).agg(
        F.min("a").alias("canonical_id")
    )
    return vertices.join(roots, "vec_id", "left").select(
        "vec_id",
        F.coalesce("canonical_id", F.col("vec_id")).alias("canonical_id"),
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup: LSH-bucketed candidate pairs (the
    scale path — no O(n²) cross join; only same-bucket pairs are scored),
    exact cosine >= 0.35 confirmation, then TRANSITIVE canonicalization
    via alternating-star connected components
    (``connected_components_star`` — O(log diameter) rounds, so even
    adversarially long dup chains converge), collapsing chain-shaped dup
    clusters a~b~c to one canonical id. The DuckDB twin is a
    recursive-CTE reachability minimum."""
    e = _emb(spark, sf_dir)
    eb = e.select("vec_id", "v", _lsh_bucket().alias("bucket"))
    a, b = eb.alias("a"), eb.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (
        F.sqrt(_dot(F.col("a.v"), F.col("a.v")))
        * F.sqrt(_dot(F.col("b.v"), F.col("b.v")))
    )
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= DEDUP_COSINE_THRESHOLD)
    )
    neighbors = pairs.select(
        F.col("vec_a").alias("vec_id"), F.col("vec_b").alias("nb")
    ).union(
        pairs.select(F.col("vec_b").alias("vec_id"), F.col("vec_a").alias("nb"))
    )
    comp = connected_components_star(e.select("vec_id"), neighbors)
    canon = comp.withColumn(
        "is_dup", (F.col("canonical_id") < F.col("vec_id")).cast("int")
    )
    return canon.orderBy("vec_id")


DEDUP_COSINE_SQL = (
    """
    WITH RECURSIVE e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    b AS (
        SELECT vec_id, v, """
    + " + ".join(
        f"(CASE WHEN {_plane_sql(j)} > 0 THEN {2**j} ELSE 0 END)"
        for j in range(N_PLANES)
    )
    + """ AS bucket
        FROM e
    ),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
        FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    pf AS (SELECT * FROM pairs WHERE cosine >= 0.35),
    nb AS (
        SELECT vec_a AS vec_id, vec_b AS nb FROM pf
        UNION ALL
        SELECT vec_b AS vec_id, vec_a AS nb FROM pf
    ),
    -- transitive closure: minimum over every vertex reachable through
    -- near-dup edges (recursive reachability; UNION dedups, so it
    -- terminates at the component closure)
    reach AS (
        SELECT vec_id AS src, vec_id AS dst FROM e
        UNION
        SELECT r.src, n.nb AS dst
        FROM reach r
        JOIN nb n ON r.dst = n.vec_id
    )
    SELECT src AS vec_id,
           min(dst) AS canonical_id,
           (CASE WHEN min(dst) < src THEN 1 ELSE 0 END)::INT AS is_dup
    FROM reach
    GROUP BY src
    ORDER BY src
"""
)


# ---------------------------------------------------------------------------
# K-means centroid training (Lloyd's algorithm) — the "train" half of the
# IVF index (ann_ivf_assign/search quantize against centroids; this is
# where those centroids come from). All arithmetic is FIXED-POINT INTEGER
# (1e-6 resolution): float sums are order-dependent under Spark's
# unordered partial aggregation, so member means are computed as exact
# integer sums — bit-identical across engines, partitionings and runs.
#
# Scale shape (per iteration): the K×d centroid model BROADCASTS to every
# task (assignment is a narrow map — no shuffle of the vectors); the
# update explodes members to (cid, dim) rows whose map-side partial
# aggregation collapses each task's output to ≤ K·d partial rows, so the
# shuffle moves O(tasks · K · d) tiny rows, never O(n · d). This is the
# classic Lloyd layout for 10^9-vector corpora. Each round's centroid
# frame is localCheckpoint'ed: it feeds the next plan twice (assign +
# empty-cluster fallback), and per CLAUDE.md unbounded iterative chains
# double the logical plan per round.

KMEANS_K = 8
KMEANS_ITERS = 2
_FP = 1000000.0  # fixed-point scale: 1e-6 resolution


def _fixed_vec(col):
    """array<double> → array<long> at 1e-6 resolution; floor(x·1e6 + 0.5)
    is the portable rounding (identical in Spark and DuckDB, unlike the
    double→int CAST whose round-vs-truncate rules differ)."""
    return F.transform(
        col, lambda x: F.floor(x * F.lit(_FP) + F.lit(0.5)).cast("long")
    )


def _kmeans_assign(ef: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid by maximal integer dot product, ties to the lower
    cid. The member vector rides inside the min-struct so the update stage
    needs no join back to the corpus."""
    dot = F.aggregate(
        F.zip_with(F.col("q"), F.col("c"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        ef.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            F.struct(
                (-dot).alias("neg_dot"),
                F.col("cid").alias("cid"),
                F.col("q").alias("q"),
            ).alias("cand"),
        )
        .groupBy("vec_id")
        .agg(F.min("cand").alias("best"))
        .select(
            "vec_id", F.col("best.cid").alias("cid"), F.col("best.q").alias("q")
        )
    )


def _kmeans_update(assigned: DataFrame, prev: DataFrame) -> DataFrame:
    """New centroid = per-dim rounded member mean (exact integer sum, then
    one portable floor(s/cnt + 0.5)); a cluster that lost every member
    keeps its previous centroid so K never shrinks mid-run."""
    sums = (
        assigned.select("cid", F.posexplode("q").alias("dim", "qv"))
        .groupBy("cid", "dim")
        .agg(F.sum("qv").alias("s"), F.count("*").alias("cnt"))
        .withColumn(
            "cv",
            F.floor(
                F.col("s").cast("double") / F.col("cnt") + F.lit(0.5)
            ).cast("long"),
        )
    )
    newc = (
        sums.groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cv"))).alias("p"))
        .select("cid", F.transform("p", lambda st: st["cv"]).alias("c"))
    )
    return (
        prev.select("cid", F.col("c").alias("c_prev"))
        .join(newc.withColumnRenamed("c", "c_new"), "cid", "left")
        .select("cid", F.coalesce("c_new", "c_prev").alias("c"))
    )


_KMEANS_CACHE: dict = {}


def _kmeans_run(spark: SparkSession, sf_dir: str):
    """Shared Lloyd loop: returns (final centroid frame (cid, c), final
    assignment frame (vec_id, cid, q)) — consumed by ann_kmeans_train
    (the centroid view) and dedup_semantic (the cluster partition).
    Memoized per (application, sf_dir) on checkpointed frames so one gate
    run trains Lloyd once, not once per consuming query."""
    app = spark.sparkContext.applicationId
    # frames of dead applications can never be reused (executors gone)
    for stale in [k for k in _KMEANS_CACHE if k[0] != app]:
        del _KMEANS_CACHE[stale]
    key = (app, sf_dir)
    hit = _KMEANS_CACHE.get(key)
    if hit is not None:
        return hit
    e = _emb(spark, sf_dir)
    ef = e.select("vec_id", _fixed_vec(F.col("v")).alias("q"))
    cents = ef.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("q").alias("c")
    )
    assigned = None
    for _ in range(KMEANS_ITERS):
        assigned = _kmeans_assign(ef, cents)
        cents = _kmeans_update(assigned, cents).localCheckpoint(eager=True)
    assigned = assigned.localCheckpoint(eager=True)
    _KMEANS_CACHE[key] = (cents, assigned)
    return cents, assigned


def ann_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train KMEANS_K IVF centroids with KMEANS_ITERS Lloyd iterations
    (deterministic init: the first K vectors by vec_id). Output is the
    final fixed-point centroid matrix exploded to scalar rows
    (centroid_id, dim, c_fixed) plus each cluster's final member count —
    every value integral, hash-exact against the unrolled SQL twin."""
    cents, assigned = _kmeans_run(spark, sf_dir)
    counts = assigned.groupBy("cid").agg(F.count("*").alias("n_members"))
    return (
        cents.select("cid", F.posexplode("c").alias("dim", "c_fixed"))
        .join(counts, "cid", "left")
        .select(
            F.col("cid").alias("centroid_id"),
            F.col("dim").cast("int").alias("dim"),
            F.col("c_fixed").cast("long").alias("c_fixed"),
            F.coalesce(F.col("n_members"), F.lit(0))
            .cast("long")
            .alias("n_members"),
        )
        .orderBy("centroid_id", "dim")
    )


def _kmeans_ctes() -> str:
    """The unrolled Lloyd trainer as a CTE chain ending at c{N} (final
    centroids) and a{N} (final assignment) — shared by KMEANS_SQL and
    SEMDEDUP_SQL."""
    parts = [
        f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ef AS (
        SELECT vec_id,
               CAST(floor(x * {_FP!r} + 0.5) AS BIGINT) AS q,
               CAST(dim AS INT) - 1 AS dim
        FROM (SELECT vec_id, unnest(v) AS x,
                     generate_subscripts(v, 1) AS dim
              FROM e)
    ),
    c0 AS (
        SELECT CAST(vec_id AS INT) AS cid, dim, q AS c
        FROM ef WHERE vec_id < {KMEANS_K}
    )"""
    ]
    for i in range(1, KMEANS_ITERS + 1):
        p = i - 1
        parts.append(
            f""",
    d{i} AS (
        SELECT ef.vec_id, c.cid, sum(ef.q * c.c) AS dot
        FROM ef JOIN c{p} c ON ef.dim = c.dim
        GROUP BY ef.vec_id, c.cid
    ),
    a{i} AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dot DESC, cid ASC) AS rn
            FROM d{i}
        ) WHERE rn = 1
    ),
    s{i} AS (
        SELECT a.cid, ef.dim,
               CAST(floor(CAST(sum(ef.q) AS DOUBLE) / count(*) + 0.5)
                    AS BIGINT) AS cv
        FROM a{i} a JOIN ef ON a.vec_id = ef.vec_id
        GROUP BY a.cid, ef.dim
    ),
    c{i} AS (
        SELECT c{p}.cid, c{p}.dim, coalesce(s{i}.cv, c{p}.c) AS c
        FROM c{p} LEFT JOIN s{i}
          ON c{p}.cid = s{i}.cid AND c{p}.dim = s{i}.dim
    )"""
        )
    return "".join(parts)


def _kmeans_sql() -> str:
    n = KMEANS_ITERS
    return (
        _kmeans_ctes()
        + f""",
    cnt AS (
        SELECT cid, CAST(count(*) AS BIGINT) AS n_members
        FROM a{n} GROUP BY cid
    )
    SELECT c{n}.cid AS centroid_id, c{n}.dim AS dim, c{n}.c AS c_fixed,
           coalesce(cnt.n_members, 0) AS n_members
    FROM c{n} LEFT JOIN cnt ON c{n}.cid = cnt.cid
    ORDER BY centroid_id, dim
"""
    )


KMEANS_SQL = _kmeans_sql()


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
# cluster the embedding space with k-means, then look for near-duplicates
# only WITHIN each cluster — the pruning pass that removed 50% of LAION
# with no quality loss. The cluster partition turns the global O(n²)
# cosine problem into per-cluster quadratics bounded by cluster size; at
# corpus scale K grows with n (K ≈ n / target_cluster_size), assignment
# stays a broadcast narrow map, and AQE skew-join splitting handles the
# residual fat cluster. Dedup rule (deterministic, closure-free): a
# vector is a duplicate iff some LOWER-id vector in its cluster has
# cosine ≥ the threshold — the kept set is exactly the greedy
# lowest-id-representative choice SemDeDup makes per cluster.
SEMDEDUP_COSINE_THRESHOLD = 0.3


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: trained k-means partition
    (the SAME Lloyd run as ann_kmeans_train — fixed-point, hash-exact),
    exact within-cluster cosine confirmation, lowest-id representative
    kept. Output per vector: (vec_id, cluster_id, n_close_lower, is_dup)."""
    e = _emb(spark, sf_dir)
    _cents, assigned = _kmeans_run(spark, sf_dir)
    # materialized once: av feeds the self-join twice plus the final base
    av = (
        assigned.select("vec_id", "cid")
        .join(e.select("vec_id", "v"), "vec_id")
        .localCheckpoint(eager=True)
    )
    a, b = av.alias("a"), av.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (
        F.sqrt(_dot(F.col("a.v"), F.col("a.v")))
        * F.sqrt(_dot(F.col("b.v"), F.col("b.v")))
    )
    close = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("b.vec_id").alias("vec_id"), F.round(cos, 6).alias("cosine")
        )
        .filter(F.col("cosine") >= SEMDEDUP_COSINE_THRESHOLD)
        .groupBy("vec_id")
        .agg(F.count("*").alias("n_close_lower"))
    )
    return (
        assigned.select("vec_id", F.col("cid").cast("int").alias("cluster_id"))
        .join(close, "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            F.coalesce("n_close_lower", F.lit(0)).cast("long").alias(
                "n_close_lower"
            ),
            (F.coalesce("n_close_lower", F.lit(0)) > 0).cast("int").alias(
                "is_dup"
            ),
        )
        .orderBy("vec_id")
    )


SEMDEDUP_SQL = (
    _kmeans_ctes()
    + f""",
    av AS (
        SELECT a.vec_id, a.cid, e.v
        FROM a{KMEANS_ITERS} a JOIN e ON a.vec_id = e.vec_id
    ),
    close AS (
        SELECT b.vec_id, CAST(count(*) AS BIGINT) AS n_close_lower
        FROM av a JOIN av b ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(b.v, b.v))), 6)
              >= {SEMDEDUP_COSINE_THRESHOLD}
        GROUP BY b.vec_id
    )
    SELECT av.vec_id, CAST(av.cid AS INT) AS cluster_id,
           coalesce(close.n_close_lower, 0) AS n_close_lower,
           (CASE WHEN coalesce(close.n_close_lower, 0) > 0
                 THEN 1 ELSE 0 END)::INT AS is_dup
    FROM av LEFT JOIN close ON av.vec_id = close.vec_id
    ORDER BY av.vec_id
"""
)


CLUSTER_SAMPLE_K = 60  # straddles the sf0.01 cluster sizes (55–68)


def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-preserving subsample over the trained k-means partition
    (the D4-style step after SemDeDup): keep at most ``CLUSTER_SAMPLE_K``
    members PER CLUSTER so no dense region dominates the curated corpus,
    ranked by a deterministic md5 draw (append-order independent —
    re-shuffling the input never changes who is kept). Reuses the SAME
    memoized Lloyd run as ann_kmeans_train / dedup_semantic.

    Cross-engine exactness: the rank orders on the RAW HEX SUBSTRING of
    the md5 (string comparison == numeric order of the big-endian hex) —
    never on the lower-64 value as a double, whose 2^64→double collapse
    could tie two distinct hashes in one engine only (CLAUDE.md trap).

    Scale shape: one cid-keyed window for the per-cluster rank; cluster
    sizes are bounded by corpus/K on a healthy clustering — a degenerate
    giant cluster is the skew case, where the rank-free variant
    (keep-fraction threshold on the same hash string) drops in without
    changing the draw."""
    _cents, assigned = _kmeans_run(spark, sf_dir)
    draw = F.substring(
        F.md5(F.concat(F.lit("cbs|"), F.col("vec_id").cast("string"))), 17, 16
    )
    w = Window.partitionBy("cid").orderBy(F.asc("draw"), F.asc("vec_id"))
    return (
        assigned.select(
            "vec_id", F.col("cid").cast("int").alias("cluster_id"),
            draw.alias("draw"),
        )
        .withColumn("cid", F.col("cluster_id"))
        .withColumn("rk", F.row_number().over(w))
        .select(
            "vec_id",
            "cluster_id",
            F.col("rk").cast("long").alias("rk"),
            (F.col("rk") <= CLUSTER_SAMPLE_K).cast("int").alias("kept"),
        )
        .orderBy("vec_id")
    )


CLUSTER_SAMPLE_SQL = (
    _kmeans_ctes()
    + f""",
    ranked AS (
        SELECT vec_id, CAST(cid AS INT) AS cluster_id,
               row_number() OVER (
                   PARTITION BY cid
                   ORDER BY substr(md5('cbs|' || CAST(vec_id AS VARCHAR)),
                                   17, 16) ASC, vec_id ASC
               ) AS rk
        FROM a{KMEANS_ITERS}
    )
    SELECT vec_id, cluster_id, CAST(rk AS BIGINT) AS rk,
           CAST(CASE WHEN rk <= {CLUSTER_SAMPLE_K} THEN 1 ELSE 0 END AS INT)
               AS kept
    FROM ranked
    ORDER BY vec_id
"""
)


def embedding_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality report over the trained k-means partition: per
    cluster, the member count, the majority label and its count, and the
    purity (majority fraction) — the quick eval that tells you whether
    SemDeDup-style semantic pruning (``dedup_semantic``) is cutting within
    coherent regions or shredding across topics. Reuses the SAME memoized
    Lloyd run as ann_kmeans_train / dedup_semantic / cluster_balanced_sample
    (one train per gate run).

    Majority pick is a rank-1 window ordered by (count DESC, label ASC) —
    exact integers, total order. Purity is the one double: the same
    ``top_n / n_vecs`` division of exact integers in both engines.

    Scale shape: one (cid, label) partial-agg count (map-side combined),
    then windows/joins over K·|labels| rows — model-sized, not
    corpus-sized; at 10^9 vectors the only corpus-wide pass is the count
    aggregation itself."""
    _cents, assigned = _kmeans_run(spark, sf_dir)
    lab = _emb(spark, sf_dir).select("vec_id", "label")
    per = (
        assigned.join(lab, "vec_id")
        .groupBy("cid", "label")
        .agg(F.count("*").alias("n"))
    )
    tot = per.groupBy("cid").agg(F.sum("n").alias("n_vecs"))
    w = Window.partitionBy("cid").orderBy(F.desc("n"), F.asc("label"))
    top = per.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        top.join(tot, "cid")
        .select(
            F.col("cid").cast("int").alias("cluster_id"),
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.col("label").cast("int").alias("top_label"),
            F.col("n").cast("long").alias("top_n"),
            F.round(F.col("n").cast("double") / F.col("n_vecs"), 6).alias(
                "purity"
            ),
        )
        .orderBy("cluster_id")
    )


CLUSTER_PURITY_SQL = (
    _kmeans_ctes()
    + f""",
    per AS (
        SELECT a.cid, e.label, count(*) AS n
        FROM a{KMEANS_ITERS} a JOIN embeddings e ON a.vec_id = e.vec_id
        GROUP BY a.cid, e.label
    ),
    tot AS (SELECT cid, sum(n) AS n_vecs FROM per GROUP BY cid),
    top AS (
        SELECT cid, label, n,
               row_number() OVER (PARTITION BY cid
                                  ORDER BY n DESC, label ASC) AS rn
        FROM per
    )
    SELECT CAST(t.cid AS INT) AS cluster_id,
           CAST(tot.n_vecs AS BIGINT) AS n_vecs,
           CAST(t.label AS INT) AS top_label,
           CAST(t.n AS BIGINT) AS top_n,
           round(CAST(t.n AS DOUBLE) / CAST(tot.n_vecs AS DOUBLE), 6)
               AS purity
    FROM top t JOIN tot ON t.cid = tot.cid
    WHERE t.rn = 1
    ORDER BY cluster_id
"""
)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory half of a billion-scale IVF-PQ
# index: each 64-dim vector compresses to PQ_M one-byte codes (one
# nearest-centroid id per 8-dim subspace), and search scores candidates
# with asymmetric distance (ADC): the query's exact distance to each
# candidate's RECONSTRUCTION (sum of per-subspace query→centroid
# distances). Distances are fixed-point-integer L2, so encode and search
# are bit-exact against the SQL twins. Codebooks here are the
# deterministic init (the first PQ_K vectors' subvectors); ann_kmeans_train
# is the refinement path when trained codebooks are wanted.
#
# Scale shape: the PQ_M×PQ_K×8 codebook broadcasts (a few KB); encode is a
# narrow map (argmin over K per subspace inside the row); search broadcasts
# the query's PQ_M×PQ_K distance table and scans CODES, not vectors — the
# 64-dim float vector never leaves the scan after encode, which is the
# entire point of PQ at 10^9 vectors.

PQ_M = 8  # subspaces
PQ_D = 8  # dims per subspace (PQ_M * PQ_D = 64)
PQ_K = 8  # centroids per subspace


def _pq_codebook(ef: DataFrame) -> DataFrame:
    """(sub, cid, c: array<long>) — subvectors of the first PQ_K vectors."""
    subs = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(PQ_M - 1)),
            lambda j: F.struct(
                j.cast("int").alias("sub"),
                F.slice(F.col("q"), j * PQ_D + 1, PQ_D).alias("c"),
            ),
        )
    )
    return (
        ef.filter(F.col("vec_id") < PQ_K)
        .select(F.col("vec_id").cast("int").alias("cid"), subs.alias("s"))
        .select("cid", F.col("s.sub").alias("sub"), F.col("s.c").alias("c"))
    )


def _l2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ann_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode: per (vector, subspace), the nearest codebook centroid by
    fixed-point L2 (ties to the lower cid). Output (vec_id, sub, code,
    dist) — the code column is what a PQ index stores per vector."""
    e = _emb(spark, sf_dir)
    ef = e.select("vec_id", _fixed_vec(F.col("v")).alias("q"))
    cb = _pq_codebook(ef)
    qsub = ef.select(
        "vec_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(PQ_M - 1)),
                lambda j: F.struct(
                    j.cast("int").alias("sub"),
                    F.slice(F.col("q"), j * PQ_D + 1, PQ_D).alias("qs"),
                ),
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.sub").alias("sub"), F.col("s.qs").alias("qs"))
    scored = qsub.join(F.broadcast(cb), "sub").select(
        "vec_id",
        "sub",
        F.struct(
            _l2(F.col("qs"), F.col("c")).alias("d"), F.col("cid").alias("cid")
        ).alias("cand"),
    )
    return (
        scored.groupBy("vec_id", "sub")
        .agg(F.min("cand").alias("best"))
        .select(
            "vec_id",
            "sub",
            F.col("best.cid").alias("code"),
            F.col("best.d").alias("dist"),
        )
        .orderBy("vec_id", "sub")
    )


def _pq_sql_ctes() -> str:
    """Shared exploded fixed-point subvector + codebook CTEs."""
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ef AS (
        SELECT vec_id,
               CAST(floor(x * {_FP!r} + 0.5) AS BIGINT) AS q,
               CAST(dim AS INT) - 1 AS dim
        FROM (SELECT vec_id, unnest(v) AS x,
                     generate_subscripts(v, 1) AS dim
              FROM e)
    ),
    sub AS (
        SELECT vec_id, CAST(dim // {PQ_D} AS INT) AS sub,
               dim % {PQ_D} AS sdim, q
        FROM ef
    ),
    cb AS (
        SELECT CAST(vec_id AS INT) AS cid, sub, sdim, q AS c
        FROM sub WHERE vec_id < {PQ_K}
    ),
    dists AS (
        SELECT s.vec_id, s.sub, c.cid,
               sum((s.q - c.c) * (s.q - c.c)) AS d
        FROM sub s JOIN cb c ON s.sub = c.sub AND s.sdim = c.sdim
        GROUP BY s.vec_id, s.sub, c.cid
    ),
    codes AS (
        SELECT vec_id, sub, cid AS code, d AS dist FROM (
            SELECT vec_id, sub, cid, d,
                   row_number() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d ASC, cid ASC) AS rn
            FROM dists
        ) WHERE rn = 1
    )"""


ANN_PQ_ENCODE_SQL = _pq_sql_ctes() + """
    SELECT vec_id, sub, code, CAST(dist AS BIGINT) AS dist
    FROM codes
    ORDER BY vec_id, sub
"""


def ann_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC search: score every candidate AGAINST ITS CODES ONLY — the
    vec_id=0 query precomputes its distance to all PQ_M×PQ_K centroids
    (the broadcast lookup table), and a candidate's approximate distance
    is the sum of the table entries its PQ_M codes select. Top 10 by
    (adc, vec_id)."""
    e = _emb(spark, sf_dir)
    ef = e.select("vec_id", _fixed_vec(F.col("v")).alias("q"))
    cb = _pq_codebook(ef)
    qsub = (
        ef.filter(F.col("vec_id") == 0)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(PQ_M - 1)),
                    lambda j: F.struct(
                        j.cast("int").alias("sub"),
                        F.slice(F.col("q"), j * PQ_D + 1, PQ_D).alias("qs"),
                    ),
                )
            ).alias("s")
        )
        .select(F.col("s.sub").alias("sub"), F.col("s.qs").alias("qs"))
    )
    # the PQ_M × PQ_K query→centroid distance table (tiny; broadcasts)
    dtab = qsub.join(cb, "sub").select(
        "sub", "cid", _l2(F.col("qs"), F.col("c")).alias("qd")
    )
    codes = ann_pq_encode(spark, sf_dir).filter(F.col("vec_id") != 0)
    return (
        codes.join(
            F.broadcast(dtab),
            (codes["sub"] == dtab["sub"]) & (codes["code"] == dtab["cid"]),
        )
        .groupBy("vec_id")
        .agg(F.sum("qd").alias("adc"))
        .select("vec_id", F.col("adc").cast("long").alias("adc"))
        .orderBy(F.col("adc").asc(), F.col("vec_id").asc())
        .limit(10)
    )


ANN_PQ_SEARCH_SQL = _pq_sql_ctes() + """,
    dtab AS (
        SELECT s.sub, c.cid, sum((s.q - c.c) * (s.q - c.c)) AS qd
        FROM sub s JOIN cb c ON s.sub = c.sub AND s.sdim = c.sdim
        WHERE s.vec_id = 0
        GROUP BY s.sub, c.cid
    )
    SELECT k.vec_id, CAST(sum(t.qd) AS BIGINT) AS adc
    FROM codes k JOIN dtab t ON k.sub = t.sub AND k.code = t.cid
    WHERE k.vec_id <> 0
    GROUP BY k.vec_id
    ORDER BY adc ASC, vec_id ASC
    LIMIT 10
"""


IVFPQ_QUERY = 20  # query vector id (not a centroid, not a codebook seed)


def ann_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF-PQ (FAISS IndexIVFPQ shape): coarse-assign every vector to
    its nearest of N_CENTROIDS coarse centroids by fixed-point L2, PQ-
    encode the RESIDUAL (v − coarse centroid) against a shared residual
    codebook (residuals of vec_ids 8..15, sliced per subspace), then
    answer the query by probing ONLY its own coarse cell and scoring that
    cell's codes against the query-residual distance table (ADC). Output:
    top-10 (vec_id, centroid_id, adc).

    Scale shape: the posting-list layout is the data partitioning — the
    probe is a partition-pruned read, never a corpus scan; the residual
    codebook and the 64-entry distance table broadcast; candidate
    vectors are represented by PQ_M byte codes (the memory half). The
    residual trick is what makes one shared codebook work across cells:
    residual magnitudes are comparable everywhere, unlike raw positions.
    All arithmetic is fixed-point integer (CLAUDE.md cross-engine
    recipe), so the oracle reproduces every distance bit-exactly."""
    e = _emb(spark, sf_dir)
    ef = e.select("vec_id", _fixed_vec(F.col("v")).alias("q"))
    cents = ef.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("q").alias("c")
    )
    assigned = (
        ef.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "q",
            F.struct(
                _l2(F.col("q"), F.col("c")).alias("d"), F.col("cid").alias("cid")
            ).alias("cand"),
        )
        .groupBy("vec_id")
        .agg(F.min("cand").alias("best"), F.first("q").alias("q"))
        .select("vec_id", F.col("best.cid").alias("centroid_id"), "q")
    )
    resid = assigned.join(
        F.broadcast(cents), assigned["centroid_id"] == cents["cid"]
    ).select(
        "vec_id",
        "centroid_id",
        F.zip_with("q", "c", lambda x, y: x - y).alias("r"),
    ).localCheckpoint(eager=True)  # feeds codebook, encode AND the query
    rsub = resid.select(
        "vec_id",
        "centroid_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(PQ_M - 1)),
                lambda j: F.struct(
                    j.cast("int").alias("sub"),
                    F.slice(F.col("r"), j * PQ_D + 1, PQ_D).alias("rs"),
                ),
            )
        ).alias("s"),
    ).select(
        "vec_id", "centroid_id", F.col("s.sub").alias("sub"), F.col("s.rs").alias("rs")
    )
    cb = rsub.filter(
        (F.col("vec_id") >= N_CENTROIDS) & (F.col("vec_id") < N_CENTROIDS + PQ_K)
    ).select(
        (F.col("vec_id") - N_CENTROIDS).cast("int").alias("code_id"),
        "sub",
        F.col("rs").alias("cbv"),
    )
    codes = (
        rsub.filter(F.col("vec_id") != IVFPQ_QUERY)
        .join(F.broadcast(cb), "sub")
        .select(
            "vec_id",
            "centroid_id",
            "sub",
            F.struct(
                _l2(F.col("rs"), F.col("cbv")).alias("d"),
                F.col("code_id").alias("code_id"),
            ).alias("cand"),
        )
        .groupBy("vec_id", "centroid_id", "sub")
        .agg(F.min("cand").alias("best"))
        .select("vec_id", "centroid_id", "sub", F.col("best.code_id").alias("code"))
    )
    qcell = resid.filter(F.col("vec_id") == IVFPQ_QUERY).select(
        F.col("centroid_id").alias("qcid")
    )
    dtab = (
        rsub.filter(F.col("vec_id") == IVFPQ_QUERY)
        .join(F.broadcast(cb), "sub")
        .select("sub", "code_id", _l2(F.col("rs"), F.col("cbv")).alias("qd"))
    )
    return (
        codes.join(F.broadcast(qcell), codes["centroid_id"] == qcell["qcid"])
        .join(
            F.broadcast(dtab),
            (codes["sub"] == dtab["sub"]) & (codes["code"] == dtab["code_id"]),
        )
        .groupBy("vec_id", "centroid_id")
        .agg(F.sum("qd").cast("long").alias("adc"))
        .orderBy(F.col("adc").asc(), F.col("vec_id").asc())
        .limit(10)
    )


def _ivfpq_ctes() -> str:
    """The IVF-PQ WITH-chain (ef/cents/assign/resid/cb/codes/qcell/dtab),
    shared by the search query and the recall query."""
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ef AS (
        SELECT vec_id,
               CAST(floor(x * {_FP!r} + 0.5) AS BIGINT) AS q,
               CAST(dim AS INT) - 1 AS dim
        FROM (SELECT vec_id, unnest(v) AS x,
                     generate_subscripts(v, 1) AS dim
              FROM e)
    ),
    cents AS (
        SELECT CAST(vec_id AS INT) AS cid, dim, q AS c
        FROM ef WHERE vec_id < {N_CENTROIDS}
    ),
    adist AS (
        SELECT f.vec_id, c.cid, sum((f.q - c.c) * (f.q - c.c)) AS d
        FROM ef f JOIN cents c ON f.dim = c.dim
        GROUP BY f.vec_id, c.cid
    ),
    assign AS (
        SELECT vec_id, cid AS centroid_id FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d ASC, cid ASC) AS rn
            FROM adist
        ) WHERE rn = 1
    ),
    resid AS (
        SELECT f.vec_id, a.centroid_id, f.dim, f.q - c.c AS r
        FROM ef f
        JOIN assign a ON f.vec_id = a.vec_id
        JOIN cents c ON c.cid = a.centroid_id AND c.dim = f.dim
    ),
    rsub AS (
        SELECT vec_id, centroid_id, CAST(dim // {PQ_D} AS INT) AS sub,
               dim % {PQ_D} AS sdim, r
        FROM resid
    ),
    cb AS (
        SELECT CAST(vec_id - {N_CENTROIDS} AS INT) AS code_id, sub, sdim,
               r AS cbv
        FROM rsub
        WHERE vec_id >= {N_CENTROIDS} AND vec_id < {N_CENTROIDS + PQ_K}
    ),
    cdist AS (
        SELECT s.vec_id, s.centroid_id, s.sub, b.code_id,
               sum((s.r - b.cbv) * (s.r - b.cbv)) AS d
        FROM rsub s JOIN cb b ON s.sub = b.sub AND s.sdim = b.sdim
        WHERE s.vec_id <> {IVFPQ_QUERY}
        GROUP BY s.vec_id, s.centroid_id, s.sub, b.code_id
    ),
    codes AS (
        SELECT vec_id, centroid_id, sub, code_id AS code FROM (
            SELECT vec_id, centroid_id, sub, code_id, d,
                   row_number() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d ASC, code_id ASC) AS rn
            FROM cdist
        ) WHERE rn = 1
    ),
    qcell AS (
        SELECT centroid_id AS qcid FROM assign WHERE vec_id = {IVFPQ_QUERY}
    ),
    dtab AS (
        SELECT s.sub, b.code_id, sum((s.r - b.cbv) * (s.r - b.cbv)) AS qd
        FROM rsub s JOIN cb b ON s.sub = b.sub AND s.sdim = b.sdim
        WHERE s.vec_id = {IVFPQ_QUERY}
        GROUP BY s.sub, b.code_id
    )
"""


# The ADC ranking SELECT — the search query's tail AND the recall
# query's `approx` CTE body, shared so a change to the index's ranking
# (tie-break, shortlist size) cannot silently diverge between the
# shipped search and the recall metric that measures it.
_IVFPQ_RANK = """SELECT k.vec_id, k.centroid_id,
           CAST(sum(t.qd) AS BIGINT) AS adc
    FROM codes k
    JOIN qcell ON k.centroid_id = qcell.qcid
    JOIN dtab t ON k.sub = t.sub AND k.code = t.code_id
    GROUP BY k.vec_id, k.centroid_id
    ORDER BY adc ASC, vec_id ASC
    LIMIT 10"""


ANN_IVFPQ_SQL = _ivfpq_ctes() + "    " + _IVFPQ_RANK + "\n"


def ann_recall_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF-PQ index against exact search — the quality
    metric every ANN deployment tracks ("measure, don't guess"): how many
    of the query's TRUE 10 nearest neighbors (exact fixed-point L2 over
    the full corpus) survive both the coarse-cell restriction (nprobe=1
    misses neighbors quantized into adjacent cells) and the lossy
    residual codes. Output: (method, k, n_overlap) — the driver hash
    pins the measured recall, so an index regression (wrong cell math,
    broken codebook) fails the gate even when the top-10 still *looks*
    plausible."""
    e = _emb(spark, sf_dir)
    ef = e.select("vec_id", _fixed_vec(F.col("v")).alias("q"))
    qv = ef.filter(F.col("vec_id") == IVFPQ_QUERY).select(F.col("q").alias("qv"))
    exact = (
        ef.filter(F.col("vec_id") != IVFPQ_QUERY)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", _l2(F.col("q"), F.col("qv")).alias("d"))
        .orderBy(F.col("d").asc(), F.col("vec_id").asc())
        .limit(10)
    )
    approx = ann_ivfpq_search(spark, sf_dir).select("vec_id")
    return exact.join(approx, "vec_id").agg(
        F.lit("ivfpq").alias("method"),
        F.lit(10).cast("int").alias("k"),
        F.count("*").alias("n_overlap"),
    )


ANN_RECALL_IVFPQ_SQL = (
    _ivfpq_ctes()
    + f""",
    exact AS (
        SELECT f.vec_id, sum((f.q - b.q) * (f.q - b.q)) AS d
        FROM ef f JOIN ef b ON f.dim = b.dim AND b.vec_id = {IVFPQ_QUERY}
        WHERE f.vec_id <> {IVFPQ_QUERY}
        GROUP BY f.vec_id
        ORDER BY d ASC, f.vec_id ASC
        LIMIT 10
    ),
    approx AS (
        {_IVFPQ_RANK}
    )
    SELECT 'ivfpq' AS method, CAST(10 AS INT) AS k,
           CAST(count(*) AS BIGINT) AS n_overlap
    FROM exact e JOIN approx a ON e.vec_id = a.vec_id
"""
)


PQ_RERANK_CAND = 25  # ADC shortlist size feeding the exact stage


def ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: the ADC index shortlists PQ_RERANK_CAND
    candidates (codes only — raw vectors never scanned), then the exact
    fixed-point L2 re-ranks just those against the query. Output keeps
    both distances so the oracle checks the quantization error the
    re-rank corrects (adc vs exact ordering can and does differ).

    Scale shape: stage 1 reads only the PQ code table (M bytes/vector vs
    4·dim — the memory half of IVF-PQ) with a broadcast 64-entry distance
    table; stage 2 is a fetch-by-id of |shortlist| raw vectors (a
    broadcast-hash semi-join against the shortlist ids, never a corpus
    scan) — the standard serving topology where recall is bought back
    from the lossy quantizer for a constant extra cost."""
    e = _emb(spark, sf_dir)
    ef = e.select("vec_id", _fixed_vec(F.col("v")).alias("q"))
    cb = _pq_codebook(ef)
    qsub = (
        ef.filter(F.col("vec_id") == 0)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(PQ_M - 1)),
                    lambda j: F.struct(
                        j.cast("int").alias("sub"),
                        F.slice(F.col("q"), j * PQ_D + 1, PQ_D).alias("qs"),
                    ),
                )
            ).alias("s")
        )
        .select(F.col("s.sub").alias("sub"), F.col("s.qs").alias("qs"))
    )
    dtab = qsub.join(cb, "sub").select(
        "sub", "cid", _l2(F.col("qs"), F.col("c")).alias("qd")
    )
    codes = ann_pq_encode(spark, sf_dir).filter(F.col("vec_id") != 0)
    shortlist = (
        codes.join(
            F.broadcast(dtab),
            (codes["sub"] == dtab["sub"]) & (codes["code"] == dtab["cid"]),
        )
        .groupBy("vec_id")
        .agg(F.sum("qd").cast("long").alias("adc"))
        .orderBy(F.col("adc").asc(), F.col("vec_id").asc())
        .limit(PQ_RERANK_CAND)
    )
    qvec = ef.filter(F.col("vec_id") == 0).select(F.col("q").alias("qv"))
    exact = (
        shortlist.join(ef, "vec_id")
        .crossJoin(F.broadcast(qvec))
        .select("vec_id", "adc", _l2(F.col("q"), F.col("qv")).alias("exact_d"))
    )
    return exact.orderBy(F.col("exact_d").asc(), F.col("vec_id").asc()).limit(10)


ANN_PQ_RERANK_SQL = _pq_sql_ctes() + f""",
    dtab AS (
        SELECT s.sub, c.cid, sum((s.q - c.c) * (s.q - c.c)) AS qd
        FROM sub s JOIN cb c ON s.sub = c.sub AND s.sdim = c.sdim
        WHERE s.vec_id = 0
        GROUP BY s.sub, c.cid
    ),
    shortlist AS (
        SELECT k.vec_id, CAST(sum(t.qd) AS BIGINT) AS adc
        FROM codes k JOIN dtab t ON k.sub = t.sub AND k.code = t.cid
        WHERE k.vec_id <> 0
        GROUP BY k.vec_id
        ORDER BY adc ASC, vec_id ASC
        LIMIT {PQ_RERANK_CAND}
    ),
    ex AS (
        SELECT a.vec_id,
               CAST(sum((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS exact_d
        FROM ef a
        JOIN ef b ON a.dim = b.dim AND b.vec_id = 0
        JOIN shortlist s ON s.vec_id = a.vec_id
        GROUP BY a.vec_id
    )
    SELECT s.vec_id, s.adc, x.exact_d
    FROM shortlist s JOIN ex x ON s.vec_id = x.vec_id
    ORDER BY exact_d ASC, s.vec_id ASC
    LIMIT 10
"""


RP_D_IN = 64  # corpus embedding dimension
RP_D_OUT = 16  # projected dimension (4× reduction)


def _rp_sign(i_col, j_col):
    """±1 sign for projection cell (i, j) from the parity of the LAST
    hex digit of md5('rp|i|j') — a pure string test, portable to DuckDB
    byte-for-byte (the numeric md5-lower-64 helper rides in a double, so
    its low-bit parity is NOT trustworthy — never use it for % 2)."""
    h = F.md5(
        F.concat(
            F.lit("rp|"),
            i_col.cast("string"),
            F.lit("|"),
            j_col.cast("string"),
        )
    )
    return F.when(
        F.substring(h, 32, 1).isin("1", "3", "5", "7", "9", "b", "d", "f"),
        F.lit(-1),
    ).otherwise(F.lit(1)).cast("long")


def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a DETERMINISTIC
    Rademacher (±1) matrix: proj[j] = Σ_i sign(i,j)·x[i] / √d_out — the
    cheap pre-step that shrinks ANN/dedup embedding cost 4× while
    approximately preserving distances. The sign matrix is a pure
    function of (i, j) (named md5 draw), so projections are reproducible
    across runs/engines and never materialize model state.

    Engine exactness: inputs go fixed-point (floor(x·1e6 + 0.5), the
    CLAUDE.md recipe) BEFORE the unordered sum — sign·int products sum
    exactly in any order — and the OUTPUT stays the integer accumulator
    (units: 1e-6·√d_out of the real projection; acc/4e6 has 2.5e-7
    resolution, so rounding it to 6 dp sits exactly on the engines'
    divergent .5 boundary — measured 18/8000 last-digit flips). Scale
    shape: the sign matrix (d_in·d_out rows) is a broadcast build from
    spark.range; the corpus explodes to (vec, i) pairs and folds straight
    into a map-side-combinable (vec_id, j) aggregation — one shuffle
    keyed on (vec_id, j), no UDFs."""
    ef = _emb(spark, sf_dir).select(
        "vec_id", _fixed_vec(F.col("v")).alias("xf")
    )
    signs = spark.range(RP_D_IN * RP_D_OUT).select(
        (F.col("id") % RP_D_IN + 1).cast("int").alias("i"),  # 1-based dim
        (F.col("id") / RP_D_IN).cast("int").alias("j"),
        _rp_sign(F.col("id") % RP_D_IN + 1, (F.col("id") / RP_D_IN).cast("int")).alias("s"),
    )
    exploded = ef.select(
        "vec_id", F.posexplode("xf").alias("i0", "x")
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "x")
    return (
        exploded.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("s") * F.col("x")).alias("proj_fp"))
        .orderBy("vec_id", "j")
    )


RP_SQL = f"""
    WITH signs AS (
        SELECT CAST(i.range AS INT) AS i, CAST(j.range AS INT) AS j,
               CASE WHEN substr(md5('rp|' || CAST(i.range AS VARCHAR)
                                 || '|' || CAST(j.range AS VARCHAR)), 32, 1)
                         IN ('1','3','5','7','9','b','d','f')
                    THEN -1 ELSE 1 END AS s
        FROM range(1, {RP_D_IN} + 1) i, range(0, {RP_D_OUT}) j
    ),
    exploded AS (
        SELECT vec_id, CAST(i AS INT) AS i,
               CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
                   AS x
        FROM (
            SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        )
    )
    SELECT vec_id, j,
           CAST(sum(s * x) AS BIGINT) AS proj_fp
    FROM exploded JOIN signs USING (i)
    GROUP BY vec_id, j
    ORDER BY vec_id, j
"""


QUERIES = {
    "ann_cosine_topk": (ann_cosine_topk, ANN_COSINE_SQL),
    "embed_random_projection": (embed_random_projection, RP_SQL),
    "ann_lsh_buckets": (ann_lsh_buckets, ANN_LSH_SQL),
    "ann_ivf_assign": (ann_ivf_assign, ANN_IVF_SQL),
    "ann_kmeans_train": (ann_kmeans_train, KMEANS_SQL),
    "dedup_semantic": (dedup_semantic, SEMDEDUP_SQL),
    "cluster_balanced_sample": (cluster_balanced_sample, CLUSTER_SAMPLE_SQL),
    "ann_pq_encode": (ann_pq_encode, ANN_PQ_ENCODE_SQL),
    "ann_pq_search": (ann_pq_search, ANN_PQ_SEARCH_SQL),
    "ann_pq_rerank": (ann_pq_rerank, ANN_PQ_RERANK_SQL),
    "ann_ivfpq_search": (ann_ivfpq_search, ANN_IVFPQ_SQL),
    "ann_recall_ivfpq": (ann_recall_ivfpq, ANN_RECALL_IVFPQ_SQL),
    "ann_ivf_search": (ann_ivf_search, ANN_IVF_SEARCH_SQL),
    "ann_ivf_search_multiprobe": (
        ann_ivf_search_multiprobe,
        ANN_IVF_MULTIPROBE_SQL,
    ),
    "embedding_knn_join": (embedding_knn_join, EMBEDDING_KNN_SQL),
    "dedup_embedding_cosine": (dedup_embedding_cosine, DEDUP_COSINE_SQL),
    "hard_negative_mining": (hard_negative_mining, HARD_NEGATIVE_SQL),
    "embedding_cluster_purity": (embedding_cluster_purity, CLUSTER_PURITY_SQL),
}
