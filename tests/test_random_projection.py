"""Random projection: the deterministic Rademacher JL transform must
approximately preserve pairwise distances (that is its one job), and the
sign matrix must be a pure function of (i, j)."""

import numpy as np
from pyspark.sql import functions as F

from gmft_spark.operators.similarity import (
    RP_D_IN,
    RP_D_OUT,
    embed_random_projection,
)

SF_DIR = "/root/testdata/sf0.01"


def test_projection_preserves_pairwise_distances(spark):
    proj = (
        embed_random_projection(spark, SF_DIR)
        .groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("j", "proj_fp"))).alias("p"))
        .select(
            "vec_id",
            F.transform("p", lambda e: e["proj_fp"]).alias("v"),
        )
        .limit(40)
        .collect()
    )
    orig = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id").isin([r["vec_id"] for r in proj]))
        .collect()
    }
    # undo the fixed-point and the implicit sqrt(d_out) scale
    pv = {
        r["vec_id"]: np.array(r["v"], dtype=np.float64)
        / 1e6
        / np.sqrt(RP_D_OUT)
        for r in proj
    }
    # the JL guarantee is about DISTANCE RATIOS (this corpus is
    # near-isotropic — pair distances barely vary, so correlation-style
    # checks are noise-dominated by construction)
    ids = sorted(pv)
    ratios = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            d0 = np.sum((orig[ids[a]] - orig[ids[b]]) ** 2)
            if d0 > 0:
                ratios.append(np.sum((pv[ids[a]] - pv[ids[b]]) ** 2) / d0)
    r = np.array(ratios)
    assert 0.7 < np.median(r) < 1.4, f"median ratio {np.median(r):.3f}"
    assert np.percentile(r, 5) > 0.25 and np.percentile(r, 95) < 3.0
    assert len(r) > 500


def test_projection_shape_and_determinism(spark):
    df = embed_random_projection(spark, SF_DIR)
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert df.count() == n_vecs * RP_D_OUT
    one = df.filter("vec_id = 0").collect()
    two = embed_random_projection(spark, SF_DIR).filter("vec_id = 0").collect()
    assert one == two and len(one) == RP_D_OUT
    assert RP_D_IN == 64  # pinned to the corpus embedding dimension
