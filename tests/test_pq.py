"""Product-quantization structure: full code coverage per vector, code
range, and ADC consistency with the codes' own distances. Cross-engine
value-hash parity is covered by test_oracle_parity (ann_pq_encode /
ann_pq_search registered in similarity.QUERIES)."""

from pyspark.sql import functions as F

from gmft_spark.operators.similarity import (
    PQ_D,
    PQ_K,
    PQ_M,
    ann_pq_encode,
    ann_pq_search,
)

SF_DIR = "/root/testdata/sf0.001"


def test_every_vector_gets_m_codes_in_range(spark):
    assert PQ_M * PQ_D == 64
    codes = ann_pq_encode(spark, SF_DIR)
    n_vecs = codes.select("vec_id").distinct().count()
    assert codes.count() == n_vecs * PQ_M
    bad = codes.filter((F.col("code") < 0) | (F.col("code") >= PQ_K)).count()
    assert bad == 0
    # the codebook's own vectors must encode to themselves at distance 0
    self_hits = (
        codes.filter(F.col("vec_id") < PQ_K)
        .filter((F.col("code") == F.col("vec_id")) & (F.col("dist") == 0))
        .count()
    )
    assert self_hits == PQ_K * PQ_M


def test_adc_search_orders_by_summed_code_distances(spark):
    top = ann_pq_search(spark, SF_DIR).collect()
    assert len(top) == 10
    adcs = [r["adc"] for r in top]
    assert adcs == sorted(adcs)
    assert all(a >= 0 for a in adcs)
