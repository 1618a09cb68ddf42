"""gmft_spark — a from-scratch PySpark-native table-extraction engine.

Re-creates the query/data-processing capabilities of conjuncts/gmft
(deep PDF table extraction: detection → structure recognition → heuristic
post-processing into dataframes) as an idiomatic Spark pipeline over
transcript corpora.

Layout:
  kernel/     pure numpy/pandas extraction semantics (no Spark imports)
  operators/  Spark DataFrame operators (mapInPandas pipeline + relational twins)
  sources/    transcript synthesis, fixture ingest, readers/writers
  plans/      session builder, skew/salting helpers, lineage/checkpointing
  functions/  reusable pyspark.sql column-expression helpers (bbox math etc.)
  streaming/  Structured Streaming variant of the extraction pipeline
"""

__version__ = "0.1.0"
