"""Pure numpy/pandas extraction kernel — no Spark imports.

Every function here is a plain ``arrays in → arrays out`` computation so it
can be called directly from Arrow batches inside ``mapInPandas`` /
``applyInPandas`` (the production path) and unit-tested without a
SparkSession.
"""

from gmft_spark.kernel.table import extract_table, TableResult  # noqa: F401
from gmft_spark.kernel.text import (  # noqa: F401
    assemble_text,
    infer_line_breaks,
    word_height_estimate,
)
from gmft_spark.kernel.geometry import (  # noqa: F401
    iob,
    iob_matrix,
    select_table_words,
)
