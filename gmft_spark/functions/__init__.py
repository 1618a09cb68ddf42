from gmft_spark.functions.bbox import (  # noqa: F401
    intersects,
    iob_expr,
    overlap_1d,
)
