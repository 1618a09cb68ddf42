"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship per-turn table-extraction pipeline on
sf0.001; ``queries()`` exposes every implemented operator from SURVEY.md §2
(plus the training-data-pipeline operators); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each query. The extraction pipelines are
value-hash-checked through parity twins (complete CSV, per-table text,
captions, shapes — re-derived independently in SQL from the named scene
draws, gmft_spark/operators/scene_sql.py); the five full-output views stay
rows-only and are pinned byte-exact by the reference's own golden fixtures
in tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gmft_spark import entry as _entry_mod  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _entry_mod.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _entry_mod.queries()


def oracle_sql() -> dict[str, str]:
    return _entry_mod.oracle_sql()
