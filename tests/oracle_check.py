"""Local replica of the driver's correctness gate: run a Spark query and
its DuckDB oracle on the same parquet tables, compare row count, column
names, and order-insensitive values."""

from __future__ import annotations

import decimal
import math

import duckdb
import numpy as np

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    """Dtype-STRICT normalization mirroring the driver's value hash: an
    int64 5 and a float64 5.0 stringify differently there (the round-1
    hash mismatches were all DuckDB HUGEINT sums surfacing as float64), so
    ints and floats must not compare equal here either."""
    if v is None:
        return "\x00:null"  # sortable sentinel (None < str comparisons fail)
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NaN"
        return "f:" + repr(round(float(v), 9))
    if isinstance(v, (bool, np.bool_)):
        return "b:" + repr(bool(v))
    if isinstance(v, (int, np.integer)):
        return "i:" + repr(int(v))
    if isinstance(v, decimal.Decimal):
        return "f:" + repr(round(float(v), 9))
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, con, sql: str):
    """Return (ok, message). Columns sorted by name; rows sorted."""
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    sp_cols, du_cols = sorted(sp.columns), sorted(du.columns)
    if sp_cols != du_cols:
        return False, f"columns differ: spark={sp_cols} duck={du_cols}"
    if len(sp) != len(du):
        return False, f"row count differs: spark={len(sp)} duck={len(du)}"
    sp_rows = sorted(
        tuple(_norm(v) for v in row) for row in sp[sp_cols].itertuples(index=False)
    )
    du_rows = sorted(
        tuple(_norm(v) for v in row) for row in du[du_cols].itertuples(index=False)
    )
    if sp_rows != du_rows:
        for a, b in zip(sp_rows, du_rows):
            if a != b:
                return False, f"value mismatch:\n  spark={a}\n  duck ={b}"
        return False, "value mismatch (tail)"
    return True, f"ok ({len(sp)} rows)"
