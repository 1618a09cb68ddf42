"""Serialization (S7): JSON round-trip of table rows and golden ingest.

The reference serializes CroppedTable/FormattedTable as JSON dicts
(/root/reference/gmft/detectors/base.py:303-351,
gmft/formatters/tatr.py:188-228, gmft/core/io/serial/dicts.py:15-68). In
Spark the same shape is a struct column: ``to_json``/``from_json`` give
lossless round-trips, and the golden-fixture files (serialized raw
predictions keyed by table) load straight into a predictions DataFrame.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

TABLE_DICT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("table_id", IntegerType()),
        StructField("bbox", ArrayType(DoubleType())),
        StructField("confidence_score", DoubleType()),
        StructField("label", IntegerType()),
        StructField("angle", IntegerType()),
        StructField("csv", StringType()),
        StructField("outliers", StringType()),  # json-encoded map
    ]
)


def results_to_json(results: DataFrame) -> DataFrame:
    """Serialize extraction-result rows to one JSON string per table
    (analog of FormattedTable.to_dict)."""
    payload = F.to_json(
        F.struct(
            "conv_id",
            "turn_idx",
            "table_id",
            "status",
            "csv",
            "n_rows",
            "n_cols",
            "columns",
            "top_header",
            "projecting",
            "hier_left",
            "outliers",
        )
    )
    return results.select(
        "conv_id", "turn_idx", "table_id", payload.alias("json")
    )


RESULT_JSON_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("table_id", IntegerType()),
        StructField("status", StringType()),
        StructField("csv", StringType()),
        StructField("n_rows", IntegerType()),
        StructField("n_cols", IntegerType()),
        StructField("columns", ArrayType(StringType())),
        StructField("top_header", ArrayType(IntegerType())),
        StructField("projecting", ArrayType(IntegerType())),
        StructField("hier_left", ArrayType(IntegerType())),
        StructField("outliers", MapType(StringType(), StringType())),
    ]
)


def results_from_json(serialized: DataFrame) -> DataFrame:
    """Inverse of results_to_json (analog of from_dict)."""
    return serialized.select(
        F.from_json("json", RESULT_JSON_SCHEMA).alias("t")
    ).select("t.*")


# -------------------------------------------------- golden-fixture ingest --

REFERENCE_TABLES_JSON = "/root/reference/data/test/references/tatr_tables.json"


def load_reference_predictions(
    spark: SparkSession, path: str = REFERENCE_TABLES_JSON
) -> DataFrame | None:
    """Ingest the reference's serialized golden tables (40 tables of raw
    TATR predictions) into an exploded predictions DataFrame
    ``(key, pred_idx, score, label, x0, y0, x1, y1, table_bbox)``.
    Returns None when the fixture file isn't present (standalone repos)."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        goldens = json.load(f)
    rows = []
    for key, d in goldens.items():
        fr = d.get("fctn_results")
        if not fr:
            continue
        bbox = [float(x) for x in d["bbox"]]
        for i, (s, l, b) in enumerate(
            zip(fr["scores"], fr["labels"], fr["boxes"])
        ):
            rows.append(
                (
                    key,
                    i,
                    float(s),
                    int(l),
                    float(b[0]),
                    float(b[1]),
                    float(b[2]),
                    float(b[3]),
                    bbox,
                )
            )
    schema = StructType(
        [
            StructField("key", StringType()),
            StructField("pred_idx", IntegerType()),
            StructField("score", DoubleType()),
            StructField("label", IntegerType()),
            StructField("x0", DoubleType()),
            StructField("y0", DoubleType()),
            StructField("x1", DoubleType()),
            StructField("y1", DoubleType()),
            StructField("table_bbox", ArrayType(DoubleType())),
        ]
    )
    return spark.createDataFrame(rows, schema)
