"""File sources with permissive bad-record handling (S7-S9, S14).

Reference: the file-staging loaders — chunked Parquet/JSONL/CSV readers
with per-line bad-record skip (``pipeline_management.py:1752-1810``) and
staging cleanup (``:1864-1873``). In Spark, "chunking" is partitioning and
bad-record tolerance is the PERMISSIVE mode with ``_corrupt_record``; the
whole custom loader collapses into ``spark.read`` options.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    drop_corrupt: bool = True,
) -> DataFrame:
    """JSON-lines with bad-record skip (reference skips unparseable lines
    one by one, ``pipeline_management.py:1771-1798``)."""
    if schema is not None:
        schema = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    r = spark.read.option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", CORRUPT_COL)
    if schema is not None:
        r = r.schema(schema)
    df = r.json(path)
    if drop_corrupt and CORRUPT_COL in df.columns:
        df = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    drop_corrupt: bool = True,
) -> DataFrame:
    if schema is not None:
        schema = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    r = (
        spark.read.option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if schema is not None:
        r = r.schema(schema)
    df = r.csv(path)
    if drop_corrupt and CORRUPT_COL in df.columns:
        df = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return df


def cleanup_staging(path: str) -> None:
    """Delete a staging directory after load (S14,
    ``pipeline_management.py:1864-1873``)."""
    shutil.rmtree(path, ignore_errors=True)
