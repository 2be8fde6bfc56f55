"""Scalar/column function library: sanitizers, HTML extraction, text analysis.

All hot-path Python runs as Arrow-vectorized pandas UDFs; everything
expressible in native ``pyspark.sql.functions`` stays JVM-side (the
reference's per-value Python sanitizer loop,
``/root/reference/source/data_processing.py:43-110``, is the anti-pattern
this module replaces — SURVEY.md §2.8)."""

from patuha_etl_dlt_spark.functions.html import extract_text, extract_text_bytes  # noqa: F401
from patuha_etl_dlt_spark.functions.sanitize import (  # noqa: F401
    clean_string,
    clean_timestamp,
    nan_inf_to_null,
    sanitize_columns,
)
