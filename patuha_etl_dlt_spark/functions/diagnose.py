"""Problematic-row diagnosis + quarantine — the reference's debug bisector
re-expressed as a distributed plan.

Reference: ``/root/reference/source/data_processing.py:124-190``
(``debug_problematic_rows``) pulls rows one by one over a connection,
tries ``orjson.dumps`` per column, and reports the first row whose values
stay broken after sanitization; ``:246-256`` hex-dumps offending bytes.
That row-loop shape cannot exist at 10^10 rows — here the same checks run
as native column predicates over the WHOLE input in one pass:

- ``diagnose_rows``: one output row per (input row, problematic column)
  with the problem kind and a hex preview of the value — the reference's
  ``problematic_columns`` dict, as a DataFrame.
- ``split_quarantine``: (clean, quarantined) — rows the sanitizers can fix
  stay in ``clean`` (they are fixed downstream by ``sanitize_columns``);
  rows with *fatal* problems (NULL merge key — nothing to merge on) are
  quarantined with a ``_reject_reason``, the poison-pill pattern for
  exactly-once pipelines (a bad record must not kill or stall the batch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from patuha_etl_dlt_spark.functions.sanitize import MAX_STRING_BYTES


def hex_preview(c: Column, n_bytes: int = 32) -> Column:
    """F12: hex dump of (the first ``n_bytes`` of) a binary/string value —
    the reference's debug hex dump (``data_processing.py:246-256``)."""
    return F.hex(F.substring(c.cast("binary"), 1, n_bytes))


def _column_checks(df: DataFrame, exclude: tuple[str, ...] = ()) -> list[tuple[str, Column, Column]]:
    """(column, problem-kind, is-problem) per sanitizer-relevant column —
    the same conditions ``sanitize_columns`` repairs, as detectors."""
    checks: list[tuple[str, Column, Column]] = []
    for fld in df.schema.fields:
        if fld.name in exclude:
            continue
        c = F.col(fld.name)
        if isinstance(fld.dataType, T.StringType):
            checks.append((fld.name, F.lit("nul_byte"), c.contains("\x00")))
            checks.append((fld.name, F.lit("oversize"), F.length(c) > MAX_STRING_BYTES))
        elif isinstance(fld.dataType, T.TimestampType):
            checks.append((fld.name, F.lit("zero_date"), F.year(c) < 1))
        elif isinstance(fld.dataType, (T.DoubleType, T.FloatType)):
            checks.append((fld.name, F.lit("nan_or_inf"), F.isnan(c) | (F.abs(c) == float("inf"))))
    return checks


def diagnose_rows(df: DataFrame, id_cols: list[str], exclude: tuple[str, ...] = ()) -> DataFrame:
    """One row per (input row, problematic column): (id…, column, problem,
    value_hex). Single scan, native predicates — no driver row loop."""
    checks = _column_checks(df, exclude)
    if not checks:
        return df.sparkSession.createDataFrame(
            [], ", ".join(f"{c} string" for c in id_cols) + ", column string, problem string, value_hex string"
        )
    probs = F.array(
        *[
            F.when(
                F.coalesce(cond, F.lit(False)),
                F.struct(
                    F.lit(name).alias("column"),
                    kind.alias("problem"),
                    # non-binary types hex their string rendering (a
                    # timestamp cannot cast to binary directly)
                    hex_preview(F.col(name).cast("string")).alias("value_hex"),
                ),
            )
            for name, kind, cond in checks
        ]
    )
    return (
        df.select(*id_cols, F.explode(F.filter(probs, lambda x: x.isNotNull())).alias("p"))
        .select(*id_cols, "p.column", "p.problem", "p.value_hex")
    )


def split_quarantine(df: DataFrame, key_cols: list[str]) -> tuple[DataFrame, DataFrame]:
    """Split a batch into (clean, quarantined). Fatal = any NULL merge-key
    component: such rows cannot be merged and would otherwise be silently
    dropped; they come back with ``_reject_reason`` so the caller can land
    them in a dead-letter table. Everything else is clean — sanitizers
    repair it downstream."""
    fatal = F.lit(False)
    for k in key_cols:
        fatal = fatal | F.col(k).isNull()
    clean = df.filter(~fatal)
    bad = df.filter(fatal).withColumn(
        "_reject_reason",
        F.concat_ws(
            ",",
            *[F.when(F.col(k).isNull(), F.lit(f"null_key:{k}")) for k in key_cols],
        ),
    )
    return clean, bad
