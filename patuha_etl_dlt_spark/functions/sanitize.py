"""Value sanitizers — native-column re-expression of the reference's
per-row Python sanitizer (``/root/reference/source/data_processing.py:43-110``,
operators F2-F7 in SURVEY.md §2.8).

Everything here is built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_STRING_BYTES = 1_048_576  # 1 MB truncation threshold (data_processing.py:85-87)
TRUNCATION_MARKER = "...[TRUNCATED]"


def clean_string(c: Column) -> Column:
    """F2 (empty/whitespace → NULL), F3 (NUL-byte strip), F7 (>1 MB truncate
    + marker). Matches data_processing.py:61-87 semantics."""
    stripped = F.regexp_replace(c, "\x00", "")
    truncated = F.when(
        F.length(stripped) > MAX_STRING_BYTES,
        F.concat(F.substring(stripped, 1, MAX_STRING_BYTES), F.lit(TRUNCATION_MARKER)),
    ).otherwise(stripped)
    return F.when(F.trim(truncated) == "", F.lit(None)).otherwise(truncated)


def clean_timestamp(c: Column) -> Column:
    """F4/F5 (zero dates → NULL): MySQL `0000-00-00` parses as year ≤ 0 or
    fails; anything with year < 1 is nulled (data_processing.py:76-92)."""
    return F.when(F.year(c) < 1, F.lit(None)).otherwise(c)


def localize_naive_timestamp(c: Column, tz: str = "Asia/Bangkok") -> Column:
    """F9: interpret a tz-naive timestamp column as wall-clock time in
    ``tz`` and convert to UTC for storage — the reference's pytz
    ``localize``/pendulum ``in_tz`` ingest fix for tz-naive MySQL data
    (pipeline_management.py:634-722, default GMT+7 Asia/Bangkok)."""
    return F.to_utc_timestamp(c, tz)


def parse_iso_timestamp(c: Column, default_tz: str | None = None) -> Column:
    """F10: ISO-8601 string → timestamp (pipeline_management.py:804-812,
    ``datetime.fromisoformat(s.replace('Z', '+00:00'))`` with None on
    parse failure). 'Z'/numeric offsets are honored; unparseable strings
    become NULL (never throw — ANSI-safe ``try_cast``). When
    ``default_tz`` is given, offset-less strings are interpreted as
    wall-clock time in that zone (the reference's naive→GMT+7 rule);
    otherwise they are taken in the session timezone (UTC here)."""
    ts = c.cast("string").try_cast("timestamp")
    if default_tz is None:
        return ts
    has_offset = c.cast("string").rlike(r"(Z|[+-]\d{2}:?\d{2})$")
    return F.when(has_offset, ts).otherwise(F.to_utc_timestamp(ts, default_tz))


def nan_inf_to_null(c: Column) -> Column:
    """F6: NaN/±Inf → NULL (data_processing.py:95-98)."""
    return F.when(F.isnan(c) | (F.abs(c) == float("inf")), F.lit(None)).otherwise(c)


def sanitize_columns(df: DataFrame, exclude: tuple[str, ...] = ()) -> DataFrame:
    """Apply type-appropriate sanitizers to every column (schema-driven, not
    name-driven — improving on the reference's `_at`/`_date` column-name
    heuristic, data_processing.py:76-82)."""
    out = []
    for f in df.schema.fields:
        col = F.col(f.name)
        if f.name in exclude:
            out.append(col)
        elif isinstance(f.dataType, T.StringType):
            out.append(clean_string(col).alias(f.name))
        elif isinstance(f.dataType, T.TimestampType):
            out.append(clean_timestamp(col).alias(f.name))
        elif isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            out.append(nan_inf_to_null(col).alias(f.name))
        else:
            out.append(col)
    return df.select(*out)
