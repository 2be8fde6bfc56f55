"""Physical-plan inspection helpers — assert the plan you meant to get.

The reference hand-tunes MySQL physical access (index pre-creation,
``index_management.py:177-231``); the Spark analog is *verifying* that
Catalyst produced the intended physical plan: filters pushed to the
parquet scan, projections pruned, small dims broadcast, no stray
exchanges. Used by tests (tests/test_plans.py) and for ad-hoc tuning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm  # type: ignore[attr-defined]
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)  # type: ignore[attr-defined]


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan carries a pushed filter mentioning
    ``fragment`` (check `.explain` PushedFilters)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols += [c.split(":")[0].strip() for c in inner.split(",") if ":" in c]
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (counts the
    numbered operator detail headers, not the tree rendering)."""
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.M))


def has_partial_aggregation(df: DataFrame) -> bool:
    """True if the plan carries a map-side partial aggregate (partial_*
    before the exchange) — the skew defense for hot keys."""
    return "partial_" in formatted_plan(df)


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)
