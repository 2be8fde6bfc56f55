"""JDBC source: cursor-windowed incremental reads from a SQL database.

The reference's actual source is MySQL via SQLAlchemy + dlt's
``sql_database`` with an incremental cursor hint
(``/root/reference/source/pipeline_management.py:652``, ``:818``,
``:947-950`` — emits ``WHERE modifier > :last ORDER BY modifier``). The
Spark-native equivalent is the JDBC reader with (a) the cursor predicate
pushed into the remote query and (b) range partitioning over the cursor
column so N executors each pull a slice — replacing the reference's
single-connection serial extract (``config.toml:9-15`` pins dlt to one
worker; Spark's whole point is the opposite).

This sandbox has no database, so the module builds and validates the
reader configuration (unit-testable) and only touches the network when
``.load()`` is called by the caller; the JDBC driver jar requirement is
surfaced as a clear error.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def sql_literal(v) -> str:
    """Render a Python value as a safe SQL literal: numerics unquoted,
    strings single-quoted with embedded quotes doubled (never Python
    ``repr``, whose escapes are invalid SQL and whose quoting turns
    numeric cursors into strings)."""
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


@dataclass(frozen=True)
class JdbcSourceConfig:
    url: str  # jdbc:mysql://host:3306/db
    table: str
    cursor_col: str | None = None  # reference 'modifier'
    last_value: object | None = None  # checkpointed cursor (str | int | float)
    partition_col: str | None = None  # numeric/date col for parallel pull
    lower_bound: str | None = None
    upper_bound: str | None = None
    num_partitions: int = 8
    fetch_size: int = 10_000  # reference chunk size (workflow.md:249-268)
    user: str | None = None
    password: str | None = None
    driver: str | None = None  # JDBC driver class, when not auto-loadable

    def dbtable(self) -> str:
        """Pushed-down incremental extract: the remote DB scans its own
        cursor index, exactly like the reference's dlt-generated query.
        (Alias must not start with '_': Derby and other strict dialects
        reject such unquoted identifiers.)"""
        if self.cursor_col and self.last_value is not None:
            return (
                f"(SELECT * FROM {self.table} "
                f"WHERE {self.cursor_col} > {sql_literal(self.last_value)}) incr_src"
            )
        return self.table

    def reader_options(self) -> dict[str, str]:
        opts = {
            "url": self.url,
            "dbtable": self.dbtable(),
            "fetchsize": str(self.fetch_size),
        }
        if self.partition_col:
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError("partition_col requires lower_bound and upper_bound")
            opts.update(
                partitionColumn=self.partition_col,
                lowerBound=str(self.lower_bound),
                upperBound=str(self.upper_bound),
                numPartitions=str(self.num_partitions),
            )
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        if self.driver:
            opts["driver"] = self.driver
        return opts


def read_jdbc(spark: SparkSession, cfg: JdbcSourceConfig) -> DataFrame:
    """Build the JDBC scan. Raises a clear error if no JDBC driver jar is
    on the classpath (none ships in this sandbox)."""
    return spark.read.format("jdbc").options(**cfg.reader_options()).load()
