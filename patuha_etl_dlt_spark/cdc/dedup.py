"""Last-writer-wins deduplication per key — three interchangeable plans.

Reference analog: dlt's PK merge replaces target rows on key match in
arrival order (``/root/reference/source/pipeline_management.py:851``,
``workflow.md:50-72``) — nondeterministic when one batch holds several
updates to a key. We make it deterministic: the winner per key is the
event with the greatest ``(order_col, lsn)``; ``lsn`` is unique, so the
order is total (SURVEY.md §2.5).

Three physical strategies, same semantics:

- ``lww_window``   — ``row_number() OVER (PARTITION BY key ORDER BY ... DESC)``.
  The textbook plan; requires a full sort of each key partition and has
  no map-side combine, so a hot key serializes into one task.
- ``lww_agg``      — ``groupBy(key).agg(max_by(payload, order))``. Partial
  aggregation collapses duplicates map-side: a key with 10^6 events ships
  ~1 row per input partition through the shuffle. **Default.**
- ``lww_salted``   — explicit two-phase reduction for window-shaped plans:
  phase 1 reduces within (key, salt), phase 2 across salts. Defeats skew
  where a window is otherwise required (e.g. when you must keep the
  full winning row without restructuring). North-rule requirement.
- ``lww_semijoin`` — winners WITHOUT moving the payload: a column-pruned
  aggregation finds each key's winning (order, lsn) coordinate, then a
  broadcast LEFT SEMI join keeps the winning rows map-side. The heavy
  columns (KB-size html/text) never enter a shuffle — the dominant
  data-movement term of a web-page CDC batch disappears. Requires the
  winner set to fit a broadcast and ``(key, order, lsn)`` to be unique
  per event (true by construction for binlog/WAL/Kafka feeds: the LSN is
  a log position). The engine auto-selects it for small-enough batches in
  global-overlay mode (see ``EngineConfig.lww_strategy``).

Skew rationale follows "Rock you like a hurricane: taming skew in large
scale analytics" (EuroSys 2018 — PAPERS.md): repartition the hot key's
work, aggregate partially, recombine; AQE's skew-join handling covers the
join-side analog (session default on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _order_cols_desc(order_cols: list[str]):
    return [F.col(c).desc_nulls_last() for c in order_cols]


def lww_window(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """One row per key: greatest (order_cols) wins. Window/row_number plan."""
    w = Window.partitionBy(*key_cols).orderBy(*_order_cols_desc(order_cols))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def lww_agg(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """One row per key via max_by aggregation (map-side partial agg →
    skew-resistant). Column order of the result matches ``df``."""
    payload = [c for c in df.columns if c not in key_cols]
    order = F.struct(*[F.col(c) for c in order_cols])
    out = (
        df.groupBy(*key_cols)
        .agg(F.max_by(F.struct(*payload), order).alias("_w"))
        .select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])
    )
    return out.select(*df.columns)


def lww_semijoin(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """One row per key WITHOUT shuffling the payload: the winner
    coordinate per key comes from a column-pruned aggregation (Catalyst
    reads only key+order columns from the scan — on a parquet-staged
    web-page feed that is a few narrow columns instead of the KB-size
    html/text payload), broadcast back as a LEFT SEMI join, so winning
    rows are selected map-side in the scan stage.

    Winner selection matches ``lww_agg`` exactly: greatest
    ``struct(order_cols)``, with SQL semantics ordering NULL fields first
    (a NULL order loses to any value). Join equality is null-safe so a
    winner with a NULL order column still matches its own row.

    Preconditions (caller-checked): the winner set must fit a broadcast
    (engine caps via ``lww_broadcast_max_keys``), and ``(key, order_cols)``
    must be unique per event — true by construction for binlog/WAL/Kafka
    feeds where the last order col is a log position. A duplicated
    coordinate keeps both rows (the global-overlay read path LWW-resolves
    them; identical replayed payloads are indistinguishable anyway).
    """
    from functools import reduce as _reduce

    win = (
        df.groupBy(*key_cols)
        .agg(F.max(F.struct(*[F.col(c).alias(c) for c in order_cols])).alias("_w"))
        .select(
            *[F.col(k).alias(f"_lk_{i}") for i, k in enumerate(key_cols)],
            *[F.col(f"_w.{c}").alias(f"_lo_{j}") for j, c in enumerate(order_cols)],
        )
    )
    cond = _reduce(
        lambda a, b: a & b,
        [df[k].eqNullSafe(win[f"_lk_{i}"]) for i, k in enumerate(key_cols)]
        + [df[c].eqNullSafe(win[f"_lo_{j}"]) for j, c in enumerate(order_cols)],
    )
    return df.join(F.broadcast(win), cond, "left_semi")


def lww_salted(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    n_salt: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase windowed LWW with salting for hot keys.

    Phase 1 partitions by (key, salt) — a hot key's events spread over
    ``n_salt`` tasks, each reducing its shard to one candidate. Phase 2
    reduces the ≤``n_salt`` candidates per key. The salt derives from a
    per-event column (default: the last order col, i.e. the LSN) so it is
    deterministic; it must partition *within* a key only — the final
    reduction regroups by the bare key (SURVEY.md §7 "hard parts").
    """
    salt_src = salt_on or order_cols[-1]
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salt)))
    w1 = Window.partitionBy(*key_cols, "_salt").orderBy(*_order_cols_desc(order_cols))
    phase1 = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_salt")
    )
    return lww_window(phase1, key_cols, order_cols)
