"""Incrementally-maintained aggregate tables (materialized rollups).

The reference recomputes nothing — its MySQL targets are raw table
mirrors. At 10^10 events, downstream consumers need aggregates (hourly
rollups, per-entity counters) maintained INCREMENTALLY: recomputing a
GROUP BY over the full history per sync cycle is O(history); folding each
micro-batch's partial aggregates into a keyed lake table is O(batch).

Mechanics: the measures are restricted to decomposable aggregates
(sum / count / min / max), whose partials combine associatively. Per
batch:

    partials = delta.groupBy(keys).agg(partial per measure)   -- map-side combined
    touched  = current state semi-joined to the partial keys  -- bucket-pruned read
    next     = (touched ∪ partials).groupBy(keys).agg(combine)
    table.merge(next, batch_id)                               -- LWW upsert

The merge's batch-id idempotence makes the fold exactly-once: a replayed
batch short-circuits BEFORE partials are recombined, so totals can never
double-count (tested). ``_event_id`` carries a monotone fold sequence so
the newest total is always the LWW winner.

Scale shape: one map-side-combined aggregation of the batch plus a merge
touching only the buckets whose groups changed. Group cardinality (e.g.
hours × event types) is tiny relative to events, so the state read is a
few small files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from patuha_etl_dlt_spark.lake import LakeTable

# measure kind -> (partial aggregate over raw rows, combine over partials)
_KINDS = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),  # partial counts combine by SUM
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


class IncrementalRollup:
    """Maintain ``table`` as `groupBy(group_cols).agg(measures)` of every
    event ever applied, folded batch-at-a-time.

    ``measures``: {out_col: (kind, source_expr, out_type)} with kind in
    sum|count|min|max; ``source_expr`` is a Column or column name;
    ``out_type`` a lake type name (use a decimal type for sums that must
    be exact/associative across fold orders — double addition is not).
    """

    def __init__(self, table: LakeTable, group_cols: list[str], measures: dict):
        self.table = table
        self.group_cols = list(group_cols)
        self.measures = measures
        for name, (kind, _, _) in measures.items():
            if kind not in _KINDS:
                raise ValueError(f"{name}: unsupported measure kind {kind!r}")

    @staticmethod
    def create(
        spark,
        root: str,
        group_cols: list[tuple[str, str]],
        measures: dict,
        num_buckets: int = 16,
    ) -> "IncrementalRollup":
        """Create the backing lake table: key = group columns, one column
        per measure, LWW-ordered by the fold sequence."""
        cols = list(group_cols) + [(n, t) for n, (_, _, t) in measures.items()]
        t = LakeTable.create(
            spark,
            root,
            cols,
            key_cols=[c for c, _ in group_cols],
            order_col=None,  # LWW by _event_id = fold sequence
            num_buckets=num_buckets,
        )
        return IncrementalRollup(t, [c for c, _ in group_cols], measures)

    def _partials(self, delta: DataFrame) -> DataFrame:
        aggs = []
        for name, (kind, src, typ) in self.measures.items():
            part, _ = _KINDS[kind]
            col = F.col(src) if isinstance(src, str) else src
            aggs.append(part(col).cast(typ).alias(name))
        return delta.groupBy(*self.group_cols).agg(*aggs)

    def _combine(self, df: DataFrame) -> DataFrame:
        aggs = []
        for name, (kind, _, typ) in self.measures.items():
            _, comb = _KINDS[kind]
            aggs.append(comb(F.col(name)).cast(typ).alias(name))
        return df.groupBy(*self.group_cols).agg(*aggs)

    def apply_batch(self, delta: DataFrame, batch_id: str) -> dict:
        """Fold one micro-batch into the rollup, exactly once."""
        if self.table.has_batch(batch_id):
            return {"skipped": True, "batch_id": batch_id}
        partials = self._partials(delta)
        current = self.table.read().join(
            partials.select(*self.group_cols), self.group_cols, "semi"
        )
        nxt = self._combine(current.unionByName(partials)).withColumn(
            "_event_id", F.lit(self.table.snapshot.version + 1).cast("long")
        )
        return self.table.merge(nxt, batch_id=batch_id, op_col=None)

    def read(self) -> DataFrame:
        return self.table.read()
