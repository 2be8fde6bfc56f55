"""CdcEngine — the per-batch apply pipeline and the continuous driver loop.

One micro-batch apply (the reference's ``process_incremental_table``,
``/root/reference/source/pipeline_management.py:605-1223``, collapsed into
one declarative plan):

    events ──filter(lsn > offsets[partition])──► sanitize (native cols)
          ──extract text (Arrow pandas UDF)──► evolve schema (metadata ops)
          ──LWW MERGE into LakeTable (batch_id-idempotent)
          ──commit per-partition offsets + metrics to CheckpointStore

Exactly-once across the two writes (MERGE, then offsets — "two writes, one
logical commit", SURVEY.md §7): the MERGE snapshot records the batch id;
on restart, an already-merged batch skips the MERGE and just re-commits
offsets, so any crash point converges.

Scale shape of one batch: the only wide operation is the single groupBy
inside ``LakeTable.merge`` (map-side-combined ``max_by``). The offsets
aggregation is per feed partition (thousands of groups, trivially small);
the offset *filter* is a broadcast join against a few-thousand-row map.
Nothing collects event data to the driver.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from patuha_etl_dlt_spark.cdc import evolution
from patuha_etl_dlt_spark.cdc.checkpoint import CheckpointStore
from patuha_etl_dlt_spark.cdc.dedup import lww_agg, lww_semijoin
from patuha_etl_dlt_spark.functions.html import with_extracted_text
from patuha_etl_dlt_spark.functions.sanitize import sanitize_columns
from patuha_etl_dlt_spark.lake.table import SYS_EVENT, LakeTable


# offsets maps up to this size inline as a literal map expression in the
# batch filter; larger maps use a broadcast join (see _filter_new)
_MAX_LITERAL_OFFSETS = 1024


@dataclass
class EngineConfig:
    lsn_col: str = "lsn"
    op_col: str = "op"
    partition_col: str = "partition_id"
    schema_col: str = "schema_json"
    html_col: str = "html"
    text_col: str = "text"
    extract_text: bool = True
    sanitize: bool = True
    # 'mor' appends batch-reduced overlay files (write cost O(delta));
    # 'cow' rewrites touched buckets (read-optimal). See LakeTable.merge.
    merge_mode: str = "mor"
    # mor overlay layout: 'bucket' (one file per touched bucket — sharp
    # bucket-pruned reads) or 'global' (plain coalesced files, bucket=-1 —
    # write cost independent of num_buckets; the small-batch/low-traffic-
    # table fast path, folded back to bucketed files on the compaction
    # cadence). See LakeTable.merge.
    overlay: str = "bucket"
    # fold merge-on-read overlays into base files every N batches
    # (reference hygiene analog: staging truncation each cycle,
    # pipeline_management.py:1106-1120). None = caller-managed.
    compact_every: int | None = 8
    # on the compaction cadence, also drop snapshot manifests (and data
    # files no kept snapshot references) beyond the last K — bounds
    # metadata-directory growth on long-running feeds (Iceberg
    # expire_snapshots analog). None = keep full history (time travel).
    expire_snapshots_keep: int | None = None
    # on the compaction cadence, purge tombstones every feed partition has
    # passed (event id < min(checkpointed offsets)) from the buckets being
    # rewritten anyway — opportunistic, O(0) extra I/O. SAFETY: the purge
    # only fires when the table's primary LWW order column IS the LSN
    # (order_col=None at create time ⇒ order_cols[0] == _event_id). Under
    # any other order column the horizon is NOT sufficient: a future event
    # with lsn above the horizon but an older/NULL order value would have
    # LOST the LWW race to the purged tombstone (key stays deleted), and
    # purging would silently resurrect it — the engine does not require
    # order_col to be monotone in LSN, so it cannot assume it. Tables
    # ordered by a business column keep their tombstones until the
    # operator calls compact_tombstones() with a horizon they can vouch
    # for. Replay safety on the LSN-ordered path: the offset filter drops
    # any replayed event at or below the horizon, and every future event
    # outranks the purged tombstone by LSN.
    gc_tombstones: bool = True
    # Reduce the batch to one winner per key BEFORE text extraction: the
    # pandas UDF then (a) runs post-shuffle, so its parallelism is
    # spark.sql.shuffle.partitions instead of the input-split count — on a
    # compressed feed a 200 MB batch is ~2 splits, which starves a 32-core
    # executor — and (b) touches only winning rows (under duplication
    # ratio D, a D× saving). Extraction is a pure function of html, so
    # winner-then-extract ≡ extract-then-winner.
    pre_reduce: bool = True
    # HOW the pre-reduce moves data. 'shuffle' = lww_agg (one wide
    # exchange of the full payload — also what bucket-aligns the rows, so
    # it does double duty for bucketed overlay writes). 'broadcast' =
    # lww_semijoin: winner coordinates from a column-pruned scan,
    # broadcast LEFT SEMI back — the KB-size html/text payload never
    # enters a shuffle OR an aggregation buffer. Only sound when the
    # write needs no bucket alignment (mor + global overlay) and the
    # winner set fits a broadcast.
    #
    # Which is faster is payload-width-dependent (interleaved A/B,
    # 300k-event batches, BASELINE.md round 5): at ~8.5 KB pages the
    # shuffle plan wins at high core counts (its post-shuffle AQE-packed
    # partitions feed the extraction UDF better) and the exchange is
    # cheap; at ~17 KB pages the shuffle plan's max_by buffers the full
    # struct per key and collapses (19-75 s vs broadcast's stable 12.5 s
    # at 16 cores). 'auto' therefore picks broadcast when the batch is
    # eligible AND (a) the row count — known up front on the discovery
    # path, via ``approx_rows``, or bounded from above by the
    # checkpointed-offset gap — stays within lww_broadcast_max_keys, and (b)
    # the MEASURED on-disk bytes/row of the previous merge's own files
    # is at or above lww_broadcast_row_bytes (heavy payloads). The first
    # batch of a fresh engine has no measurement and takes the
    # always-safe shuffle plan; anything unknown likewise.
    lww_strategy: str = "auto"
    # broadcast-path cap: winner rows ≤ this (~100 MB driver/executor
    # footprint at web-page key sizes). A backlog catch-up batch beyond it
    # auto-falls back to the shuffle plan.
    lww_broadcast_max_keys: int = 1_000_000
    # 'auto' payload-width gate, in MEASURED on-disk bytes per written
    # row (LakeTable.merge stats its own files — snappy-compressed,
    # extracted text included): the crossover sits between the measured
    # ~1.4 KB/row of 8.5 KB pages (shuffle wins) and ~2.7 KB/row of
    # 17 KB pages (broadcast wins decisively). 0 = ignore width, decide
    # on rows alone.
    lww_broadcast_row_bytes: int = 2_000
    # columns never sanitized: merge keys (null keys are dropped with a
    # metric, not coerced) and extracted text (byte-identity contract)
    sanitize_exclude: tuple[str, ...] = ()
    # dead-letter directory: rows with fatal problems (NULL merge-key
    # components — nothing to merge on) are appended there as parquet with
    # _reject_reason and _batch_id instead of being silently dropped (the
    # poison-pill pattern; reference analog: the problematic-row debugger,
    # data_processing.py:124-190). None = off (rows still dropped safely
    # by the merge's null-key filter).
    quarantine_dir: str | None = None


class CdcEngine:
    def __init__(self, table: LakeTable, checkpoints: CheckpointStore, config: EngineConfig | None = None):
        self.table = table
        self.cp = checkpoints
        self.cfg = config or EngineConfig()
        self._n_batches: int | None = None  # compaction cadence counter
        # last batch's observed event count — the 'auto' LWW strategy's
        # fallback size estimate when the source doesn't know its own
        # poll size (steady-state feeds have stable batch shapes)
        self._last_events_applied: int | None = None
        # measured on-disk bytes/row from the previous merge's own files
        # (stat'd by LakeTable.merge): preferred width signal for the
        # 'auto' LWW gate — Catalyst's estimate overstates width when a
        # non-pushable filter (the literal-map offset predicate) carries
        # no selectivity
        self._last_row_bytes: float | None = None

    # ------------------------------------------------------------ plumbing

    def _filter_new(self, events: DataFrame) -> DataFrame:
        """Drop events at or below the checkpointed per-partition offset —
        the reference's cursor predicate ``WHERE modifier > :ts``
        (pipeline_management.py:149) generalized to per-partition LSNs.

        Small offset maps (the common case — one entry per feed partition)
        inline as a LITERAL map expression: the lookup compiles into the
        scan stage's codegen, costing zero driver→JVM DataFrame round
        trips and no broadcast exchange per batch (both were a measurable
        slice of the per-batch fixed term that caps N→4N scaling on small
        batches). Beyond ``_MAX_LITERAL_OFFSETS`` entries it falls back to
        the broadcast join (a giant literal expression would bloat the
        plan instead)."""
        offsets = self.cp.offsets()
        if not offsets:
            return events
        if len(offsets) <= _MAX_LITERAL_OFFSETS:
            # explicit casts: lit() of a python int picks int vs long by
            # magnitude, and create_map demands uniform key/value types
            omap = F.create_map(
                *[
                    c
                    for p, l in sorted(offsets.items())
                    for c in (F.lit(int(p)).cast("long"), F.lit(int(l)).cast("long"))
                ]
            )
            return events.filter(
                F.col(self.cfg.lsn_col)
                > F.coalesce(
                    omap[F.col(self.cfg.partition_col).cast("long")], F.lit(-1).cast("long")
                )
            )
        spark = events.sparkSession
        odf = spark.createDataFrame(
            [(int(p), int(l)) for p, l in offsets.items()],
            f"{self.cfg.partition_col} int, _offset long",
        )
        return (
            events.join(F.broadcast(odf), self.cfg.partition_col, "left")
            .filter(F.col(self.cfg.lsn_col) > F.coalesce(F.col("_offset"), F.lit(-1)))
            .drop("_offset")
        )

    def _offsets_and_counts(self, events: DataFrame) -> tuple[dict[int, int], dict, list[str]]:
        """Per-partition max LSN + batch counts + distinct envelope schema
        descriptors — ONE column-pruned pass (reads only
        partition_id/lsn/op/schema_json; Catalyst prunes the heavy payload
        columns out of the scan, and partial aggregation keeps the
        collect_set tiny — a handful of distinct descriptors per batch)."""
        cfg = self.cfg
        op = (
            F.upper(F.col(cfg.op_col))
            if cfg.op_col in events.columns
            else F.lit("U")
        )
        schema = (
            F.col(cfg.schema_col) if cfg.schema_col in events.columns else F.lit(None).cast("string")
        )
        rows = (
            events.groupBy(cfg.partition_col)
            .agg(
                F.max(cfg.lsn_col).alias("m"),
                F.count(F.lit(1)).alias("n"),
                F.sum((op == "D").cast("long")).alias("d"),
                F.collect_set(schema).alias("s"),
            )
            .collect()
        )
        offsets = {int(r[0]): int(r[1]) for r in rows}
        counts = {
            "events_applied": int(sum(r[2] for r in rows)),
            "delete_events": int(sum(r[3] for r in rows)),
        }
        descriptors = sorted({d for r in rows for d in r[3 + 1] if d})
        return offsets, counts, descriptors

    def _quarantine(self, df: DataFrame, batch_id: str | None) -> tuple[DataFrame, int]:
        """Split fatally-broken rows into the dead-letter dir; returns the
        clean rows and the quarantined count. Exactly ONE extra job per
        batch — opt-in via ``quarantine_dir``.

        Replay-idempotent: each batch overwrites its own partition
        directory (``_batch_id=<id>/``), so a crash or foreachBatch retry
        between the dead-letter write and the MERGE commit re-writes the
        same rows instead of appending duplicates. The count comes from an
        Observation on the same write (no separate count() job); a batch
        with zero bad rows removes its (empty) directory again so a clean
        long-running feed doesn't accrete one empty dir per batch.

        Layout note: the dead-letter dir is Hive-partitioned on
        ``_batch_id`` (read the ROOT with ``spark.read.parquet(dir)`` and
        the batch id appears as a partition column). Quarantine dirs
        written before this layout (files carrying an appended ``_batch_id``
        data column at the root) are not mixable with it — point new runs
        at a fresh ``quarantine_dir``."""
        import shutil

        from patuha_etl_dlt_spark.functions.diagnose import split_quarantine

        keys = self.table.snapshot.key_cols
        clean, bad = split_quarantine(df, keys)
        obs = Observation()
        out = bad.observe(obs, F.count(F.lit(1)).alias("n_bad"))
        bdir = os.path.join(self.cfg.quarantine_dir, f"_batch_id={batch_id}")
        out.write.mode("overwrite").parquet(bdir)
        n_bad = int(obs.get["n_bad"] or 0)
        if n_bad == 0:
            shutil.rmtree(bdir, ignore_errors=True)
        return clean, n_bad

    def _lww_use_broadcast(self, known_rows: int | None) -> bool:
        """Decide the pre-reduce plan (see EngineConfig.lww_strategy)."""
        cfg = self.cfg
        if cfg.lww_strategy == "shuffle":
            return False
        if not (cfg.merge_mode == "mor" and cfg.overlay == "global"):
            # bucketed writes need the shuffle anyway (it bucket-aligns)
            return False
        if cfg.lww_strategy == "broadcast":
            return True
        if cfg.lww_strategy != "auto":
            raise ValueError(f"unknown lww_strategy: {cfg.lww_strategy!r}")
        if known_rows is not None:
            rows = known_rows
        else:
            # no sound size bound for this batch (fresh engine on the
            # offset-less path, or a caller that knows neither poll size
            # nor offsets): the always-safe shuffle plan. A prior-batch
            # estimate was used here once (last_applied × 2) and rejected:
            # a backlog catch-up batch far beyond steady state would
            # silently take the broadcast plan and risk failing the job on
            # the broadcast size cap — apply_batch instead derives a SOUND
            # upper bound from the checkpointed-offset gap when the source
            # reports offsets (LSNs are unique, so per-partition
            # new − committed bounds the batch's row count from above).
            return False
        if rows > cfg.lww_broadcast_max_keys:
            return False
        if not cfg.lww_broadcast_row_bytes:
            return True
        # width signal: measured bytes/row from the previous merge's own
        # written files — one unit system, stat'd by the engine itself.
        # (A Catalyst sizeInBytes estimate was tried and rejected: it
        # overstates width whenever a non-pushable filter — the
        # literal-map offset predicate — carries no selectivity, and its
        # units don't line up with the measured threshold.) No
        # measurement yet (first batch of a fresh engine) → the
        # always-safe shuffle plan.
        if self._last_row_bytes is None:
            return False
        return self._last_row_bytes >= cfg.lww_broadcast_row_bytes

    def _prepare_delta(
        self, events: DataFrame, renames: list, use_broadcast_lww: bool = False
    ) -> DataFrame:
        cfg = self.cfg
        df = events
        # events minted before a rename still carry the old column name;
        # remap (or coalesce when both generations coexist in one batch)
        for op in renames:
            if op.kind != "rename":
                continue
            if op.name in df.columns and op.new_name in df.columns:
                df = df.withColumn(op.new_name, F.coalesce(F.col(op.new_name), F.col(op.name))).drop(op.name)
            elif op.name in df.columns:
                df = df.withColumnRenamed(op.name, op.new_name)
        if cfg.sanitize:
            keys = tuple(self.table.snapshot.key_cols)
            df = sanitize_columns(
                df, exclude=keys + (cfg.text_col, cfg.op_col, cfg.schema_col) + cfg.sanitize_exclude
            )
        df = df.withColumnRenamed(cfg.lsn_col, SYS_EVENT)
        keep = [c for c in df.columns if c not in (cfg.partition_col, cfg.schema_col)]
        df = df.select(*keep)
        snap = self.table.snapshot
        if cfg.pre_reduce:
            order = [snap.order_cols[0], SYS_EVENT]
            if use_broadcast_lww:
                df = lww_semijoin(df, snap.key_cols, order)
            else:
                df = lww_agg(df, snap.key_cols, order)
        if cfg.extract_text and cfg.html_col in df.columns and cfg.text_col in df.columns:
            df = with_extracted_text(df, cfg.html_col, cfg.text_col)
        return df

    # ------------------------------------------------------------- apply

    def apply_batch(
        self,
        events: DataFrame,
        batch_id: str | None = None,
        offsets: dict[int, int] | None = None,
        descriptors: list[str] | None = None,
        approx_rows: int | None = None,
    ) -> dict:
        """Apply one change-event micro-batch exactly once.

        ``offsets``/``descriptors``: per-partition end-LSNs and envelope
        schema descriptors, when the SOURCE already knows them — a Kafka
        consumer knows the offset range it polled and a binlog tail knows
        its positions, so scanning the data to rediscover them is wasted
        work (one whole Spark job per batch, a pure Amdahl term that caps
        N→4N scaling on small batches). When either is absent the engine
        falls back to the column-pruned discovery pre-pass.

        ``approx_rows``: the source's own estimate of this batch's event
        count (a Kafka consumer knows how many records it polled). Only
        used to pick the LWW pre-reduce plan on the known-offsets path
        (see ``EngineConfig.lww_strategy``); correctness never depends on
        it."""
        batch_id = batch_id or uuid.uuid4().hex
        t0 = time.time()

        if self.table.has_batch(batch_id):
            # crash healed: MERGE landed, offsets may not have — recompute
            # them from the batch and re-commit the checkpoint (idempotent).
            if offsets is None:
                offsets, _, _ = self._offsets_and_counts(self._filter_new(events))
            if not self.cp.has_batch(batch_id):
                self.cp.commit(batch_id, offsets, {"skipped_merge": True})
            return {"skipped": True, "batch_id": batch_id}

        # one column-pruned pre-pass (offsets + counts + schema descriptors
        # — partition_id/lsn/op/schema_json only) unless the source already
        # told us; the heavy payload columns are read exactly once, inside
        # the MERGE job itself.
        fresh = self._filter_new(events)
        obs_in: Observation | None = None
        if offsets is not None and descriptors is not None:
            # no discovery job — but batch counts must still reach the
            # checkpoint metrics (status()'s recent_events_per_sec reports
            # on exactly this path). Piggyback an Observation on the batch
            # plan: the counts fall out of the MERGE job itself, zero extra
            # jobs, measured BEFORE the LWW pre-reduce collapses duplicates.
            new_off, counts = offsets, {}
            op = (
                F.upper(F.col(self.cfg.op_col))
                if self.cfg.op_col in fresh.columns
                else F.lit("U")
            )
            obs_in = Observation()
            fresh = fresh.observe(
                obs_in,
                F.count(F.lit(1)).alias("events_applied"),
                F.sum((op == "D").cast("long")).alias("delete_events"),
            )
            known_rows = approx_rows
            if known_rows is None:
                # sound row-count UPPER bound from the offset gap: each
                # feed partition p can contribute at most
                # (new_offset_p − committed_offset_p) events because LSNs
                # are unique and the offset filter drops everything at or
                # below the committed mark. Over-counts on sparse/global
                # LSN spaces, which only ever forces the safe shuffle plan
                # — never an under-sized broadcast (a backlog catch-up
                # batch can no longer sneak past lww_broadcast_max_keys on
                # a stale prior-batch estimate).
                prev_off = self.cp.offsets()
                known_rows = sum(
                    max(0, int(l) - int(prev_off.get(int(p), -1)))
                    for p, l in offsets.items()
                )
        else:
            new_off, counts, descriptors = self._offsets_and_counts(fresh)
            known_rows = counts["events_applied"]
        renames = evolution.evolve_table(self.table, None, descriptors=descriptors)
        if self.cfg.quarantine_dir:
            fresh, n_quarantined = self._quarantine(fresh, batch_id)
            counts["quarantined"] = n_quarantined
        use_bcast = self.cfg.pre_reduce and self._lww_use_broadcast(known_rows)
        delta = self._prepare_delta(fresh, renames, use_broadcast_lww=use_bcast)
        metrics = self.table.merge(
            delta,
            batch_id=batch_id,
            op_col=self.cfg.op_col,
            mode=self.cfg.merge_mode,
            overlay=self.cfg.overlay,
            # pre_reduce already left one winner per key — the merge can
            # skip its in-batch reduction (one agg pass over the batch)
            delta_reduced=self.cfg.pre_reduce,
        )
        if obs_in is not None:
            got = obs_in.get  # already resolved: the merge write ran the plan
            # update, don't rebind: counts may already carry 'quarantined'
            # from the dead-letter split above
            counts.update(
                events_applied=int(got["events_applied"] or 0),
                delete_events=int(got["delete_events"] or 0),
            )
        metrics.update(counts)
        self.maybe_compact(metrics)
        metrics["evolution_ops"] = [
            {"kind": o.kind, "name": o.name, "new_name": o.new_name, "typ": o.typ}
            for o in renames
        ]
        metrics["lww_plan"] = "broadcast" if use_bcast else "shuffle"
        metrics["seconds"] = round(time.time() - t0, 3)
        self.cp.commit(batch_id, new_off, metrics)
        if counts.get("events_applied") is not None:
            self._last_events_applied = counts["events_applied"]
        if metrics.get("bytes_written") and metrics.get("rows_written"):
            self._last_row_bytes = metrics["bytes_written"] / metrics["rows_written"]
        return metrics

    def _gc_safe(self) -> bool:
        """The min-offset tombstone horizon is only sound when LWW order is
        the LSN itself: with a business order column, an above-horizon
        event can still LOSE to a below-horizon tombstone (older/NULL
        order value), so purging that tombstone would resurrect the key.
        See EngineConfig.gc_tombstones."""
        return self.table.snapshot.order_cols[0] == SYS_EVENT

    def maybe_compact(self, metrics: dict | None = None) -> dict | None:
        """Advance the compaction cadence by one committed merge and fold
        when it fires — called by ``apply_batch`` AND by the pull paths
        (``SyncOrchestrator._pull_one``), so a long-running ``run_pull_loop``
        in mor mode cannot accrete one overlay file-set per cycle forever.

        The in-memory counter is seeded from the checkpoint once:
        re-parsing the whole state document every batch is a per-batch
        fixed cost that grows with history. On the cadence it also
        (a) purges passed tombstones from the rewrite (``gc_tombstones``;
        horizon = min checkpointed offset — every feed partition has
        advanced past it and the offset filter drops any replay below it;
        ONLY when the table's LWW order is the LSN itself, see
        ``_gc_safe``) and (b) expires old snapshots when configured."""
        if not (self.cfg.compact_every and self.cfg.merge_mode == "mor"):
            return metrics
        if self._n_batches is None:
            self._n_batches = self.cp.read()["n_batches_total"]
        self._n_batches += 1
        if self._n_batches % self.cfg.compact_every == 0:
            horizon = None
            if self.cfg.gc_tombstones and self._gc_safe():
                offs = self.cp.offsets()
                if offs:
                    horizon = min(offs.values())
            out = {
                "compacted_buckets": self.table.compact_deltas(
                    purge_tombstones_below=horizon
                )
            }
            if self.cfg.expire_snapshots_keep:
                out["expired_files"] = self.table.expire_snapshots(
                    keep_last=self.cfg.expire_snapshots_keep
                )
            if metrics is not None:
                metrics.update(out)
        return metrics

    def seed_snapshot(self, snapshot_df: DataFrame, batch_id: str = "seed") -> dict:
        """Initial full load — the reference's full-refresh/replace path
        (pipeline_management.py:1225-1506) as one overwrite commit."""
        m = self.table.overwrite(snapshot_df, batch_id=batch_id)
        if not m.get("skipped"):
            self.cp.commit(batch_id, {}, m)
        return m

    # --------------------------------------------------------------- loop

    def run(self, batch_source, interval_s: float = 0.0, max_batches: int | None = None) -> list[dict]:
        """Continuous micro-cycle loop (reference: ``db_pipeline.py:75-94``,
        ``while True: sync; sleep(INTERVAL)``). ``batch_source`` yields
        (batch_id, DataFrame) pairs; returns per-batch metrics."""
        out = []
        for i, (batch_id, df) in enumerate(batch_source):
            out.append(self.apply_batch(df, batch_id))
            if max_batches is not None and i + 1 >= max_batches:
                break
            if interval_s:
                time.sleep(interval_s)
        return out
