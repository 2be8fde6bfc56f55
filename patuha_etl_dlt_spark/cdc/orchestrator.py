"""Multi-table sync orchestration — the reference's driver loop re-imagined.

Reference: tables processed in batches of ``BATCH_SIZE=8`` with delays
(``pipeline_management.py:2104-2203``), incremental/full-refresh dispatch
(``:2171-2198``), per-table retry queue (``:458-467``), and pre/post
row-count sync verification with status ∈ {perfect, partial, failed}
(``:70-128``, ``database.py:395-433``).

Spark-first differences: there is no connection pool to protect — the
reference's "batch of 8" throttle maps to ``max_concurrency``: tables are
independent single-writer lake tables, so their apply jobs are safe to
run concurrently from driver threads, each tagged with a FAIR-scheduler
pool so one table's large job cannot starve the rest. Retries are safe at
any point because MERGE commits are atomic and batch-id idempotent.

Concurrency note: correctness under concurrent cycles is carried by the
per-table single-writer invariant plus the bucketed ``partitionBy`` write
(rows always land in their key's bucket regardless of session-conf
interleaving). The session-wide shuffle-partition knob merges pin is
mutated only under ``lake.table._CONF_LOCK`` (set→job→restore is atomic
across these threads, so no thread can capture another's temporary value
and leak it into the session); tables whose bucket count already matches
the session conf skip the lock and stay fully concurrent. The residual
worst case is perf-only: a write racing a locked mutator may see the
temporary conf and leave >1 file in a bucket for one commit, healed by
the compaction cadence.
"""

from __future__ import annotations

import dataclasses
import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from patuha_etl_dlt_spark.cdc import evolution
from patuha_etl_dlt_spark.cdc.checkpoint import CheckpointStore
from patuha_etl_dlt_spark.cdc.engine import CdcEngine, EngineConfig
from patuha_etl_dlt_spark.cdc.retry import RetryPolicy, RetryQueue, with_retry
from patuha_etl_dlt_spark.config import TableConfig
from patuha_etl_dlt_spark.lake import LakeTable


def _check_cursor_type(prev, dtype) -> None:
    """Pre-merge guard matching ``checkpoint._max_cursor``'s type rules:
    a committed int/float cursor is only advanceable by a NUMERIC source
    column; a committed string cursor (timestamps/dates json-serialize to
    str, see ``_json_cursor``) by a string/timestamp/date column. Any
    other combination would raise inside the post-merge checkpoint commit
    — permanently wedging the cycle — so it raises HERE, before the merge
    runs, where the failure is clean and the cycle retryable after an
    explicit cursor migration."""
    from pyspark.sql import types as T

    if prev is None:
        return
    if isinstance(prev, (int, float)) and not isinstance(prev, bool):
        ok = isinstance(dtype, T.NumericType)
    elif isinstance(prev, str):
        ok = isinstance(
            dtype, (T.StringType, T.TimestampType, T.TimestampNTZType, T.DateType)
        )
    else:
        ok = False
    if not ok:
        raise TypeError(
            f"cursor type changed: checkpoint holds {type(prev).__name__}"
            f"({prev!r}) but the source cursor column is now {dtype.simpleString()}; "
            "a type flip would bypass the monotone guard. Migrate the cursor "
            "explicitly (reset the checkpoint or normalize the source type)."
        )


def _json_cursor(v):
    """Canonical JSON-storable cursor value. Timestamps/dates become
    Python's ``str()`` form (``YYYY-MM-DD HH:MM:SS[.ffffff]`` — fractions
    are absent or exactly 6 digits, so lexicographic order equals time
    order, keeping the checkpoint's monotone-max guard correct); ints,
    floats and strings pass through unchanged."""
    if v is None or isinstance(v, (int, float, str)):
        return v
    return str(v)


@dataclass
class SyncResult:
    table: str
    batch_id: str
    status: str  # 'perfect' | 'failed' | 'skipped'
    metrics: dict


class SyncOrchestrator:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        configs: list[TableConfig],
        engine_config: EngineConfig | None = None,
        retry_policy: RetryPolicy | None = None,
        max_concurrency: int = 1,
        sources: dict[str, object] | None = None,
    ):
        """``max_concurrency``: how many tables one cycle applies at a time
        (reference BATCH_SIZE=8, ``pipeline_management.py:2104-2116``,
        ``config.py:32-33``). 1 = sequential (deterministic resource use);
        >1 runs applies from a driver thread pool, each in its own FAIR
        scheduler pool.

        ``sources``: per-table pull sources for ``pull_cycle`` — either a
        ``JdbcSourceConfig`` (the checkpointed cursor is substituted into
        ``last_value`` each cycle, pushing ``WHERE cursor > :last`` into
        the remote DB) or a callable ``(spark, last_value) -> DataFrame``
        (file feeds, test doubles). Tables without a source are
        push-driven via ``run_cycle`` only."""
        self.spark = spark
        self.root = root
        self.configs = {c.table: c for c in configs}
        self.retry_policy = retry_policy or RetryPolicy()
        self.retry_queue = RetryQueue()
        self.max_concurrency = max(1, int(max_concurrency))
        self.sources = dict(sources or {})
        self._engines: dict[str, CdcEngine] = {}
        self._engine_config = engine_config

    # ------------------------------------------------------------- tables

    def table_root(self, name: str) -> str:
        return os.path.join(self.root, "tables", name)

    def ensure_table(self, name: str) -> LakeTable:
        cfg = self.configs[name]
        root = self.table_root(name)
        if LakeTable.exists(root):
            return LakeTable.load(self.spark, root)
        if not cfg.columns:
            raise ValueError(f"{name}: table does not exist and config has no columns")
        return LakeTable.create(
            self.spark,
            root,
            list(cfg.columns),
            key_cols=list(cfg.merge_key),
            order_col=cfg.cursor or None,
            num_buckets=cfg.num_buckets,
        )

    def engine(self, name: str) -> CdcEngine:
        if name not in self._engines:
            table = self.ensure_table(name)
            cp = CheckpointStore(os.path.join(self.root, "checkpoints", name))
            self._engines[name] = CdcEngine(table, cp, self._engine_config)
        return self._engines[name]

    # -------------------------------------------------------------- cycle

    def _apply_one(self, name: str, df: DataFrame, batch_id: str) -> SyncResult:
        cfg = self.configs[name]
        eng = self._engines[name]
        bid = f"{batch_id}:{name}"
        # a per-table FAIR pool: with spark.scheduler.mode=FAIR set on the
        # session, concurrent tables share executor slots fairly instead of
        # queueing FIFO behind the first table's stages. Local properties
        # are per-thread, so this is concurrency-safe (unlike session conf).
        self.spark.sparkContext.setLocalProperty("spark.scheduler.pool", f"table-{name}")
        try:
            if cfg.mode == "snapshot":
                m = with_retry(lambda: eng.seed_snapshot(df, batch_id=bid), self.retry_policy)
            else:
                m = with_retry(lambda: eng.apply_batch(df, batch_id=bid), self.retry_policy)
            status = "skipped" if m.get("skipped") else "perfect"
            return SyncResult(name, bid, status, m)
        except Exception as e:  # noqa: BLE001
            return SyncResult(name, bid, "failed", {"error": str(e)})
        finally:
            self.spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)

    def run_cycle(self, batches: dict[str, DataFrame], batch_id: str) -> list[SyncResult]:
        """One sync cycle: apply each table's pending delta (cdc mode) or
        snapshot (snapshot mode), with retry; failures are queued for the
        next cycle (re-application is idempotent). Tables are independent
        single-writer, so with ``max_concurrency > 1`` they run from a
        driver thread pool (the Spark-native analog of the reference's
        BATCH_SIZE-of-8 pipelining); results keep input order and the
        retry queue is fed from the coordinating thread only."""
        # instantiate engines up front (dict mutation stays single-threaded)
        for name in batches:
            self.engine(name)
        items = list(batches.items())
        if self.max_concurrency > 1 and len(items) > 1:
            with ThreadPoolExecutor(max_workers=self.max_concurrency) as pool:
                results = list(
                    pool.map(lambda kv: self._apply_one(kv[0], kv[1], batch_id), items)
                )
        else:
            results = [self._apply_one(name, df, batch_id) for name, df in items]
        for r in results:
            if r.status == "failed":
                self.retry_queue.push(r.table, r.batch_id)
        return results

    # --------------------------------------------------------------- pull

    def _build_scan(self, name: str, last_value) -> tuple[DataFrame, str]:
        """Incremental source scan for ``name`` from ``last_value``;
        returns (df, human-readable description of what was pushed).

        A JDBC source with ``partition_col`` set but no static bounds gets
        PER-CYCLE bounds probed from the current window (one tiny remote
        MIN/MAX the DB answers from its index) so the parallel range-
        partitioned pull follows the table as it grows — vs the
        reference's single-connection serial extract. An empty window
        degrades to an unpartitioned scan."""
        from patuha_etl_dlt_spark.sources.jdbc import (
            JdbcSourceConfig,
            probe_partition_bounds,
            read_jdbc,
        )

        src = self.sources[name]
        if isinstance(src, JdbcSourceConfig):
            cfg = dataclasses.replace(src, last_value=last_value)
            if cfg.partition_col and (cfg.lower_bound is None or cfg.upper_bound is None):
                bounds = probe_partition_bounds(self.spark, cfg)
                if bounds is None:
                    cfg = dataclasses.replace(cfg, partition_col=None)
                else:
                    cfg = dataclasses.replace(
                        cfg, lower_bound=str(bounds[0]), upper_bound=str(bounds[1])
                    )
            desc = cfg.dbtable()
            if cfg.partition_col:
                desc += f" [range-partitioned x{cfg.num_partitions} on {cfg.partition_col}: {cfg.lower_bound}..{cfg.upper_bound}]"
            return read_jdbc(self.spark, cfg), desc
        return src(self.spark, last_value), f"callable(last_value={last_value!r})"

    def _derive_cursor_from_target(self, eng: CdcEngine, cursor_col: str):
        """Cold-checkpoint fallback: re-derive the cursor from the TARGET
        table, the reference's ``get_max_timestamp``
        (``pipeline_management.py:39-56`` — it does this EVERY cycle
        because it distrusts dlt state; we only do it when the checkpoint
        has no cursor, e.g. a fresh checkpoint dir pointed at an existing
        table). O(target state) scan, hence not the steady-state path."""
        if not eng.table.snapshot.files:
            return None
        row = eng.table.read().agg(F.max(F.col(cursor_col)).alias("m")).first()
        return _json_cursor(row["m"])

    def _pull_one(self, name: str, batch_id: str) -> SyncResult:
        cfg = self.configs[name]
        eng = self._engines[name]
        bid = f"{batch_id}:{name}"
        self.spark.sparkContext.setLocalProperty("spark.scheduler.pool", f"table-{name}")
        try:
            if cfg.mode == "snapshot":
                df, desc = self._build_scan(name, None)
                m = with_retry(lambda: eng.seed_snapshot(df, batch_id=bid), self.retry_policy)
                m["source_query"] = desc
                return SyncResult(name, bid, "skipped" if m.get("skipped") else "perfect", m)

            if cfg.mode == "snapshot_diff":
                # full pull, but MERGE only the derived I/U/D changes —
                # the mode that propagates upstream DELETEs (a cursor can
                # never see them) at O(changes) write cost vs the full
                # refresh's O(target) rewrite. See cdc.snapshot_diff.
                from patuha_etl_dlt_spark.cdc.snapshot_diff import (
                    diff_shuffle_partitions,
                    diff_snapshots,
                )
                from patuha_etl_dlt_spark.lake.table import _pinned_shuffle_conf

                def one_diff() -> dict:
                    df, desc = self._build_scan(name, None)
                    ops = evolution.evolve_from_source(eng.table, df.schema)
                    snap_v = eng.table.snapshot.version
                    delta = diff_snapshots(
                        df, eng.table.read(), list(cfg.merge_key), op_col=eng.cfg.op_col
                    ).withColumn("_event_id", F.lit(snap_v + 1).cast("long"))
                    # size the diff's full-outer-join shuffle from the
                    # TABLE's bytes, not the session constant (the round-5
                    # 32 M-row spill cliff); AQE coalesces the excess when
                    # the table is small. A bucketed-overlay merge re-pins
                    # its WRITE to num_buckets inside (its own documented
                    # trade); the global-overlay path runs entirely at
                    # this width.
                    diff_width = diff_shuffle_partitions(
                        eng.table,
                        int(self.spark.conf.get("spark.sql.shuffle.partitions")),
                    )
                    obs = Observation()
                    opc = F.upper(F.col(eng.cfg.op_col))
                    delta = delta.observe(
                        obs,
                        F.count(F.lit(1)).alias("changes"),
                        F.sum((opc == "D").cast("long")).alias("delete_events"),
                        F.sum((opc == "I").cast("long")).alias("insert_events"),
                    )
                    with _pinned_shuffle_conf(self.spark, diff_width):
                        m = eng.table.merge(
                            delta,
                            batch_id=bid,
                            op_col=eng.cfg.op_col,
                            mode=eng.cfg.merge_mode,
                            overlay=eng.cfg.overlay,
                            # diff output is key-unique by construction (one
                            # full-outer join on the keys of two key-unique
                            # snapshots) — the merge can skip its in-batch
                            # LWW reduction
                            delta_reduced=True,
                        )
                    if m.get("skipped"):
                        if not eng.cp.has_batch(bid):
                            eng.cp.commit(bid, {}, {"skipped_merge": True})
                        return {**m, "source_query": desc}
                    got = obs.get
                    m.update(
                        changes=int(got["changes"] or 0),
                        delete_events=int(got["delete_events"] or 0),
                        insert_events=int(got["insert_events"] or 0),
                        source_query=desc,
                        evolution_ops=[
                            {"kind": o.kind, "name": o.name, "typ": o.typ} for o in ops
                        ],
                    )
                    # same hygiene cadence as the push path (before the
                    # checkpoint commit, like apply_batch — the counter
                    # seeds from n_batches_total): without it a
                    # long-running pull loop in mor mode accretes one
                    # overlay file-set per cycle and every next diff's full
                    # table read degrades monotonically
                    eng.maybe_compact(m)
                    eng.cp.commit(bid, {}, m)
                    return m

                m = with_retry(one_diff, self.retry_policy)
                return SyncResult(name, bid, "skipped" if m.get("skipped") else "perfect", m)

            def one_pull() -> dict:
                last = eng.cp.cursor()
                if last is None:
                    last = self._derive_cursor_from_target(eng, cfg.cursor)
                df, desc = self._build_scan(name, last)
                # fail a cursor TYPE FLIP before any state lands: the
                # checkpoint's monotone guard would raise inside commit —
                # after the MERGE — wedging the cycle on the heal path
                # (every retry skips the merge and re-raises on
                # re-commit). The source column's type is known from the
                # introspected scan schema, so the mismatch is detectable
                # up front, where failing is clean and retryable.
                _check_cursor_type(last, df.schema[cfg.cursor].dataType)
                # source-introspection evolution BEFORE apply: a column
                # added/widened upstream evolves the lake table as
                # metadata-only ops, then the batch (old rows NULL-filled,
                # narrow rows cast up) merges cleanly
                ops = evolution.evolve_from_source(eng.table, df.schema)
                obs = Observation()
                df = df.observe(
                    obs,
                    F.max(F.col(cfg.cursor)).alias("cursor_max"),
                    F.count(F.lit(1)).alias("rows_pulled"),
                )
                m = eng.table.merge(
                    df,
                    batch_id=bid,
                    op_col=eng.cfg.op_col,
                    mode=eng.cfg.merge_mode,
                    overlay=eng.cfg.overlay,
                )
                if m.get("skipped"):
                    # crash heal: MERGE landed in a previous attempt but the
                    # checkpoint may not have — re-commit it with the cursor
                    # unchanged; the next cycle re-pulls the gap and the LWW
                    # merge makes the re-application converge (idempotent)
                    if not eng.cp.has_batch(bid):
                        eng.cp.commit(bid, {}, {"skipped_merge": True})
                    return {**m, "source_query": desc}
                got = obs.get
                new_cursor = _json_cursor(got["cursor_max"])
                m.update(
                    rows_pulled=int(got["rows_pulled"] or 0),
                    last_value=last,
                    cursor=new_cursor if new_cursor is not None else last,
                    source_query=desc,
                    evolution_ops=[
                        {"kind": o.kind, "name": o.name, "typ": o.typ} for o in ops
                    ],
                )
                # engine hygiene cadence (compact_deltas + snapshot expiry)
                # applies to pull cycles too — see maybe_compact; runs
                # before the checkpoint commit like apply_batch so the
                # counter seed stays consistent
                eng.maybe_compact(m)
                # an empty pull still commits the (derived) cursor, so a
                # cold checkpoint warms up and never re-derives again
                eng.cp.commit(bid, {}, m, cursor=new_cursor if new_cursor is not None else last)
                return m

            m = with_retry(one_pull, self.retry_policy)
            return SyncResult(name, bid, "skipped" if m.get("skipped") else "perfect", m)
        except Exception as e:  # noqa: BLE001
            return SyncResult(name, bid, "failed", {"error": str(e)})
        finally:
            self.spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)

    def pull_cycle(self, batch_id: str, tables: list[str] | None = None) -> list[SyncResult]:
        """One closed-loop sync cycle — the reference's actual entry point
        (``db_pipeline.py:75-94``: derive cursor → build incremental
        extract → load → repeat): for each table with a registered source,
        read the checkpointed cursor, build the pushed-down incremental
        scan (``WHERE cursor > :last`` runs IN the source DB against its
        own index), auto-evolve the lake schema from the introspected
        source schema, LWW-MERGE the batch exactly-once, and advance the
        cursor. Snapshot-mode tables full-refresh instead
        (``pipeline_management.py:2176-2182``).

        Like the reference's cursor sync, a pull cycle sees inserts and
        updates only — upstream DELETEs don't bump a cursor column, so
        they need the event-envelope path (``run_cycle``/``apply_batch``
        with op='D'). Failures queue for retry; re-running a cycle id is
        idempotent end-to-end (merge batch-id + checkpoint heal)."""
        names = [n for n in (tables if tables is not None else self.configs) if n in self.sources]
        for name in names:
            self.engine(name)
        if self.max_concurrency > 1 and len(names) > 1:
            with ThreadPoolExecutor(max_workers=self.max_concurrency) as pool:
                results = list(pool.map(lambda n: self._pull_one(n, batch_id), names))
        else:
            results = [self._pull_one(n, batch_id) for n in names]
        for r in results:
            if r.status == "failed":
                self.retry_queue.push(r.table, r.batch_id)
        return results

    def run_pull_loop(
        self,
        interval_s: float = 0.0,
        max_cycles: int | None = None,
        tables: list[str] | None = None,
        cycle_prefix: str = "cycle",
    ) -> list[list[SyncResult]]:
        """The reference's main process loop (``db_pipeline.py:75-94``:
        ``while True: run_db_sync(); sleep(INTERVAL)``) over ``pull_cycle``.
        Cycle ids are ``{prefix}-{n}`` with ``n`` continuing from the
        committed history (restart-safe: a re-run after a crash first
        replays the last cycle id, which is idempotent end-to-end, then
        proceeds). Bounded by ``max_cycles`` (None = run forever)."""
        # resume numbering after the highest committed cycle for any table
        start = 0
        for name in tables if tables is not None else self.configs:
            if name not in self.sources:
                continue
            st = self.engine(name).cp.read()
            for bid in st["batches"]:
                head = bid.split(":", 1)[0]
                if head.startswith(f"{cycle_prefix}-"):
                    try:
                        start = max(start, int(head.split("-", 1)[1]))
                    except ValueError:
                        pass
        out = []
        n = 0
        while max_cycles is None or n < max_cycles:
            out.append(self.pull_cycle(f"{cycle_prefix}-{start + n}", tables=tables))
            n += 1
            if max_cycles is not None and n >= max_cycles:
                break
            if interval_s:
                time.sleep(interval_s)
        return out

    # -------------------------------------------------------------- health

    def status(self) -> dict:
        """Aggregate health/status document (R8; reference
        ``monitoring.py:16-152`` serves the equivalent over HTTP :8089 —
        see ``cdc.monitoring.HealthServer`` for the serving surface).
        'healthy' = every instantiated table has committed at least one
        batch and nothing is queued for retry; 'idle' = no table has run
        yet; 'degraded' otherwise."""
        tables = {}
        any_commits, any_missing = False, False
        for name in self.configs:
            if name in self._engines:
                s = self._engines[name].cp.status()
                tables[name] = s
                if s["n_batches"]:
                    any_commits = True
                else:
                    any_missing = True
            else:
                tables[name] = {"n_batches": 0, "last_batch_id": None}
                any_missing = True
        retry_depth = len(self.retry_queue.items)
        if not any_commits:
            overall = "idle"
        elif any_missing or retry_depth:
            overall = "degraded"
        else:
            overall = "healthy"
        return {
            "status": overall,
            "timestamp": time.time(),
            "retry_queue_depth": retry_depth,
            "tables": tables,
        }

    # ------------------------------------------------------- verification

    def verify_sync(self, name: str, expected: DataFrame) -> dict:
        """Row-count sync verification (reference ``log_sync_results``,
        ``pipeline_management.py:70-128``): compare the live table state
        against an expected DataFrame; classify perfect/partial/failed."""
        got = self.engine(name).table.read().count()
        want = expected.count()
        diff_pct = 0.0 if want == 0 else abs(got - want) * 100.0 / want
        status = "perfect" if got == want else ("partial" if diff_pct <= 5.0 else "failed")
        return {"table": name, "expected": want, "actual": got, "diff_pct": round(diff_pct, 3), "status": status}
