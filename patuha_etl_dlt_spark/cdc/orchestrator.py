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
interleaving); the shuffle-partition session knob two concurrent merges
both touch is perf-only (worst case a bucket gets >1 file for one commit,
healed by the compaction cadence).
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from patuha_etl_dlt_spark.cdc.checkpoint import CheckpointStore
from patuha_etl_dlt_spark.cdc.engine import CdcEngine, EngineConfig
from patuha_etl_dlt_spark.cdc.retry import RetryPolicy, RetryQueue, with_retry
from patuha_etl_dlt_spark.config import TableConfig
from patuha_etl_dlt_spark.lake import LakeTable


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
    ):
        """``max_concurrency``: how many tables one cycle applies at a time
        (reference BATCH_SIZE=8, ``pipeline_management.py:2104-2116``,
        ``config.py:32-33``). 1 = sequential (deterministic resource use);
        >1 runs applies from a driver thread pool, each in its own FAIR
        scheduler pool."""
        self.spark = spark
        self.root = root
        self.configs = {c.table: c for c in configs}
        self.retry_policy = retry_policy or RetryPolicy()
        self.retry_queue = RetryQueue()
        self.max_concurrency = max(1, int(max_concurrency))
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
