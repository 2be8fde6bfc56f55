"""SparkSession factory tuned for the CDC engine.

Reference analog: engine/pool construction in
``/root/reference/source/database.py:122-190`` — except Spark manages its
own executor pool, so all that survives is configuration: Arrow on
(vectorized UDF transport), AQE on (runtime re-plan, skew-join), UTC
session timezone (the reference fights tz-naive Asia/Bangkok timestamps,
``pipeline_management.py:634-722``; we normalize to UTC at the session
level instead).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "patuha-etl-dlt-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with CDC-engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the local core count — the single
    most important knob for local correctness runs; on a real cluster set
    it to ~2-3× total executor cores (AQE coalesces the excess).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "8"
        shuffle_partitions = 32 if n == "*" else max(int(n), 4)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # cap Arrow transfer batches by BYTES, not rows: the default
        # 10k-row batches are ~15 MB at 1.5 KB pages but 170 MB at 17 KB
        # pages — with N python workers that is N×(batch + pandas copy) in
        # flight at once, and an interleaved A/B on 17 KB Common-Crawl-size
        # bodies measured 16-core extraction THRASHING at the default
        # (16-29 s, reps up to 69 s) vs stable 8.8-9.5 s with a 32 MB cap;
        # 4-core runs are unaffected (within noise). Byte-capped batches
        # keep the pandas-UDF memory footprint independent of payload
        # width — the knob that makes KB-payload columns scale with cores.
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(32 * 1024 * 1024))
        # deterministic parquet sizes at scale; 128 MB matches HDFS-block-era
        # defaults and keeps 100 TB / 128 MB ≈ 800k splits tractable
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # task-side file commit (FileOutputCommitter v2): a bucketed MERGE
        # writes one file per touched bucket, and v1's job-commit renames
        # them SERIALLY on the driver — an O(num_buckets) per-batch fixed
        # term that cannot scale with executors. v2 commits during task
        # commit (parallel). Safe here: every engine write goes to a fresh
        # uuid directory and becomes visible only via the snapshot-manifest
        # pointer swap, so a partially-committed job is invisible — the
        # manifest, not _SUCCESS, is the source of truth.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # InferFiltersFromGenerate synthesizes `size(arr)>0 AND isnotnull(arr)`
        # under every explode; predicate pushdown then INLINES the array
        # expression into that filter (losing shared sub-projections), so an
        # explode over a computed array — every dedup/banding operator here —
        # re-tokenizes each row inside the filter, below the exchange, in the
        # scan stage. Measured on dedup_ngram_jaccard at sf1.0: explode of the
        # per-doc shingle array 163 s with the rule on, 0.9 s with it off.
        # The rule only ever helps when the exploded column is a STORED column
        # whose emptiness can prune at the source; this engine always explodes
        # computed arrays, so it is excluded session-wide (guide §2.4: remove
        # work the optimizer adds that the plan can never use).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
