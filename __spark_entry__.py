"""Driver contract for the spark-graft builder (PySpark target).

Every query here is implemented through the ``patuha_etl_dlt_spark``
package (the engine under test) and paired with an ANSI-SQL oracle DuckDB
runs on the same parquet. Column names/aliases match exactly between the
Spark result and the oracle (the driver's compare is order-insensitive but
name/value-sensitive). Floating aggregates are computed in DECIMAL then
rounded and cast to DOUBLE on both sides so value hashes are stable.

Query groups (SURVEY.md §2 operator inventory):
- cdc_*        : the CDC engine surface (S1-S5, P1, A1-A5, J1/J2, C1-C5, F2-F7)
- tpch_* / join/window/set queries: general relational coverage (O1-O2, §2.3-2.7)
- doc_* / dedup_* / ann_* / media_*: training-data pipeline operators
  (dedup tiers, similarity search, text analysis, multimodal plumbing)
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from patuha_etl_dlt_spark.cdc.dedup import lww_agg, lww_salted, lww_semijoin, lww_window
from patuha_etl_dlt_spark.functions.sanitize import clean_string
from patuha_etl_dlt_spark.functions.text import (
    LANG_STOPWORDS,
    fingerprint,
    lang_id,
    lang_scores,
    normalize_text,
    quality_features,
    token_count,
)
from patuha_etl_dlt_spark.lake import LakeTable
from patuha_etl_dlt_spark.operators.dedup import (
    exact_duplicate_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from patuha_etl_dlt_spark.operators.multimodal import decode_media
from patuha_etl_dlt_spark.operators.similarity import (
    cosine_topk,
    embedding_near_pairs,
    lsh_cosine_topk,
)

WM = "2024-01-15 00:00:00"  # events watermark literal (feed spans 2024-01)
Q1_DATE = "2000-12-01 00:00:00"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Scan-parallelism floor for heavy NARROW pipelines (guide §2.5
    "input skew: one huge unsplittable file → repartition immediately
    after the read"): the testdata tables are single-row-group parquet
    files, so every scan-stage computation (tokenize, per-doc media
    synth/decode, text statistics) otherwise runs in ONE task regardless
    of core count. A deterministic hash repartition on the row key spreads
    that work across the executor cores for the price of shuffling the
    (small) source rows once. Scale-adaptive, not a local constant: when
    the scan already yields at least defaultParallelism splits (the
    100 TB case — thousands of row groups), this is a no-op and no
    shuffle is added."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    return df.repartition(p, key)


def _dec(c: str):
    return F.col(c).cast("decimal(18,6)")


def _r4d(c):
    return F.round(c, 4).cast("double")


# --------------------------------------------------------------------------
# CDC family (events: event_id, ts, user_id, event_type, value, props)
# --------------------------------------------------------------------------

def _lww_cols():
    # built lazily: Column construction needs an active SparkContext
    return [
        F.col("user_id"),
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    ]

_LWW_ORACLE = """
SELECT user_id, ts AS last_ts, event_type AS last_event_type, value AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


def cdc_lww_window(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return lww_window(ev, ["user_id"], ["ts", "event_id"]).select(*_lww_cols())


def cdc_lww_agg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return lww_agg(ev, ["user_id"], ["ts", "event_id"]).select(*_lww_cols())


def cdc_lww_salted(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return lww_salted(ev, ["user_id"], ["ts", "event_id"], n_salt=8).select(*_lww_cols())


def cdc_lww_semijoin(spark, sf_dir):
    """Fourth physical LWW plan, same oracle: winner coordinates from a
    column-pruned aggregation, broadcast LEFT SEMI back — the payload
    never enters a shuffle (the heavy-payload strategy; see
    cdc/dedup.py::lww_semijoin and the BASELINE.md round-5 crossover)."""
    ev = _t(spark, sf_dir, "events")
    return lww_semijoin(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


def cdc_apply_deletes_lake(spark, sf_dir):
    """Flagship: the real engine end-to-end — events become I/U/D changes
    ('error' ⇒ delete), applied through LakeTable.merge in three batches;
    returns the final table state."""
    ev = _t(spark, sf_dir, "events")
    delta = ev.withColumnRenamed("event_id", "_event_id").withColumn(
        "op", F.when(F.col("event_type") == "error", "D").otherwise("U")
    )
    root = tempfile.mkdtemp(prefix="entry_lake_")
    t = LakeTable.create(
        spark,
        f"{root}/t",
        [("user_id", "long"), ("ts", "timestamp"), ("event_type", "string"),
         ("value", "double"), ("props", "string")],
        key_cols="user_id",
        order_col="ts",
        num_buckets=8,
    )
    for i in range(3):
        t.merge(
            delta.filter(F.col("_event_id") % 3 == i),
            batch_id=f"b{i}",
            collect_metrics=False,
            # global overlay: each batch writes plain coalesced delta files
            # at the session's shuffle width instead of pinning the whole
            # plan to num_buckets partitions (8-wide on a 32-core box);
            # the final read LWW-resolves identically (property-tested)
            overlay="global",
        )
    return t.read().select("user_id", "ts", "event_type", "value", "props")


_APPLY_ORACLE = """
SELECT user_id, ts, event_type, value, props
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1 AND event_type <> 'error'
"""


def cdc_pull_cycle(spark, sf_dir):
    """Closed-loop pull gate: TWO ``SyncOrchestrator.pull_cycle`` rounds
    over a deterministic polling source (the events table as it would look
    at T1 = first half of the event-id space, then at T2 = all of it).
    Exercises the reference's actual entry loop end-to-end
    (``db_pipeline.py:75-94``): checkpointed-cursor read → incremental
    scan filtered by it → exactly-once MERGE → cursor advance. Cycle 2
    MUST only see rows above cycle 1's cursor; the final state equals the
    one-shot LWW SQL over all events."""
    from patuha_etl_dlt_spark.cdc.engine import EngineConfig
    from patuha_etl_dlt_spark.cdc.orchestrator import SyncOrchestrator
    from patuha_etl_dlt_spark.config import TableConfig

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "value")
    cut = ev.agg(F.max("event_id")).first()[0] // 2
    phase = {"n": 1}

    def source(spark_, last):
        feed = ev if phase["n"] == 2 else ev.filter(F.col("event_id") <= cut)
        return feed.filter(F.col("event_id") > (last if last is not None else -1))

    cfg = TableConfig(
        table="pull", merge_key=("user_id",), cursor="event_id",
        columns=(("user_id", "long"), ("event_id", "long"),
                 ("event_type", "string"), ("value", "double")),
        num_buckets=8,
    )
    root = tempfile.mkdtemp(prefix="entry_pull_")
    # global overlay: pull merges write plain coalesced delta files at the
    # session's shuffle width instead of a plan pinned to num_buckets=8
    # partitions; the read LWW-resolves identically (measured 2.6->2.1 s
    # warm, 9.3->2.7 s cold at sf1.0)
    orch = SyncOrchestrator(
        spark, root, [cfg], sources={"pull": source},
        engine_config=EngineConfig(overlay="global"),
    )
    (r1,) = orch.pull_cycle("t1")
    assert r1.status == "perfect", r1.metrics
    assert orch.engine("pull").cp.cursor() == cut  # cursor advanced to T1's edge
    phase["n"] = 2
    (r2,) = orch.pull_cycle("t2")
    assert r2.status == "perfect", r2.metrics
    assert r2.metrics["last_value"] == cut  # cycle 2 scanned FROM the checkpoint
    t = orch.engine("pull").table
    return t.read().select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


_PULL_ORACLE = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type, value AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


def cdc_snapshot_diff(spark, sf_dir):
    """Snapshot-diff CDC gate — the mode that propagates upstream DELETEs,
    which cursor CDC can never see (reference limitation README.MD:395).
    The "upstream table" at time T is the LWW state of events with
    event_id ≤ T, where a user whose winner is an 'error' event has been
    deleted upstream. Two pull cycles (T = half the id space, then all of
    it) diff each full snapshot against the lake and MERGE only the
    derived I/U/D events; the final state must equal the T=∞ snapshot —
    including rows DELETED between the snapshots."""
    from patuha_etl_dlt_spark.cdc.engine import EngineConfig
    from patuha_etl_dlt_spark.cdc.orchestrator import SyncOrchestrator
    from patuha_etl_dlt_spark.config import TableConfig

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "value")
    cut = ev.agg(F.max("event_id")).first()[0] // 2
    phase = {"n": 1}

    def upstream_snapshot(spark_, last):
        e = ev if phase["n"] == 2 else ev.filter(F.col("event_id") <= cut)
        win = lww_agg(e, ["user_id"], ["event_id"])
        return win.filter(F.col("event_type") != "error")

    cfg = TableConfig(
        table="sd", merge_key=("user_id",), cursor="", mode="snapshot_diff",
        columns=(("user_id", "long"), ("event_id", "long"),
                 ("event_type", "string"), ("value", "double")),
        num_buckets=8,
    )
    root = tempfile.mkdtemp(prefix="entry_sd_")
    orch = SyncOrchestrator(
        spark, root, [cfg], sources={"sd": upstream_snapshot},
        engine_config=EngineConfig(overlay="global"),  # see cdc_pull_cycle
    )
    (r1,) = orch.pull_cycle("t1")
    assert r1.status == "perfect" and r1.metrics["changes"] > 0, r1.metrics
    phase["n"] = 2
    (r2,) = orch.pull_cycle("t2")
    assert r2.status == "perfect" and r2.metrics["changes"] > 0, r2.metrics
    t = orch.engine("sd").table
    return t.read().select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


_SNAPDIFF_ORACLE = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type, value AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events)
WHERE rn = 1 AND event_type <> 'error'
"""


def cdc_incremental_scan(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") > F.lit(WM).cast("timestamp"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(_dec("value")), 4).cast("double").alias("total_value"),
        )
    )


def cdc_watermark(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.agg(F.max("ts").alias("max_ts"), F.count(F.lit(1)).alias("n"))


def cdc_new_records_count(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("ts") > F.lit(WM).cast("timestamp")).agg(
        F.count(F.lit(1)).alias("n_new")
    )


def cdc_op_counts(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


def cdc_users_per_type(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n_users"))


def cdc_sanitize_props(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") < 500).select(
        "event_id", clean_string(F.col("props")).alias("props_clean")
    )


def cdc_diagnose_props(spark, sf_dir):
    """Distributed problematic-row report (reference debug bisector,
    data_processing.py:124-190): one row per offending (row, column) with
    the problem kind and a hex preview. The testdata is clean, so NUL
    bytes are PLANTED deterministically (every 7th event) — the oracle
    mirrors the planting and the hex arithmetic, so a detector or
    hex-preview bug shows up as a mismatch."""
    from patuha_etl_dlt_spark.functions.diagnose import diagnose_rows

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    planted = ev.select(
        "event_id",
        F.when(
            F.col("event_id") % 7 == 0, F.concat(F.col("props"), F.lit("\x00x"))
        ).otherwise(F.col("props")).alias("props"),
        "ts",
    )
    return diagnose_rows(planted, ["event_id"])


def cdc_parse_timestamps(spark, sf_dir):
    """F10/F9: ISO-string timestamp parse (Z honored, garbage → NULL) and
    naive→Asia/Bangkok localization, round-tripped through formatted
    strings of the events feed so the oracle is pure interval arithmetic
    (Bangkok is fixed UTC+7, no DST)."""
    from patuha_etl_dlt_spark.functions.sanitize import (
        localize_naive_timestamp,
        parse_iso_timestamp,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    iso_z = F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), F.lit("Z"))
    iso_naive = F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    return ev.select(
        "event_id",
        parse_iso_timestamp(iso_z).alias("ts_z"),
        parse_iso_timestamp(iso_naive, default_tz="Asia/Bangkok").alias("ts_bkk"),
        localize_naive_timestamp(F.col("ts"), "Asia/Bangkok").alias("ts_localized"),
        parse_iso_timestamp(F.lit("not-a-date")).alias("ts_bad"),
    )


def events_rollup_incremental(spark, sf_dir):
    """Incrementally-maintained aggregate table: the events feed is folded
    into a keyed rollup in three batches (each fold touches only the
    groups the batch changed); the final state must equal a one-shot
    GROUP BY of everything — the oracle IS that one-shot query. Sums run
    in decimal so the fold order cannot perturb the values."""
    from patuha_etl_dlt_spark.cdc.rollup import IncrementalRollup

    ev = _spread(_t(spark, sf_dir, "events"), "event_id")
    root = tempfile.mkdtemp(prefix="entry_rollup_")
    ru = IncrementalRollup.create(
        spark,
        f"{root}/r",
        [("event_type", "string")],
        {
            "n": ("count", "event_id", "long"),
            "total_value": ("sum", _dec("value"), "decimal(28,6)"),
            "max_ts": ("max", "ts", "timestamp"),
        },
        num_buckets=4,
    )
    for i in range(3):
        ru.apply_batch(ev.filter(F.col("event_id") % 3 == i), batch_id=f"rb{i}")
    return ru.read().select(
        "event_type",
        "n",
        F.round(F.col("total_value"), 4).cast("double").alias("total_value"),
        "max_ts",
    )


def events_hourly_rollup(spark, sf_dir):
    # spread: the date_trunc + decimal partial agg over ~3.4k groups
    # otherwise runs in the 1-row-group scan's single task (A/B at sf1.0:
    # 1.21 -> 0.73 s warm, 3.45 -> 1.28 s cold); decimal sums are
    # fold-order exact. cdc_incremental_scan measured WORSE with the same
    # spread (5 groups: partial agg already collapses everything) and
    # keeps the plain scan.
    ev = _spread(_t(spark, sf_dir, "events"), "event_id")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(_dec("value")), 4).cast("double").alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# relational coverage (TPC-H-ish)
# --------------------------------------------------------------------------


def tpch_q1(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    disc = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,6)") - _dec("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit(Q1_DATE).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc), 2).cast("double").alias("sum_disc_price"),
            F.round(F.avg(_dec("l_quantity")), 4).cast("double").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def revenue_by_nation(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    o = _spread(o, "o_orderkey")  # orders is a 2-row-group file: spread the
    # 3 broadcast joins + partial agg over all cores (guide §2.5)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def topk_customers(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    tot = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total")
    )
    w = Window.orderBy(F.col("total").desc(), F.col("custkey"))
    return tot.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 10)


def window_order_rank(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 2)
        .select("o_orderkey", "o_custkey", "rnk")
    )


def anti_join_customers(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey")).distinct()
    open_ = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.join(open_, "custkey", "left_anti")


def rollup_orders(spark, sf_dir):
    """GROUP BY ROLLUP — subtotal/total rows (§2.4 'absent in reference,
    free in Spark')."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("revenue"),
    )


def pivot_status_by_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    # empty pivot cells are NULL in Spark but 0 under SQL FILTER counts
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_filled"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_pending"),
    )


def sessionize_events(spark, sf_dir):
    """Sessionization: per-user sessions split on >1 h inactivity gaps
    (lag + cumulative sum — the standard Spark pattern)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")  # ntz → epoch (UTC session)
    gap = epoch - F.lag(epoch).over(w)
    sess = (
        ev.withColumn("new_sess", F.when(gap.isNull() | (gap > 3600), 1).otherwise(0))
        .withColumn("sess_id", F.sum("new_sess").over(w))
    )
    return sess.groupBy("user_id").agg(
        F.max("sess_id").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


def asof_latest_order(spark, sf_dir):
    """As-of join: each event joined to the same customer's latest order
    at event time (Spark lacks a native as-of join — composed as a range
    join + max_by reduction)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    o = _t(spark, sf_dir, "orders")
    j = ev.join(o, (ev.user_id == o.o_custkey) & (o.o_orderdate <= ev.ts), "inner")
    return j.groupBy("event_id").agg(
        F.max_by(
            F.struct(F.col("o_orderkey"), F.col("o_totalprice")),
            F.struct(F.col("o_orderdate"), F.col("o_orderkey")),
        ).alias("w")
    ).select(
        "event_id",
        F.col("w.o_orderkey").alias("asof_orderkey"),
        F.col("w.o_totalprice").alias("asof_totalprice"),
    )


def percentile_value_by_type(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.9), 4).alias("p90"),
    )


def set_ops_customers(spark, sf_dir):
    """UNION/INTERSECT/EXCEPT cardinalities in ONE lazy plan (a single
    full-outer join of the two distinct key sets + one aggregate) — no
    eager driver-side .count() actions."""
    o = _t(spark, sf_dir, "orders")
    f = (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_custkey").distinct()
        .withColumn("in_f", F.lit(1))
    )
    op = (
        o.filter(F.col("o_orderstatus") == "O")
        .select("o_custkey").distinct()
        .withColumn("in_o", F.lit(1))
    )
    return f.join(op, "o_custkey", "full_outer").agg(
        F.count(F.lit(1)).alias("n_union"),
        F.count(F.when(F.col("in_f").isNotNull() & F.col("in_o").isNotNull(), 1)).alias("n_intersect"),
        F.count(F.when(F.col("in_f").isNotNull() & F.col("in_o").isNull(), 1)).alias("n_except"),
    )


# --------------------------------------------------------------------------
# documents: text analysis + dedup
# --------------------------------------------------------------------------


def doc_token_count(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return d.select("doc_id", token_count(F.col("text")).alias("n_tokens"))


def doc_quality(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    feats = quality_features(F.col("text"))
    return d.select("doc_id", *[feats[k].alias(k) for k in feats])


def doc_lang_id(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    scores = lang_scores(F.col("text"))
    return d.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_STOPWORDS],
        lang_id(F.col("text")).alias("lang_pred"),
    )


def doc_fingerprint(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


def url_canonical_dedup(spark, sf_dir):
    """Web-key hygiene: four messy variants of each page URL (default
    port + tracking param + trailing slash, host case, unsorted params,
    fragment) are synthesized per document and grouped by canonical URL.
    The oracle computes the canonical forms directly from the same
    arithmetic — a canonicalization bug shows up as a group mismatch."""
    from patuha_etl_dlt_spark.functions.url import canonical_url_groups

    d = _spread(_t(spark, sf_dir, "documents").select("doc_id"), "doc_id")
    pid = (F.col("doc_id") % 50).cast("string")
    h = ((F.col("doc_id") % 50) % 7).cast("string")
    m = F.col("doc_id") % 5
    raw = (
        F.when(m == 0, F.concat(F.lit("http://site"), h, F.lit(".example:80/page/"), pid, F.lit("/?utm_source=x")))
        .when(m == 1, F.concat(F.lit("http://Site"), h, F.lit(".example/page/"), pid))
        .when(m == 2, F.concat(F.lit("http://site"), h, F.lit(".example/page/"), pid, F.lit("?b=2&a=1")))
        .when(m == 3, F.concat(F.lit("http://site"), h, F.lit(".example/page/"), pid, F.lit("#frag")))
        # '?' inside the fragment — must NOT become a query
        .otherwise(F.concat(F.lit("http://site"), h, F.lit(".example/page/"), pid, F.lit("#/route?x=1")))
    )
    return canonical_url_groups(d.select(raw.alias("url")))


def dedup_exact_docs(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return exact_duplicate_groups(d, "doc_id", "text")


def dedup_ngram_jaccard(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5).withColumn(
        "jaccard", F.col("jaccard").cast("double")
    )


def dedup_minhash_lsh(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return minhash_lsh_pairs(d, "doc_id", "text", n_hashes=64, bands=16, verify_threshold=0.5).withColumn(
        "jaccard", F.col("jaccard").cast("double")
    )


def dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs with the SQL-portable token hash (md5_60),
    so the ENTIRE pipeline — tokenization, per-bit vote sums, fingerprint
    assembly, Hamming threshold — is value-checked against a DuckDB
    all-pairs oracle (banding has exact recall by pigeonhole, so the
    banded join and the all-pairs join must produce identical pairs)."""
    d = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return simhash_near_pairs(d, "doc_id", "text", max_hamming=3, token_hash="md5_60")


# --------------------------------------------------------------------------
# embeddings: similarity search
# --------------------------------------------------------------------------


def ann_cosine_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return cosine_topk(_spread(e, "vec_id"), e.filter(F.col("vec_id") < 5), k=10)


def ann_lsh_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return lsh_cosine_topk(_spread(e, "vec_id"), e.filter(F.col("vec_id") < 5), k=10, n_bits=8, dim=64)


def dedup_embedding_near(spark, sf_dir):
    e = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    return embedding_near_pairs(e, threshold=0.45)


def dedup_embedding_near_lsh(spark, sf_dir):
    e = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    return embedding_near_pairs(e, threshold=0.45, n_bits=4, dim=64)


# --------------------------------------------------------------------------
# multimodal (binary payload plumbing; decode kernel stubbed deterministic)
# --------------------------------------------------------------------------


def multimodal_meta(spark, sf_dir):
    d = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return d.select(
        "doc_id",
        F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        F.ascii(F.col("text")).alias("first_cp"),
    )


# (the former media_decode_stub gate — the deterministic-fake decode
# kernel — is redundant with media_decode, which oracles the same
# mapInPandas plumbing with a REAL header decoder; the fake kernel stays
# covered by tests/test_operators.py::test_decode_media_fake_kernel)


def media_decode(spark, sf_dir):
    """REAL media decode (oracle-checked): synthesize a valid 24-bpp BMP per
    document (dimensions derived from doc_id), parse it back with the
    header-decoding kernel (struct/numpy — no codec lib), and emit the
    parsed dimensions. The oracle mirrors the *generator* arithmetic, so a
    header-parsing bug shows up as a value mismatch."""
    import pandas as pd

    from patuha_etl_dlt_spark.operators.multimodal import MEDIA_SCHEMA, synth_bmp

    d = _spread(_t(spark, sf_dir, "documents").select("doc_id"), "doc_id")

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "image",
                    "payload": [synth_bmp(1 + int(i) % 64, 1 + int(i) % 48, fill=int(i)) for i in ids],
                }
            )

    media = d.mapInPandas(gen, MEDIA_SCHEMA)
    return decode_media(media, decode_kernel="headers").select(
        "media_id", "n_bytes", "width", "height", "n_frames"
    )


def media_decode_png(spark, sf_dir):
    """REAL compressed-format decode (oracle-checked): synthesize a valid
    zlib-compressed RGB PNG per document (dimensions and fill derived from
    doc_id), decode it back with the stdlib PNG kernel (chunk walk +
    inflate + scanline unfilter — no codec library), and emit the parsed
    dimensions plus the hot histogram bin of the DECODED grayscale pixels.
    A solid fill=v image decodes to all-v pixels, so the feature is a
    one-hot at v % 8 — the oracle mirrors the generator arithmetic, and a
    wrong inflate/unfilter/luma anywhere breaks the value match. n_bytes
    is excluded (zlib output size is not arithmetic)."""
    import pandas as pd

    from patuha_etl_dlt_spark.operators.multimodal import MEDIA_SCHEMA, synth_png

    d = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "image",
                    "payload": [
                        synth_png(1 + int(i) % 61, 1 + int(i) % 37, fill=int(i))
                        for i in ids
                    ],
                }
            )

    media = d.mapInPandas(gen, MEDIA_SCHEMA)
    return decode_media(media, decode_kernel="png").select(
        "media_id",
        "width",
        "height",
        "n_frames",
        F.array_position(F.col("feature"), F.lit(1.0).cast("float")).alias("feature_hot"),
    )


# --------------------------------------------------------------------------
# oracle SQL builders (DuckDB dialect) for the text formulas
# --------------------------------------------------------------------------


def _sql_occ(s: str, sub: str) -> str:
    return f"((length({s}) - length(replace({s}, '{sub}', ''))) // {len(sub)})"


def _sql_word_occ(text: str, word: str) -> str:
    padded = f"(' ' || replace({text}, ' ', '  ') || ' ')"
    return _sql_occ(padded, f" {word} ")


def _sql_stop_count(text: str, lang: str) -> str:
    return " + ".join(_sql_word_occ(text, w) for w in LANG_STOPWORDS[lang])


def _sql_token_count(text: str) -> str:
    return (
        f"CASE WHEN {text} IS NULL THEN NULL "
        f"WHEN length(trim({text})) = 0 THEN 0 "
        f"ELSE len(string_split_regex(trim({text}), '\\s+')) END"
    )


def _sql_punct(text: str) -> str:
    from patuha_etl_dlt_spark.functions.sanitize import MAX_STRING_BYTES  # noqa: F401
    from patuha_etl_dlt_spark.functions.text import PUNCT_CHARS

    return " + ".join(_sql_occ(text, ch) for ch in PUNCT_CHARS)


def _quality_sql() -> str:
    """Mirror of quality_features — pure integer arithmetic (// division),
    so values are bit-identical across engines by construction."""
    t = "text"
    n_tokens = _sql_token_count(t)
    return f"""
WITH f AS (
  SELECT doc_id,
         length(text) AS n_chars,
         {n_tokens} AS n_tokens,
         length(replace(text, ' ', '')) AS cns,
         {_sql_stop_count(t, 'en')} AS stop_cnt,
         {_sql_punct(t)} AS punct_cnt
  FROM documents
), g AS (
  SELECT doc_id, n_chars, n_tokens,
         (cns * 1000) // nullif(n_tokens, 0) AS mean_token_len_milli,
         (stop_cnt * 10000) // nullif(n_tokens, 0) AS stopword_per_10k,
         (punct_cnt * 10000) // nullif(n_chars, 0) AS punct_per_10k
  FROM f
)
SELECT doc_id, n_chars, n_tokens, mean_token_len_milli, stopword_per_10k, punct_per_10k,
       (least((n_tokens * 10000) // 64, 10000) * 5
        + least(coalesce(stopword_per_10k, 0) * 4, 10000) * 3
        + least((coalesce(mean_token_len_milli, 0) * 10) // 8, 10000) * 2) // 10 AS quality_bp
FROM g
"""


def _lang_sql() -> str:
    t = "text"
    scores = {lang: _sql_stop_count(t, lang) for lang in LANG_STOPWORDS}
    sel = ", ".join(f"({s}) AS score_{lang}" for lang, s in scores.items())
    return f"""
WITH s AS (SELECT doc_id, {sel} FROM documents)
SELECT doc_id, score_en, score_de, score_fr, score_id,
       CASE WHEN score_en = 0 AND score_de = 0 AND score_fr = 0 AND score_id = 0 THEN 'und'
            WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_id THEN 'en'
            WHEN score_de >= score_fr AND score_de >= score_id THEN 'de'
            WHEN score_fr >= score_id THEN 'fr'
            ELSE 'id' END AS lang_pred
FROM s
"""


_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

_JACCARD_SQL = f"""
WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
  FROM words WHERE len(w) >= 3
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(c / (sa.sz + sb.sz - c), 4)::DOUBLE AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = common.id_a
JOIN sizes sb ON sb.doc_id = common.id_b
WHERE round(c / (sa.sz + sb.sz - c), 4) >= 0.5
"""

def _simhash_sql(max_hamming: int = 3) -> str:
    """The simhash pipeline re-expressed in DuckDB: same tokenization
    (normalize + split on single spaces, ALL occurrences), same md5_60
    token hash (low 60 bits of md5 via hex→int), same per-bit ±1 vote
    sums, same fingerprint assembly. The pair join is all-pairs Hamming
    (the engine's pigeonhole banding is recall-exact, so the outputs must
    be set-identical)."""
    sums = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}" for j in range(60)
    )
    fp = " + ".join(f"(CASE WHEN b{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END)" for j in range(60))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok FROM documents
), hashed AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
), votes AS (
  SELECT doc_id,
         {sums}
  FROM hashed GROUP BY doc_id
), sh AS (
  SELECT doc_id, {fp} AS simhash FROM votes
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def _bucket_sql(vec_expr: str, planes: list[list[float]]) -> str:
    """The engine's sign-LSH bucket id as DuckDB SQL: the hyperplanes are
    plain literals (seeded, deterministic), so the projection is writable
    as arithmetic — verified bit-identical to the Spark expression over the
    whole embeddings table."""
    terms = []
    for i, p in enumerate(planes):
        arr = "[" + ",".join(repr(x) for x in p) + "]::DOUBLE[]"
        terms.append(f"(CASE WHEN list_dot_product({vec_expr}, {arr}) > 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _ann_lsh_sql(n_bits: int = 8, dim: int = 64, k: int = 10) -> str:
    from patuha_etl_dlt_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_bits)
    probes = ", ".join(["qb"] + [f"xor(qb, {1 << i})" for i in range(n_bits)])
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
b AS (SELECT vec_id, e, {_bucket_sql('e', planes)} AS bkt FROM v),
q AS (SELECT vec_id AS query_id, e AS qe, bkt AS qb FROM b WHERE vec_id < 5),
probes AS (SELECT query_id, unnest([{probes}]) AS bkt FROM q),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
  FROM probes p JOIN b c ON c.bkt = p.bkt
  WHERE c.vec_id <> p.query_id
), scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         list_dot_product(q.qe, c.e)
           / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.e, c.e))) AS cos
  FROM cand JOIN q USING (query_id) JOIN b c ON c.vec_id = cand.neighbor_id
), r AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 6)::DOUBLE AS cosine FROM r WHERE rank <= {k}
"""


def _embedding_near_lsh_sql(n_bits: int = 4, dim: int = 64, threshold: float = 0.45) -> str:
    from patuha_etl_dlt_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_bits)
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
b AS (SELECT vec_id, e, {_bucket_sql('e', planes)} AS bkt FROM v),
p AS (
  SELECT a.vec_id AS id_a, c.vec_id AS id_b,
         list_dot_product(a.e, c.e)
           / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.e, c.e))) AS cos
  FROM b a JOIN b c ON a.bkt = c.bkt AND a.vec_id < c.vec_id
)
SELECT id_a, id_b, round(cos, 6)::DOUBLE AS cosine FROM p WHERE round(cos, 6) >= {threshold}
"""


_MEDIA_DECODE_SQL = """
SELECT doc_id AS media_id,
       54 + ((3 * (1 + doc_id % 64) + 3) // 4) * 4 * (1 + doc_id % 48) AS n_bytes,
       (1 + doc_id % 64)::INT AS width,
       (1 + doc_id % 48)::INT AS height,
       1::INT AS n_frames
FROM documents
"""


# a solid fill=v RGB PNG decodes to all-v gray pixels (ITU-R 601-2 luma of
# (v,v,v) is v), so the 8-bin histogram is a one-hot at v % 8 and
# array_position(feature, 1.0) = (doc_id % 8) + 1 (1-based)
_MEDIA_DECODE_PNG_SQL = """
SELECT doc_id AS media_id,
       (1 + doc_id % 61)::INT AS width,
       (1 + doc_id % 37)::INT AS height,
       1::INT AS n_frames,
       (doc_id % 8 + 1)::BIGINT AS feature_hot
FROM documents
"""


_ANN_SQL = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         list_dot_product(q.qe, v.e)
           / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(v.e, v.e))) AS cos
  FROM v CROSS JOIN q
  WHERE v.vec_id <> q.query_id
), r AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 6)::DOUBLE AS cosine FROM r WHERE rank <= 10
"""


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return cdc_apply_deletes_lake(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # CDC engine surface
        "cdc_lww_window": cdc_lww_window,
        "cdc_lww_agg": cdc_lww_agg,
        "cdc_lww_semijoin": cdc_lww_semijoin,
        "cdc_lww_salted": cdc_lww_salted,
        "cdc_apply_deletes_lake": cdc_apply_deletes_lake,
        "cdc_pull_cycle": cdc_pull_cycle,
        "cdc_snapshot_diff": cdc_snapshot_diff,
        "cdc_incremental_scan": cdc_incremental_scan,
        "cdc_watermark": cdc_watermark,
        "cdc_new_records_count": cdc_new_records_count,
        "cdc_op_counts": cdc_op_counts,
        "cdc_users_per_type": cdc_users_per_type,
        "cdc_sanitize_props": cdc_sanitize_props,
        "cdc_diagnose_props": cdc_diagnose_props,
        "cdc_parse_timestamps": cdc_parse_timestamps,
        "events_rollup_incremental": events_rollup_incremental,
        "events_hourly_rollup": events_hourly_rollup,
        # relational coverage
        "tpch_q1": tpch_q1,
        "revenue_by_nation": revenue_by_nation,
        "topk_customers": topk_customers,
        "window_order_rank": window_order_rank,
        "anti_join_customers": anti_join_customers,
        "rollup_orders": rollup_orders,
        "pivot_status_by_priority": pivot_status_by_priority,
        "sessionize_events": sessionize_events,
        "asof_latest_order": asof_latest_order,
        "percentile_value_by_type": percentile_value_by_type,
        "set_ops_customers": set_ops_customers,
        # documents: text analysis + dedup tiers
        "doc_token_count": doc_token_count,
        "doc_quality": doc_quality,
        "doc_lang_id": doc_lang_id,
        "doc_fingerprint": doc_fingerprint,
        "url_canonical_dedup": url_canonical_dedup,
        "dedup_exact_docs": dedup_exact_docs,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_simhash_pairs": dedup_simhash_pairs,
        # embeddings: similarity search
        "ann_cosine_topk": ann_cosine_topk,
        "ann_lsh_topk": ann_lsh_topk,
        "dedup_embedding_near": dedup_embedding_near,
        "dedup_embedding_near_lsh": dedup_embedding_near_lsh,
        # multimodal
        "multimodal_meta": multimodal_meta,
        "media_decode": media_decode,
        "media_decode_png": media_decode_png,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles — one per queries() entry (every gate is
    value-checked; nothing is rows-only). dedup_simhash_pairs is oracled
    via the SQL-portable md5_60 token hash: the whole pipeline (tokenize
    → per-bit vote sums → fingerprint → Hamming≤k pairs) is re-expressed
    in DuckDB, with an all-pairs join standing in for the recall-exact
    pigeonhole banding.

    dedup_minhash_lsh uses the exact-Jaccard oracle: the verification step
    makes precision 1.0, and at this corpus's similarity profile (planted
    near-dups at jaccard ≥0.8, where banded-64/16 recall ≥0.999) the LSH
    output equals the exact output — verified set-identical at sf0.01.
    The sign-LSH gates are oracled by re-expressing the (literal, seeded)
    hyperplane projections as DuckDB arithmetic — verified bit-identical
    buckets on the full embeddings table."""
    return {
        "cdc_lww_window": _LWW_ORACLE,
        "cdc_lww_agg": _LWW_ORACLE,
        "cdc_lww_semijoin": _LWW_ORACLE,
        "cdc_lww_salted": _LWW_ORACLE,
        "cdc_apply_deletes_lake": _APPLY_ORACLE,
        "cdc_pull_cycle": _PULL_ORACLE,
        "cdc_snapshot_diff": _SNAPDIFF_ORACLE,
        "cdc_incremental_scan": f"""
            SELECT event_type, count(*) AS n,
                   round(sum(CAST(value AS DECIMAL(18,6))), 4)::DOUBLE AS total_value
            FROM events WHERE ts > TIMESTAMP '{WM}' GROUP BY event_type
        """,
        "cdc_watermark": "SELECT max(ts) AS max_ts, count(*) AS n FROM events",
        "cdc_new_records_count": f"SELECT count(*) AS n_new FROM events WHERE ts > TIMESTAMP '{WM}'",
        "cdc_op_counts": "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
        "cdc_users_per_type": "SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY event_type",
        "cdc_sanitize_props": """
            SELECT event_id,
                   CASE WHEN trim(replace(props, chr(0), '')) = '' THEN NULL
                        ELSE replace(props, chr(0), '') END AS props_clean
            FROM events WHERE event_id < 500
        """,
        "cdc_diagnose_props": """
            SELECT event_id, 'props' AS "column", 'nul_byte' AS problem,
                   substring(hex((props || chr(0) || 'x')::BLOB), 1, 64) AS value_hex
            FROM events
            WHERE event_id < 2000 AND event_id % 7 = 0 AND props IS NOT NULL
        """,
        "cdc_parse_timestamps": """
            SELECT event_id,
                   ts AS ts_z,
                   ts - INTERVAL 7 HOUR AS ts_bkk,
                   ts - INTERVAL 7 HOUR AS ts_localized,
                   NULL::TIMESTAMP AS ts_bad
            FROM events WHERE event_id < 200
        """,
        "events_rollup_incremental": """
            SELECT event_type, count(*) AS n,
                   round(sum(CAST(value AS DECIMAL(18,6))), 4)::DOUBLE AS total_value,
                   max(ts) AS max_ts
            FROM events GROUP BY event_type
        """,
        "events_hourly_rollup": """
            SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
                   round(sum(CAST(value AS DECIMAL(18,6))), 4)::DOUBLE AS total_value
            FROM events GROUP BY 1, 2
        """,
        "tpch_q1": f"""
            SELECT l_returnflag, l_linestatus,
                   round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2)::DOUBLE AS sum_qty,
                   round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2)::DOUBLE AS sum_base_price,
                   round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                             * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2)::DOUBLE AS sum_disc_price,
                   round(avg(CAST(l_quantity AS DECIMAL(18,6))), 4)::DOUBLE AS avg_qty,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '{Q1_DATE}'
            GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name, r_name,
                   round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)::DOUBLE AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY n_name, r_name
        """,
        "topk_customers": """
            SELECT custkey, total, rnk FROM (
              SELECT custkey, total,
                     row_number() OVER (ORDER BY total DESC, custkey) AS rnk
              FROM (SELECT o_custkey AS custkey,
                           round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)::DOUBLE AS total
                    FROM orders GROUP BY o_custkey))
            WHERE rnk <= 10
        """,
        "window_order_rank": """
            SELECT o_orderkey, o_custkey, rnk FROM (
              SELECT o_orderkey, o_custkey,
                     row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rnk
              FROM orders)
            WHERE rnk <= 2
        """,
        "anti_join_customers": """
            SELECT DISTINCT o_custkey AS custkey FROM orders o1
            WHERE o_orderstatus = 'F'
              AND NOT EXISTS (SELECT 1 FROM orders o2
                              WHERE o2.o_custkey = o1.o_custkey AND o2.o_orderstatus = 'O')
        """,
        "rollup_orders": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                   round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)::DOUBLE AS revenue
            FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "pivot_status_by_priority": """
            SELECT o_orderpriority,
                   count(*) FILTER (o_orderstatus = 'O') AS n_open,
                   count(*) FILTER (o_orderstatus = 'F') AS n_filled,
                   count(*) FILTER (o_orderstatus = 'P') AS n_pending
            FROM orders GROUP BY o_orderpriority
        """,
        "sessionize_events": """
            WITH g AS (
              SELECT user_id,
                     CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                          OR epoch(ts) - lag(epoch(ts)) OVER w > 3600 THEN 1 ELSE 0 END AS new_sess
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, sum(new_sess)::BIGINT AS n_sessions, count(*) AS n_events
            FROM g GROUP BY user_id
        """,
        "asof_latest_order": """
            SELECT event_id, asof_orderkey, asof_totalprice FROM (
              SELECT e.event_id, o.o_orderkey AS asof_orderkey, o.o_totalprice AS asof_totalprice,
                     row_number() OVER (PARTITION BY e.event_id
                                        ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
              FROM events e JOIN orders o
                ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
              WHERE e.event_id < 1000)
            WHERE rn = 1
        """,
        "percentile_value_by_type": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 4) AS p50,
                   round(quantile_cont(value, 0.9), 4) AS p90
            FROM events GROUP BY event_type
        """,
        "set_ops_customers": """
            WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
                 o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
            SELECT (SELECT count(*) FROM (SELECT * FROM f UNION SELECT * FROM o)) AS n_union,
                   (SELECT count(*) FROM (SELECT * FROM f INTERSECT SELECT * FROM o)) AS n_intersect,
                   (SELECT count(*) FROM (SELECT * FROM f EXCEPT SELECT * FROM o)) AS n_except
        """,
        "doc_token_count": f"SELECT doc_id, {_sql_token_count('text')} AS n_tokens FROM documents",
        "doc_quality": _quality_sql(),
        "doc_lang_id": _lang_sql(),
        "doc_fingerprint": f"SELECT doc_id, md5({_NORM}) AS fp FROM documents",
        "url_canonical_dedup": """
            WITH d AS (
              SELECT doc_id, doc_id % 50 AS pid, (doc_id % 50) % 7 AS h, doc_id % 5 AS m
              FROM documents
            ), r AS (
              SELECT CASE m
                       WHEN 0 THEN 'http://site' || h || '.example:80/page/' || pid || '/?utm_source=x'
                       WHEN 1 THEN 'http://Site' || h || '.example/page/' || pid
                       WHEN 2 THEN 'http://site' || h || '.example/page/' || pid || '?b=2&a=1'
                       WHEN 3 THEN 'http://site' || h || '.example/page/' || pid || '#frag'
                       ELSE 'http://site' || h || '.example/page/' || pid || '#/route?x=1'
                     END AS raw,
                     'http://site' || h || '.example/page/' || pid
                       || CASE WHEN m = 2 THEN '?a=1&b=2' ELSE '' END AS canonical_url
              FROM d
            )
            SELECT canonical_url, count(*) AS n_variants, min(raw) AS first_raw
            FROM r GROUP BY canonical_url
        """,
        "dedup_exact_docs": f"""
            SELECT min(doc_id) AS canonical_id, count(*) AS n_docs, md5(norm) AS fingerprint
            FROM (SELECT doc_id, {_NORM} AS norm FROM documents)
            GROUP BY norm
        """,
        "dedup_ngram_jaccard": _JACCARD_SQL,
        "dedup_minhash_lsh": _JACCARD_SQL,
        "dedup_simhash_pairs": _simhash_sql(max_hamming=3),
        "ann_cosine_topk": _ANN_SQL,
        "ann_lsh_topk": _ann_lsh_sql(n_bits=8, dim=64, k=10),
        "dedup_embedding_near_lsh": _embedding_near_lsh_sql(n_bits=4, dim=64, threshold=0.45),
        "media_decode": _MEDIA_DECODE_SQL,
        "media_decode_png": _MEDIA_DECODE_PNG_SQL,
        "dedup_embedding_near": """
            WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.e, b.e)
                         / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.e, b.e)
                        / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.45
        """,
        "multimodal_meta": """
            SELECT doc_id, octet_length(encode(text)) AS n_bytes, ascii(text) AS first_cp
            FROM documents
        """,
    }
