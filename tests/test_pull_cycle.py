"""Closed-loop pull cycle: checkpointed cursor → pushed-down incremental
source scan → source-introspection schema evolution → exactly-once MERGE →
cursor advance. This is the reference's actual entry point
(``db_pipeline.py:75-94`` + ``get_max_timestamp``
``pipeline_management.py:39-56`` + INFORMATION_SCHEMA evolution
``schema_management.py:11-57``) closed end-to-end, verified against a real
SQL database (embedded Derby)."""

from __future__ import annotations

import pytest

from patuha_etl_dlt_spark.cdc.orchestrator import SyncOrchestrator
from patuha_etl_dlt_spark.config import TableConfig
from patuha_etl_dlt_spark.sources.jdbc import JdbcSourceConfig

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby(spark, tmp_path):
    db = tmp_path / "pulldb"
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE items (id BIGINT PRIMARY KEY, seq BIGINT, name VARCHAR(64))"
    )
    for i in range(100):
        st.executeUpdate(f"INSERT INTO items VALUES ({i}, {i}, 'name {i}')")

    def exec_sql(sql: str) -> None:
        st.executeUpdate(sql)

    yield f"jdbc:derby:{db}", exec_sql
    st.close()
    conn.close()


def make_orch(spark, tmp_path, url, num_buckets=4) -> SyncOrchestrator:
    # Derby folds unquoted identifiers to upper-case, so the lake columns
    # carry the names the JDBC scan actually returns
    cfg = TableConfig(
        table="items",
        merge_key=("ID",),
        cursor="SEQ",
        columns=(("ID", "long"), ("SEQ", "long"), ("NAME", "string")),
        num_buckets=num_buckets,
    )
    src = JdbcSourceConfig(url=url, table="items", cursor_col="seq", driver=DRIVER)
    return SyncOrchestrator(spark, str(tmp_path / "sync"), [cfg], sources={"items": src})


def test_pull_cycle_derby_end_to_end(spark, tmp_path, derby):
    url, exec_sql = derby
    orch = make_orch(spark, tmp_path, url)

    # cycle 1: cold checkpoint + empty target → full extract
    (r1,) = orch.pull_cycle("c1")
    assert r1.status == "perfect" and r1.metrics["rows_pulled"] == 100
    assert "WHERE" not in r1.metrics["source_query"]
    t = orch.engine("items").table
    assert t.read().count() == 100
    assert orch.engine("items").cp.cursor() == 99

    # upstream inserts + an update with a higher cursor
    for i in range(100, 150):
        exec_sql(f"INSERT INTO items VALUES ({i}, {i}, 'name {i}')")
    exec_sql("UPDATE items SET seq = 150, name = 'renamed 7' WHERE id = 7")

    # cycle 2: ONLY the new/changed rows, predicate pushed to the DB
    (r2,) = orch.pull_cycle("c2")
    assert r2.status == "perfect" and r2.metrics["rows_pulled"] == 51
    assert "WHERE seq > 99" in r2.metrics["source_query"]
    assert r2.metrics["last_value"] == 99 and r2.metrics["cursor"] == 150
    state = {r["ID"]: r["NAME"] for r in t.read().collect()}
    assert len(state) == 150 and state[7] == "renamed 7"

    # cycle 3: nothing new → no-op, cursor parked
    (r3,) = orch.pull_cycle("c3")
    assert r3.metrics["rows_pulled"] == 0
    assert orch.engine("items").cp.cursor() == 150
    assert t.read().count() == 150

    # replaying a whole cycle id is exactly-once end-to-end
    (r2b,) = orch.pull_cycle("c2")
    assert r2b.status == "skipped"
    assert t.read().count() == 150


def test_pull_cycle_source_schema_evolution(spark, tmp_path, derby):
    url, exec_sql = derby
    orch = make_orch(spark, tmp_path, url)
    orch.pull_cycle("c1")

    # the source table grows a column upstream (reference
    # schema_management.py:79-104: INFORMATION_SCHEMA diff → ALTER ADD)
    exec_sql("ALTER TABLE items ADD COLUMN extra INTEGER")
    exec_sql("INSERT INTO items VALUES (200, 200, 'with extra', 7)")

    (r,) = orch.pull_cycle("c2")
    assert {"kind": "add", "name": "EXTRA", "typ": "int"} in r.metrics["evolution_ops"]
    t = orch.engine("items").table
    assert "EXTRA" in [f.name for f in t.schema.fields]
    rows = {r["ID"]: r["EXTRA"] for r in t.read().collect()}
    assert rows[200] == 7 and rows[0] is None  # old + new generations coexist


def test_pull_cycle_callable_source_widen_and_cold_restart(spark, tmp_path):
    """(a) a source whose cursor/value column WIDENS upstream (int→long)
    evolves the lake column before apply; (b) a fresh checkpoint dir
    against an existing target re-derives the cursor from the target (the
    reference's get_max_timestamp fallback) instead of re-pulling history."""
    import shutil

    pulls = []

    def source(spark_, last):
        pulls.append(last)
        if len(pulls) <= 2:
            return spark_.createDataFrame(
                [(i, i, i * 10) for i in range(5)], "k long, c long, v int"
            ).filter(f"c > {-1 if last is None else last}")
        # later generation: v widened to long upstream, new rows
        return spark_.createDataFrame(
            [(i, i, i * 10_000_000_000) for i in range(5, 8)], "k long, c long, v long"
        ).filter(f"c > {-1 if last is None else last}")

    cfg = TableConfig(
        table="w", merge_key=("k",), cursor="c",
        columns=(("k", "long"), ("c", "long"), ("v", "int")), num_buckets=4,
    )
    orch = SyncOrchestrator(spark, str(tmp_path / "sync"), [cfg], sources={"w": source})
    (r1,) = orch.pull_cycle("c1")
    assert r1.metrics["rows_pulled"] == 5 and pulls[-1] is None

    # cold restart: wipe ONLY the checkpoint state; target survives
    shutil.rmtree(str(tmp_path / "sync" / "checkpoints" / "w"))
    orch2 = SyncOrchestrator(spark, str(tmp_path / "sync"), [cfg], sources={"w": source})
    (r2,) = orch2.pull_cycle("c2")
    # cursor re-derived from the target (max c == 4): nothing re-pulled
    assert pulls[-1] == 4 and r2.metrics["rows_pulled"] == 0

    (r3,) = orch2.pull_cycle("c3")
    assert {"kind": "widen", "name": "v", "typ": "long"} in r3.metrics["evolution_ops"]
    t = orch2.engine("w").table
    assert dict((f.name, f.type) for f in t.schema.fields)["v"] == "long"
    vals = {r["k"]: r["v"] for r in t.read().collect()}
    assert vals[0] == 0 and vals[7] == 70_000_000_000 and len(vals) == 8


def test_pull_cycle_crash_between_merge_and_checkpoint_heals(spark, tmp_path):
    """If the MERGE commits but the checkpoint doesn't (crash window),
    re-running the same cycle id heals: merge skips (batch-id), checkpoint
    is re-committed, and the NEXT cycle converges by re-pulling the gap
    (LWW re-application is idempotent)."""
    import os

    def source(spark_, last):
        return spark_.createDataFrame(
            [(i, i, f"n{i}") for i in range(10)], "k long, c long, n string"
        ).filter(f"c > {-1 if last is None else last}")

    cfg = TableConfig(
        table="h", merge_key=("k",), cursor="c",
        columns=(("k", "long"), ("c", "long"), ("n", "string")), num_buckets=4,
    )
    orch = SyncOrchestrator(spark, str(tmp_path / "sync"), [cfg], sources={"h": source})
    orch.pull_cycle("c1")
    eng = orch.engine("h")
    assert eng.cp.cursor() == 9

    # simulate the crash: the checkpoint write never happened
    os.unlink(eng.cp.state_path)
    assert eng.cp.cursor() is None

    (r,) = orch.pull_cycle("c1")  # same cycle id replayed after "restart"
    assert r.status == "skipped" and eng.cp.has_batch("c1:h")

    # next cycle: cursor re-derived from target, gap re-pull converges
    (r2,) = orch.pull_cycle("c2")
    assert r2.metrics["rows_pulled"] == 0
    assert eng.table.read().count() == 10 and eng.cp.cursor() == 9


def test_pull_cycle_dynamic_partition_bounds(spark, tmp_path, derby):
    """A JDBC source with partition_col but NO static bounds gets
    per-cycle bounds probed from the current incremental window, so the
    range-partitioned parallel pull follows the growing table; an empty
    window degrades to an unpartitioned scan."""
    url, exec_sql = derby
    cfg = TableConfig(
        table="items", merge_key=("ID",), cursor="SEQ",
        columns=(("ID", "long"), ("SEQ", "long"), ("NAME", "string")), num_buckets=4,
    )
    src = JdbcSourceConfig(
        url=url, table="items", cursor_col="seq",
        partition_col="seq", num_partitions=4, driver=DRIVER,
    )
    orch = SyncOrchestrator(spark, str(tmp_path / "sync"), [cfg], sources={"items": src})
    orch.engine("items")

    df, desc = orch._build_scan("items", None)
    assert df.rdd.getNumPartitions() == 4 and df.count() == 100
    assert "range-partitioned x4" in desc and "0..99" in desc

    (r1,) = orch.pull_cycle("c1")
    assert r1.status == "perfect" and r1.metrics["rows_pulled"] == 100
    assert "range-partitioned" in r1.metrics["source_query"]

    # the window moved: bounds re-probed per cycle, not reused stale
    for i in range(100, 140):
        exec_sql(f"INSERT INTO items VALUES ({i}, {i}, 'name {i}')")
    df2, desc2 = orch._build_scan("items", 99)
    assert df2.count() == 40 and "100..139" in desc2

    (r2,) = orch.pull_cycle("c2")
    assert r2.metrics["rows_pulled"] == 40
    assert orch.engine("items").table.read().count() == 140

    # empty window: probe returns None → unpartitioned no-op scan
    df3, desc3 = orch._build_scan("items", 139)
    assert df3.count() == 0 and "range-partitioned" not in desc3


def test_run_pull_loop_resumes_numbering_and_heals(spark, tmp_path):
    """The continuous loop (reference db_pipeline.py:75-94) numbers cycles
    from committed history on restart: the last cycle id replays first
    (idempotent heal), then fresh cycles proceed; a snapshot-mode table
    full-refreshes every cycle alongside."""
    feed = {"rows": [(i, i, f"n{i}") for i in range(6)]}

    def cdc_source(spark_, last):
        return spark_.createDataFrame(feed["rows"], "k long, c long, n string").filter(
            f"c > {-1 if last is None else last}"
        )

    def snap_source(spark_, last):
        return spark_.createDataFrame(feed["rows"], "k long, c long, n string")

    cfgs = [
        TableConfig(table="t1", merge_key=("k",), cursor="c",
                    columns=(("k", "long"), ("c", "long"), ("n", "string")), num_buckets=4),
        TableConfig(table="s1", merge_key=("k",), cursor="", mode="snapshot",
                    columns=(("k", "long"), ("c", "long"), ("n", "string")), num_buckets=4),
    ]
    orch = SyncOrchestrator(
        spark, str(tmp_path / "sync"), cfgs,
        sources={"t1": cdc_source, "s1": snap_source},
    )
    rounds = orch.run_pull_loop(max_cycles=2)
    assert len(rounds) == 2
    assert {r.table: r.status for r in rounds[0]} == {"t1": "perfect", "s1": "perfect"}
    assert rounds[1][0].metrics["rows_pulled"] == 0  # cdc: nothing new
    assert rounds[1][1].status == "perfect"  # snapshot: refreshed again
    assert orch.engine("t1").cp.status()["cursor"] == 5

    # "restart": a new orchestrator resumes numbering — first cycle is the
    # idempotent replay of cycle-1, then cycle-2 picks up the new rows
    feed["rows"] = feed["rows"] + [(6, 6, "n6")]
    orch2 = SyncOrchestrator(
        spark, str(tmp_path / "sync"), cfgs,
        sources={"t1": cdc_source, "s1": snap_source},
    )
    rounds2 = orch2.run_pull_loop(max_cycles=2)
    assert rounds2[0][0].status == "skipped"  # cycle-1 replay healed
    assert rounds2[1][0].metrics["rows_pulled"] == 1  # cycle-2: the new row
    assert orch2.engine("t1").table.read().count() == 7
    assert orch2.engine("s1").table.read().count() == 7


def test_diff_snapshots_unit(spark):
    """I/U/D derivation with null-safe payload comparison and a column
    the old snapshot lacks (source schema grew)."""
    from patuha_etl_dlt_spark.cdc.snapshot_diff import diff_snapshots

    old = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5), (3, "c", 7), (4, None, 9)],
        "k long, s string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", None, None), (2, "B", 5, None), (4, None, 9, 1), (5, "e", 0, None)],
        "k long, s string, v int, extra int",
    )
    got = {r["k"]: (r["op"], r["s"], r["v"], r["extra"]) for r in
           diff_snapshots(new, old.drop("extra") if "extra" in old.columns else old, "k").collect()}
    # k=1 unchanged (None == None null-safely, extra None vs missing→None)
    assert 1 not in got
    assert got[2] == ("U", "B", 5, None)     # payload changed
    assert got[4] == ("U", None, 9, 1)       # gained a value in the new column
    assert got[5] == ("I", "e", 0, None)     # new key
    assert got[3][0] == "D" and got[3][1] == "c"  # deleted key keeps old payload
    assert len(got) == 4


def test_pull_cycle_snapshot_diff_propagates_deletes(spark, tmp_path):
    """snapshot_diff mode: full pull, merge only derived changes; an
    upstream DELETE lands as a tombstone (the thing cursor CDC can't do),
    a resurrected key comes back, replay is exactly-once."""
    state = {"rows": [(i, f"n{i}", i * 10) for i in range(8)]}

    def source(spark_, last):
        return spark_.createDataFrame(state["rows"], "k long, n string, v long")

    cfg = TableConfig(
        table="sd", merge_key=("k",), cursor="", mode="snapshot_diff",
        columns=(("k", "long"), ("n", "string"), ("v", "long")), num_buckets=4,
    )
    orch = SyncOrchestrator(spark, str(tmp_path / "sync"), [cfg], sources={"sd": source})
    (r1,) = orch.pull_cycle("c1")
    assert r1.metrics["changes"] == 8 and r1.metrics["insert_events"] == 8
    t = orch.engine("sd").table
    assert t.read().count() == 8

    # upstream: delete k=3, update k=5, insert k=8
    state["rows"] = [(i, f"n{i}" if i != 5 else "CHANGED", i * 10)
                     for i in range(8) if i != 3] + [(8, "n8", 80)]
    (r2,) = orch.pull_cycle("c2")
    assert r2.metrics["changes"] == 3
    assert r2.metrics["delete_events"] == 1 and r2.metrics["insert_events"] == 1
    rows = {r["k"]: r["n"] for r in t.read().collect()}
    assert 3 not in rows and rows[5] == "CHANGED" and rows[8] == "n8" and len(rows) == 8
    # the delete is a real tombstone (blocks stale resurrection)
    assert t.read(include_deleted=True, include_system=True).filter("_deleted").count() == 1

    # no upstream change → zero events, zero writes of consequence
    (r3,) = orch.pull_cycle("c3")
    assert r3.metrics["changes"] == 0

    # resurrect k=3 upstream → I event wins over the tombstone
    state["rows"] = state["rows"] + [(3, "back", 30)]
    (r4,) = orch.pull_cycle("c4")
    assert r4.metrics["insert_events"] == 1
    assert {r["k"]: r["n"] for r in t.read().collect()}[3] == "back"

    # replay a committed cycle id: exactly-once end-to-end
    (r2b,) = orch.pull_cycle("c2")
    assert r2b.status == "skipped"
    assert t.read().count() == 9


def test_concurrent_pull_cycle_matches_sequential(spark, tmp_path):
    """pull_cycle with max_concurrency>1 (driver thread pool + FAIR pools,
    mixed cdc/snapshot_diff modes) converges to the same state as a
    sequential orchestrator over the same sources."""
    def mk_sources():
        def cdc_src(spark_, last):
            return spark_.createDataFrame(
                [(i, i, i * 2) for i in range(30)], "k long, c long, v long"
            ).filter(f"c > {-1 if last is None else last}")

        def sd_src(spark_, last):
            return spark_.createDataFrame(
                [(i, f"x{i}") for i in range(20) if i != 7], "k long, s string"
            )

        return {"a": cdc_src, "b": sd_src}

    cfgs = [
        TableConfig(table="a", merge_key=("k",), cursor="c",
                    columns=(("k", "long"), ("c", "long"), ("v", "long")), num_buckets=4),
        TableConfig(table="b", merge_key=("k",), cursor="", mode="snapshot_diff",
                    columns=(("k", "long"), ("s", "string")), num_buckets=8),
    ]

    def final_state(orch):
        return {
            name: sorted(map(tuple, orch.engine(name).table.read().collect()))
            for name in ("a", "b")
        }

    seq = SyncOrchestrator(spark, str(tmp_path / "seq"), cfgs, sources=mk_sources())
    con = SyncOrchestrator(
        spark, str(tmp_path / "con"), cfgs, sources=mk_sources(), max_concurrency=2
    )
    for orch in (seq, con):
        rs = orch.pull_cycle("c1")
        assert {r.status for r in rs} == {"perfect"}
    assert final_state(seq) == final_state(con)
    assert con.status()["status"] == "healthy"


def test_pull_loop_overlay_passthrough_and_compaction_cadence(spark, tmp_path):
    """ADVICE r4: pull cycles must honor EngineConfig.overlay AND advance
    the engine's compaction cadence — without it a long-running
    run_pull_loop in mor mode accretes one overlay file-set per cycle
    forever. Global-overlay pulls write bucket==-1 files; every
    compact_every cycles the fold restores the bucketed layout, so the
    file count stays bounded over many cycles."""
    from patuha_etl_dlt_spark.cdc.engine import EngineConfig

    feed = {"n": 4}

    def source(spark_, last):
        rows = [(i, i, f"n{i}") for i in range(feed["n"])]
        return spark_.createDataFrame(rows, "k long, c long, n string").filter(
            f"c > {-1 if last is None else last}"
        )

    cfg = TableConfig(
        table="pc", merge_key=("k",), cursor="c",
        columns=(("k", "long"), ("c", "long"), ("n", "string")), num_buckets=8,
    )
    orch = SyncOrchestrator(
        spark, str(tmp_path / "sync"), [cfg], sources={"pc": source},
        engine_config=EngineConfig(overlay="global", compact_every=3),
    )
    (r1,) = orch.pull_cycle("c1")
    assert r1.status == "perfect"
    t = orch.engine("pc").table
    # overlay honored: the pull merge wrote global (bucket==-1) files
    assert {f.bucket for f in t.snapshot.files if f.kind == "delta"} == {-1}

    file_counts = []
    for i in range(2, 14):
        feed["n"] += 2
        orch.pull_cycle(f"c{i}")
        file_counts.append(len(t.snapshot.files))
    # cadence fired (compacted state = bucketed files only, one per bucket)
    # and the count never trends upward cycle-over-cycle beyond one
    # cadence period's worth of overlays
    assert min(file_counts[2:]) <= t.snapshot.num_buckets
    assert max(file_counts) <= t.snapshot.num_buckets + 3 * 2 + 2
    rows = {r["k"]: r["n"] for r in t.read().collect()}
    assert len(rows) == feed["n"] and rows[0] == "n0"


def test_snapshot_diff_pull_respects_overlay_and_compacts(spark, tmp_path):
    """The snapshot_diff pull path passes overlay + delta_reduced through
    and rides the same compaction cadence (its per-cycle full table read
    degrades monotonically if overlays accrete)."""
    from patuha_etl_dlt_spark.cdc.engine import EngineConfig

    state = {"rows": {i: f"v{i}" for i in range(6)}}

    def source(spark_, last):
        return spark_.createDataFrame(
            [(k, v) for k, v in state["rows"].items()], "k long, v string"
        )

    cfg = TableConfig(
        table="sd", merge_key=("k",), cursor="", mode="snapshot_diff",
        columns=(("k", "long"), ("v", "string")), num_buckets=8,
    )
    orch = SyncOrchestrator(
        spark, str(tmp_path / "sync"), [cfg], sources={"sd": source},
        engine_config=EngineConfig(overlay="global", compact_every=2, extract_text=False),
    )
    orch.pull_cycle("c1")
    t = orch.engine("sd").table
    assert {f.bucket for f in t.snapshot.files if f.kind == "delta"} == {-1}
    state["rows"][6] = "v6"
    del state["rows"][0]  # upstream DELETE propagates via the diff
    orch.pull_cycle("c2")  # cadence fires here (compact_every=2)
    assert all(f.bucket >= 0 for f in t.snapshot.files)
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == state["rows"]


def test_cursor_type_flip_fails_before_merge(spark, tmp_path):
    """ADVICE r5: a cursor TYPE FLIP must fail the cycle BEFORE any state
    lands. The old behavior raised inside the post-merge checkpoint
    commit, wedging the cycle permanently (every retry hit the
    skipped-merge heal path and re-raised on re-commit)."""
    cfg = TableConfig(
        table="w",
        merge_key=("k",),
        cursor="c",
        columns=(("k", "long"), ("c", "long"), ("v", "string")),
        num_buckets=4,
    )

    def source_int(s, last):
        return s.createDataFrame([(1, 10, "a"), (2, 11, "b")], "k long, c long, v string")

    def source_str(s, last):
        # upstream cursor column silently became a string
        return s.createDataFrame([(3, "z12", "c")], "k long, c string, v string")

    orch = SyncOrchestrator(spark, str(tmp_path / "sync"), [cfg], sources={"w": source_int})
    (r1,) = orch.pull_cycle("c1")
    assert r1.status == "perfect"
    eng = orch.engine("w")
    assert eng.cp.cursor() == 11
    v_before = eng.table.snapshot.version

    orch.sources["w"] = source_str
    (r2,) = orch.pull_cycle("c2")
    assert r2.status == "failed"
    assert "cursor type changed" in r2.metrics["error"]
    # the guard fired BEFORE the merge: no new snapshot, cursor unchanged,
    # and the cycle id is not committed anywhere (cleanly retryable)
    assert eng.table.snapshot.version == v_before
    assert eng.cp.cursor() == 11
    assert not eng.cp.has_batch("c2:w")


def test_diff_shuffle_partitions_sized_from_table_bytes(spark, tmp_path):
    """VERDICT r5 #4: the snapshot-diff shuffle width derives from the
    table's on-disk bytes (max(session, bytes // target)), so a large
    table's full-outer diff join no longer squeezes through a
    core-count-sized shuffle (the 32M-row spill cliff)."""
    from patuha_etl_dlt_spark.cdc.snapshot_diff import diff_shuffle_partitions
    from patuha_etl_dlt_spark.lake import LakeTable

    t = LakeTable.create(
        spark, str(tmp_path / "t"), [("k", "long"), ("v", "string")],
        key_cols="k", order_col=None, num_buckets=4,
    )
    t.merge(spark.createDataFrame([(i, "x" * 50) for i in range(2000)], "k long, v string"),
            batch_id="b0", op_col=None)
    total = sum(
        __import__("os").path.getsize(__import__("os").path.join(t.root, f.path))
        for f in t.snapshot.files
    )
    assert total > 0
    # small table: session width wins (AQE-coalesce-friendly floor)
    assert diff_shuffle_partitions(t, 8) == 8
    # big-table regime simulated by shrinking the per-partition target:
    # width scales with bytes, never below the session width
    assert diff_shuffle_partitions(t, 8, target_bytes=total // 32) == 32
    assert diff_shuffle_partitions(t, 64, target_bytes=total // 32) == 64
