"""Incrementally-maintained rollup tables: fold == full recompute,
exactly-once replay, untouched groups stable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from patuha_etl_dlt_spark.cdc.rollup import IncrementalRollup


@pytest.fixture
def events(spark):
    rows = [
        # (eid, typ, value)
        (1, "click", 1.5), (2, "view", 2.0), (3, "click", 0.5),
        (4, "click", 4.0), (5, "view", 1.0), (6, "error", 9.0),
        (7, "click", 2.5), (8, "view", 3.0), (9, "error", 1.0),
    ]
    return spark.createDataFrame(rows, "eid long, typ string, value double")


def measures():
    # built lazily: Column construction needs an active SparkContext
    return {
        "n": ("count", "eid", "long"),
        "total": ("sum", F.col("value").cast("decimal(18,6)"), "decimal(28,6)"),
        "vmin": ("min", "value", "double"),
        "vmax": ("max", "value", "double"),
    }


def state(ru):
    return {
        r["typ"]: (r["n"], float(r["total"]), r["vmin"], r["vmax"])
        for r in ru.read().collect()
    }


def oracle(df):
    rows = df.groupBy("typ").agg(
        F.count("eid").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("total"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    ).collect()
    return {r["typ"]: (r["n"], float(r["total"]), r["vmin"], r["vmax"]) for r in rows}


def test_fold_matches_full_recompute(spark, tmp_path, events):
    ru = IncrementalRollup.create(
        spark, str(tmp_path / "r"), [("typ", "string")], measures(), num_buckets=4
    )
    for i in range(3):
        ru.apply_batch(events.filter(F.col("eid") % 3 == i), batch_id=f"b{i}")
    assert state(ru) == oracle(events)


def test_replay_is_exactly_once(spark, tmp_path, events):
    ru = IncrementalRollup.create(
        spark, str(tmp_path / "r"), [("typ", "string")], measures(), num_buckets=4
    )
    b0 = events.filter("eid <= 5")
    ru.apply_batch(b0, batch_id="b0")
    before = state(ru)
    m = ru.apply_batch(b0, batch_id="b0")  # replayed delivery
    assert m["skipped"] is True and state(ru) == before
    ru.apply_batch(events.filter("eid > 5"), batch_id="b1")
    assert state(ru) == oracle(events)


def test_new_groups_and_untouched_groups(spark, tmp_path, events):
    ru = IncrementalRollup.create(
        spark, str(tmp_path / "r"), [("typ", "string")], measures(), num_buckets=4
    )
    ru.apply_batch(events.filter(F.col("typ") != "error"), batch_id="b0")
    s0 = state(ru)
    assert "error" not in s0
    ru.apply_batch(events.filter(F.col("typ") == "error"), batch_id="b1")
    s1 = state(ru)
    assert s1["click"] == s0["click"] and s1["view"] == s0["view"]  # untouched
    assert s1["error"] == (2, 10.0, 1.0, 9.0)  # new group


def test_fold_prunes_untouched_buckets(spark, tmp_path, events):
    """The fold must (a) only READ files of buckets its groups hash into
    (file-level pruning, checked via inputFiles), and (b) only REWRITE
    those buckets — untouched buckets keep byte-identical file paths."""
    ru = IncrementalRollup.create(
        spark, str(tmp_path / "r"), [("typ", "string")], measures(), num_buckets=4
    )
    ru.apply_batch(events, batch_id="seed")  # state spans several buckets
    snap = ru.table.snapshot
    buckets_before = {f.bucket: f.path for f in snap.files}
    assert len(buckets_before) >= 2  # the 3 types hash into ≥2 of 4 buckets

    one = events.filter(F.col("typ") == "click")  # touches exactly one group
    m = ru.apply_batch(one, batch_id="b-click")
    assert m["buckets_replaced"] == 1
    assert m["state_files_read"] == 1 < m["state_files_total"]

    # exactly one bucket's file was replaced — the click group's
    new_paths = {f.path for f in ru.table.snapshot.files}
    replaced = [f for f in snap.files if f.path not in new_paths]
    assert len(replaced) == 1
    click_bucket = replaced[0].bucket

    # the pruned state read never opens untouched buckets' files
    read_files = ru.table.read_buckets([click_bucket]).inputFiles()
    allowed = {f.path for f in ru.table.snapshot.files if f.bucket == click_bucket}
    assert all(any(rf.endswith(p) for p in allowed) for rf in read_files)

    # untouched buckets: same files as before the fold
    after = {f.bucket: f.path for f in ru.table.snapshot.files}
    for b, path in buckets_before.items():
        if b != click_bucket:
            assert after[b] == path
    assert state(ru)["click"] == (8, 17.0, 0.5, 4.0)  # doubled click group
    assert state(ru)["view"] == oracle(events)["view"]  # untouched, still right


def test_many_folds_one_file_per_bucket(spark, tmp_path, events):
    """Copy-on-write folds never accumulate overlay files: after many
    folds every bucket holds exactly one file (no compaction needed)."""
    ru = IncrementalRollup.create(
        spark, str(tmp_path / "r"), [("typ", "string")], measures(), num_buckets=4
    )
    for i in range(6):
        ru.apply_batch(events, batch_id=f"f{i}")
    per_bucket: dict[int, int] = {}
    for f in ru.table.snapshot.files:
        per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + 1
        assert f.kind == "base"
    assert all(n == 1 for n in per_bucket.values()), per_bucket
    got = state(ru)
    want = oracle(events)
    assert got["click"][0] == 6 * want["click"][0]  # 6 folds of the same batch


def test_decimal_lake_column_roundtrip(spark, tmp_path):
    from patuha_etl_dlt_spark.lake import LakeTable

    t = LakeTable.create(
        spark, str(tmp_path / "dec"),
        [("k", "long"), ("amt", "decimal(18,6)"), ("seq", "long")],
        key_cols="k", order_col="seq", num_buckets=2,
    )
    import decimal

    d = spark.createDataFrame(
        [(1, decimal.Decimal("1.500000"), 1), (1, decimal.Decimal("2.250000"), 2)],
        "k long, amt decimal(18,6), seq long",
    )
    t.merge(d, batch_id="b")
    got = t.read().collect()
    assert len(got) == 1 and got[0]["amt"] == decimal.Decimal("2.250000")


def test_fold_casts_group_key_types_before_bucketing(spark, tmp_path):
    """A delta whose group-key column arrives as a NARROWER type than the
    lake schema (int vs long) must fold cleanly: murmur3 of int(5) and
    long(5) differ, so bucket discovery must hash the CAST values the
    write path uses, or apply_batch dies with the stray-bucket ValueError
    after data files are already written."""
    ru = IncrementalRollup.create(
        spark, str(tmp_path / "rk"), [("k", "long")], {"n": ("count", "v", "long")},
        num_buckets=8,
    )
    delta_int = spark.createDataFrame([(i % 5, i) for i in range(40)], "k int, v int")
    m = ru.apply_batch(delta_int, batch_id="b0")
    assert m["skipped"] is False
    got = {r["k"]: r["n"] for r in ru.read().collect()}
    assert got == {k: 8 for k in range(5)}
    # fold a second (long-typed) batch on top: combines must line up
    delta_long = spark.createDataFrame([(i % 5, i) for i in range(10)], "k long, v long")
    ru.apply_batch(delta_long, batch_id="b1")
    got = {r["k"]: r["n"] for r in ru.read().collect()}
    assert got == {k: 10 for k in range(5)}
