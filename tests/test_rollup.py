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
