"""Structured Streaming: file-tail → foreachBatch CDC apply; windowed rollup."""

from __future__ import annotations

import pytest

from patuha_etl_dlt_spark.cdc import CdcEngine, CheckpointStore
from patuha_etl_dlt_spark.cdc.envelope import PAGES_COLUMNS, event_struct
from patuha_etl_dlt_spark.lake import LakeTable
from patuha_etl_dlt_spark.sources.feedgen import FeedSpec, generate_events, generate_pandas
from patuha_etl_dlt_spark.streaming import hourly_rollup_stream, stream_events_into


@pytest.fixture(scope="module")
def feed_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_feed")
    ev = generate_events(spark, FeedSpec(n_urls=60, n_events=600, seed=9))
    ev.write.parquet(str(d / "files"))
    return str(d / "files")


def test_stream_apply_matches_batch_apply(spark, tmp_path, feed_dir):
    t = LakeTable.create(spark, str(tmp_path / "t"), PAGES_COLUMNS, "url", "warc_ts", num_buckets=4)
    eng = CdcEngine(t, CheckpointStore(str(tmp_path / "cp")))
    q = stream_events_into(
        eng, spark, feed_dir, event_struct(), str(tmp_path / "scp"), trigger_once=True
    )
    q.awaitTermination(300)

    # oracle: one-shot batch apply of the same feed into a fresh table
    t2 = LakeTable.create(spark, str(tmp_path / "t2"), PAGES_COLUMNS, "url", "warc_ts", num_buckets=4)
    eng2 = CdcEngine(t2, CheckpointStore(str(tmp_path / "cp2")))
    eng2.apply_batch(spark.read.parquet(feed_dir), batch_id="all")

    a = {(r["url"], r["text"]) for r in t.read().select("url", "text").collect()}
    b = {(r["url"], r["text"]) for r in t2.read().select("url", "text").collect()}
    assert a == b and len(a) > 0

    # restart the stream over the same checkpoint: nothing new → no-op
    v = t.snapshot.version
    q2 = stream_events_into(
        eng, spark, feed_dir, event_struct(), str(tmp_path / "scp"), trigger_once=True
    )
    q2.awaitTermination(300)
    assert t.snapshot.version == v


def test_windowed_rollup_with_watermark(spark, tmp_path, feed_dir):
    agg = hourly_rollup_stream(spark, feed_dir, event_struct())
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rollup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM rollup").collect()
    assert sum(r["n"] for r in rows) > 0
    assert {r["op"] for r in rows} <= {"I", "U", "D"}


def test_two_streams_one_table_do_not_collide(spark, tmp_path, feed_dir):
    """Two streams (distinct checkpoints) feeding one table must not skip
    each other's epochs: batch ids carry a per-stream app id (the Delta
    txnAppId pattern), not bare epoch numbers."""
    t = LakeTable.create(spark, str(tmp_path / "t"), PAGES_COLUMNS, "url", "warc_ts", num_buckets=4)
    eng = CdcEngine(t, CheckpointStore(str(tmp_path / "cp")))
    q1 = stream_events_into(eng, spark, feed_dir, event_struct(), str(tmp_path / "scp_a"), trigger_once=True)
    q1.awaitTermination(300)
    n_batches_after_first = len(t.snapshot.batch_ids)
    # second stream over the SAME feed, fresh checkpoint → epoch ids restart
    # at 0; with bare epoch batch-ids this would be silently skipped
    q2 = stream_events_into(eng, spark, feed_dir, event_struct(), str(tmp_path / "scp_b"), trigger_once=True)
    q2.awaitTermination(300)
    assert len(t.snapshot.batch_ids) > n_batches_after_first
    # explicit app_id overrides the checkpoint-derived one
    q3 = stream_events_into(
        eng, spark, feed_dir, event_struct(), str(tmp_path / "scp_c"),
        trigger_once=True, app_id="replay-1",
    )
    q3.awaitTermination(300)
    assert any(b.startswith("stream-replay-1-") for b in t.snapshot.batch_ids)


def test_stream_maintained_rollup_matches_batch(spark, tmp_path, feed_dir):
    """A rollup folded from the stream equals a one-shot GROUP BY of the
    whole feed; restarting over the same checkpoint is a no-op."""
    from pyspark.sql import functions as F

    from patuha_etl_dlt_spark.cdc.rollup import IncrementalRollup
    from patuha_etl_dlt_spark.streaming import stream_rollup_into

    ru = IncrementalRollup.create(
        spark, str(tmp_path / "ru"), [("op", "string")],
        {"n": ("count", "lsn", "long"), "max_lsn": ("max", "lsn", "long")},
        num_buckets=2,
    )
    q = stream_rollup_into(ru, spark, feed_dir, event_struct(), str(tmp_path / "rcp"))
    q.awaitTermination(300)
    got = {r["op"]: (r["n"], r["max_lsn"]) for r in ru.read().collect()}
    want = {
        r["op"]: (r["n"], r["max_lsn"])
        for r in spark.read.parquet(feed_dir)
        .groupBy("op").agg(F.count("lsn").alias("n"), F.max("lsn").alias("max_lsn"))
        .collect()
    }
    assert got == want and len(got) > 0
    v = ru.table.snapshot.version
    q2 = stream_rollup_into(ru, spark, feed_dir, event_struct(), str(tmp_path / "rcp"))
    q2.awaitTermination(300)
    assert ru.table.snapshot.version == v  # replayed checkpoint: no-op
