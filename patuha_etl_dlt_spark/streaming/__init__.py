"""Structured Streaming front-end for the CDC engine."""

from patuha_etl_dlt_spark.streaming.stream import (  # noqa: F401
    hourly_rollup_stream,
    stream_rollup_into,
    stream_events_into,
)
