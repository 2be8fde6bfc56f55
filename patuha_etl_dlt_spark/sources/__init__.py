"""Sources: deterministic change-event feed generator + file readers."""

from patuha_etl_dlt_spark.sources.feedgen import FeedSpec, generate_events  # noqa: F401
