"""Structured Streaming ingestion of the change log."""

from etl_framework_spark.streaming.ingest import start_ingest  # noqa: F401
