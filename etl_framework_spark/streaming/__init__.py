"""Structured Streaming ingestion of the change log."""

from etl_framework_spark.streaming.ingest import (  # noqa: F401
    run_to_completion,
    start_ingest,
)
