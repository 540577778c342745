"""CDC change application: last-writer-wins dedupe + keyed merge."""

from etl_framework_spark.cdc.apply import (  # noqa: F401
    apply_changes,
    lww_dedupe,
    lww_dedupe_window,
)
