"""etl_framework_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch rebuild of the capabilities of the reference ETL framework
(pandas extract -> transform -> keyed load with FAIL/REPLACE/APPEND/UPDATE/
UPSERT strategies, JSON-driven column calculations, schema evolution on
append, key-based MERGE) re-expressed as idiomatic Spark:

- lazy DataFrame plans end-to-end (Catalyst does pushdown/pruning/join
  selection; nothing is hand-scheduled),
- an Iceberg-semantics lakehouse table layer (``lakehouse.LakeTable``):
  bucket-partitioned parquet data files + atomic snapshot commits +
  copy-on-write MERGE that rewrites only the buckets a batch touches,
- last-writer-wins change application over ``(conv_id, turn_idx)`` keyed
  by ``(ts, lsn)`` (``cdc.apply_changes``),
- exactly-once micro-batch ingestion via epoch-keyed commit manifests +
  Structured Streaming checkpoints (``streaming``),
- config-as-program transforms compiled to Column expressions
  (``transforms.calc_compiler``), and
- large-scale corpus utilities (dedup, similarity search, text quality,
  multimodal plumbing) in ``operators``.

Reference parity citations use ``reference:<path>:<lines>`` and point into
the read-only reference checkout; the implementations here are Spark-first,
not translations.
"""

__version__ = "0.1.0"

from etl_framework_spark.cdc import apply_changes, lww_dedupe  # noqa: F401
from etl_framework_spark.lakehouse import LakeTable  # noqa: F401
from etl_framework_spark.schemas import (  # noqa: F401
    CHANGE_SCHEMA,
    KEY_COLUMNS,
    TRANSCRIPT_SCHEMA,
)
from etl_framework_spark.session import get_spark  # noqa: F401
