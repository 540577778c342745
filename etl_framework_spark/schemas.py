"""Canonical schemas for the CDC / transcript engine.

Pinned explicit StructTypes everywhere — schema inference at 10^10-row
scale re-reads data and produces unstable types, so the engine never
infers (the reference inferred on every read:
reference:src/etl_framework/plugins/extractors/csv_extractor.py:63).

Target table (BASELINE.json input_hint):
    conv_id:string, turn_idx:int, role:string, text:string,
    tool:string, ts:timestamp
CDC envelope adds: op:string(I/U/D), lsn:long.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Primary key of the transcript table. All merge/dedupe logic keys on this.
KEY_COLUMNS = ["conv_id", "turn_idx"]

#: Total order used for last-writer-wins conflict resolution.
ORDER_COLUMNS = ["ts", "lsn"]

#: Payload columns carried by the after-image of a change event.
PAYLOAD_COLUMNS = ["role", "text", "tool"]

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

#: Change event = CDC envelope + key + after-image payload. ``op`` is one of
#: I (insert), U (update), D (delete); payload columns are null for deletes.
CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
    ]
)

#: Schema-evolution variant used by tests: adds a tool metadata column and
#: widens ``turn_idx`` to long (north_rule: "added tool/metadata columns,
#: type widening").
CHANGE_SCHEMA_EVOLVED = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.LongType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("tool_meta", T.StringType(), True),
    ]
)


def change_payload_columns(schema: T.StructType) -> list[str]:
    """Columns of a change schema that are payload (not envelope, not key)."""
    envelope = {"op", "lsn", "ts", *KEY_COLUMNS}
    return [f.name for f in schema.fields if f.name not in envelope]
