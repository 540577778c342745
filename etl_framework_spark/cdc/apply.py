"""Last-writer-wins change application (the engine's core operator).

Semantics (north rule W1): for each key ``(conv_id, turn_idx)`` the event
with the maximum ``(ts, lsn)`` wins; a winning delete removes the row,
otherwise the winner's after-image is the row. Late/out-of-order events
apply-or-no-op deterministically because the comparison is against the
stored row's ``(ts, _lsn)``.

Reference parity: this replaces the reference's per-row UPDATE loop and
in-memory key-set UPSERT
(reference:src/etl_framework/plugins/loaders/sql_loader.py:286-324,431-474;
file variant reference:src/etl_framework/plugins/loaders/file_loader.py:199-260)
with two set-based strategies:

- ``lww_dedupe`` — groupBy(keys).max(struct(order..., payload...)).
  Chosen as the default because hash aggregation gets **map-side partial
  combine**: each executor collapses its partition to one candidate per
  key before the shuffle, so duplicate-heavy and hot-key-heavy logs
  shuffle ~|distinct keys| rows, not |events|. A window implementation
  (also provided, for parity testing) must shuffle and SORT every event.
- optional **two-stage salted aggregation** for pathological per-key
  fan-in: stage 1 aggregates on (keys, salt), stage 2 on keys. With
  partial aggregation the single-stage plan already absorbs most skew;
  the salted path exists for the window-less guarantee the north rule
  asks for and is benchmarked in BENCH/.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_framework_spark.lakehouse.table import LakeTable, bucket_expr
from etl_framework_spark.schemas import KEY_COLUMNS, ORDER_COLUMNS

_W = "_lww"


def _winner_struct(df: DataFrame, keys: Sequence[str], order_cols: Sequence[str]):
    """struct(order_cols..., rest...) — lexicographic max = LWW winner.
    Payload columns after the order columns make ties (byte-identical
    duplicate deliveries) deterministic regardless of partitioning."""
    rest = [c for c in df.columns if c not in keys and c not in order_cols]
    return F.struct(*[F.col(c) for c in (*order_cols, *rest)])


def lww_dedupe(
    df: DataFrame,
    keys: Sequence[str] = KEY_COLUMNS,
    order_cols: Sequence[str] = ORDER_COLUMNS,
    salt_partitions: int = 0,
) -> DataFrame:
    """One winning row per key. ``salt_partitions`` > 0 enables the
    two-stage salted aggregation for hot-key skew."""
    winner = _winner_struct(df, keys, order_cols)
    out_cols = [*keys] + [
        F.col(f"{_W}.{c}").alias(c) for c in df.columns if c not in keys
    ]
    if salt_partitions > 0:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(salt_partitions))
        stage1 = (
            df.withColumn("_salt", salt)
            .groupBy(*keys, "_salt")
            .agg(F.max(winner).alias(_W))
        )
        # stage 2: tiny (<= salt_partitions rows per key), salt stripped so
        # downstream MERGE sees unique keys.
        return (
            stage1.groupBy(*keys)
            .agg(F.max(F.col(_W)).alias(_W))
            .select(*out_cols)
        )
    return df.groupBy(*keys).agg(F.max(winner).alias(_W)).select(*out_cols)


def lww_dedupe_window(
    df: DataFrame,
    keys: Sequence[str] = KEY_COLUMNS,
    order_cols: Sequence[str] = ORDER_COLUMNS,
) -> DataFrame:
    """row_number()-based variant (SURVEY.md W1 as literally stated).
    Kept for parity tests and as the SQL-oracle-shaped formulation; the
    aggregate form above is the production path (no total sort, partial
    aggregation map-side)."""
    rest = [c for c in df.columns if c not in keys and c not in order_cols]
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_cols], *[F.col(c).desc_nulls_last() for c in rest]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def resolve_lww(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str] = KEY_COLUMNS,
) -> DataFrame:
    """Merge resolver: union stored rows (as pseudo-events) with incoming
    change events, take the LWW winner per key, drop delete winners.

    ``target`` is the stored transcript subset (payload + ts + _lsn);
    ``source`` is CDC-enveloped (op/lsn/ts + payload). Output is stored
    shape. This is the set-based equivalent of Iceberg
    ``MERGE ... WHEN MATCHED [AND src newer] UPDATE / WHEN MATCHED AND
    op='D' DELETE / WHEN NOT MATCHED INSERT``.
    """
    payload_cols = [
        c for c in target.columns if c not in (*keys, "ts", "_lsn", "_deleted")
    ]
    as_events = target.select(
        F.when(F.col("_deleted"), F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("_lsn").alias("lsn"),
        "ts",
        *keys,
        *payload_cols,
    )
    # After-image semantics: a winning event that lacks a (newly evolved)
    # payload column sets it NULL; key/ts types upcast to the table's.
    have = set(source.columns)
    tgt_types = dict(zip(target.columns, [f.dataType for f in target.schema.fields]))
    src = source.select(
        "op",
        F.col("lsn").cast("long").alias("lsn"),
        F.col("ts").cast(tgt_types["ts"]).alias("ts"),
        *[F.col(k).cast(tgt_types[k]).alias(k) for k in keys],
        *[
            (F.col(c).cast(tgt_types[c]) if c in have else F.lit(None).cast(tgt_types[c])).alias(c)
            for c in payload_cols
        ],
    )
    winners = lww_dedupe(as_events.unionByName(src), keys=keys)
    # Winning deletes persist as TOMBSTONES (not physical drops): a later
    # batch may still deliver an *older* event for the key, and only the
    # stored (ts, _lsn) lets it no-op. Tombstones are filtered by
    # ``LakeTable.current()`` and garbage-collected once older than the
    # log's out-of-orderness bound (``compact_tombstones``).
    return winners.select(
        *keys,
        *[F.when(F.col("op") != "D", F.col(c)).alias(c) for c in payload_cols],
        "ts",
        F.col("lsn").alias("_lsn"),
        (F.col("op") == "D").alias("_deleted"),
    )


def compute_lineage(changes: DataFrame, key_col: str, n_buckets: int) -> list[dict]:
    """Per-bucket lineage rows: row counts + applied LSN ranges (north
    rule; reference analog
    reference:src/etl_framework/security/audit_logger.py:100-146).
    Small result (<= n_buckets rows) — safe to collect."""
    rows = (
        changes.groupBy(bucket_expr(key_col, n_buckets).alias("bucket"))
        .agg(
            F.count("*").alias("rows"),
            F.min("lsn").alias("min_lsn"),
            F.max("lsn").alias("max_lsn"),
        )
        .collect()
    )
    return [r.asDict() for r in sorted(rows, key=lambda r: r["bucket"])]


def apply_changes(
    table: LakeTable,
    changes: DataFrame,
    stream_id: str = "default",
    epoch_id: int | None = None,
    salt_partitions: int = 0,
    source_offsets: dict | None = None,
    lineage: bool = True,
) -> int | None:
    """Apply one micro-batch of change events to the table.

    Exactly-once: if ``epoch_id`` was already committed for ``stream_id``
    the batch is a no-op (returns None). The epoch marker rides in the
    same atomic snapshot commit as the data, so a crash between write and
    commit re-applies cleanly and a crash after commit skips cleanly.
    """
    if epoch_id is not None and epoch_id <= table.last_epoch(stream_id):
        return None

    deduped = lww_dedupe(changes, salt_partitions=salt_partitions)
    summary: dict = {"stream_id": stream_id}
    if source_offsets:
        summary["source_offsets"] = source_offsets
    if lineage:
        summary["lineage"] = compute_lineage(
            changes, table.key_columns[0], table.n_buckets
        )
    # Stored-shape schema implied by this batch: payload + ts + _lsn + _deleted.
    envelope = {"op", "lsn"}
    stored_fields = [f for f in changes.schema.fields if f.name not in envelope]
    stored_schema = T.StructType(
        stored_fields
        + [
            T.StructField("_lsn", T.LongType(), True),
            T.StructField("_deleted", T.BooleanType(), True),
        ]
    )
    return table.merge(
        deduped,
        resolve=lambda tgt, src: resolve_lww(tgt, src, keys=table.key_columns),
        evolve_schema=stored_schema,
        summary=summary,
        epoch=(stream_id, epoch_id) if epoch_id is not None else None,
    )
