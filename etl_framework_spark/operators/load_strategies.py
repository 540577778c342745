"""Keyed load strategies: FAIL / REPLACE / APPEND / UPDATE / UPSERT.

Reference semantics (reference:src/etl_framework/core/load_strategy.py:9-60,
dispatch reference:src/etl_framework/plugins/loaders/sql_loader.py:66-78):

- FAIL     error if target exists, else create+write
- REPLACE  drop & recreate with new data
- APPEND   insert all rows, evolving target schema first
- UPDATE   update existing rows matching key_columns; never inserts;
           on a missing target, creates it (reference:sql_loader.py:236-239)
- UPSERT   update matched + insert new

The reference implements UPDATE as a per-row ``UPDATE ... WHERE`` loop
(reference:sql_loader.py:286-324) and UPSERT as an in-memory key-set
anti-filter (reference:sql_loader.py:431-474). Here both are one set-based
resolve: union(target, source) tagged with a priority bit, then a single
hash aggregation picks the surviving row per key — map-side combinable,
one shuffle, no driver-side state, and MERGE-shaped so it ports directly
to Iceberg ``MERGE INTO``.
"""

from __future__ import annotations

from enum import Enum
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_framework_spark.lakehouse.table import (
    LakeTable,
    align_to_schema,
    commit_with_retry,
)


class LoadStrategy(str, Enum):
    FAIL = "fail"
    REPLACE = "replace"
    APPEND = "append"
    UPDATE = "update"
    UPSERT = "upsert"

    @property
    def requires_key_columns(self) -> bool:
        # reference:src/etl_framework/core/load_strategy.py:44-51
        return self in (LoadStrategy.UPDATE, LoadStrategy.UPSERT)

    @property
    def is_destructive(self) -> bool:
        # reference:src/etl_framework/core/load_strategy.py:53-60
        return self in (LoadStrategy.REPLACE, LoadStrategy.UPDATE, LoadStrategy.UPSERT)


def _dedupe_batch(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Deterministic one-row-per-key within the incoming batch (the
    reference's ``drop_duplicates`` load option,
    reference:src/etl_framework/core/load_strategy.py:73)."""
    rest = [c for c in df.columns if c not in keys]
    w = F.struct(*[F.col(c) for c in rest])
    return (
        df.groupBy(*keys)
        .agg(F.max(w).alias("_w"))
        .select(*keys, *[F.col(f"_w.{c}").alias(c) for c in rest])
    )


def _keyed_resolve(keep_unmatched_source: bool):
    """Build a merge resolver: source beats target per key; rows whose key
    exists only in the source are kept (UPSERT) or dropped (UPDATE)."""

    def resolve(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
        cols = target.columns
        rest = [c for c in cols if c not in keys]
        src = align_to_schema(source, target.schema)
        tagged = target.withColumn("_prio", F.lit(0)).unionByName(
            src.withColumn("_prio", F.lit(1))
        )
        w = F.struct(F.col("_prio"), *[F.col(c) for c in rest])
        agg = tagged.groupBy(*keys).agg(
            F.max(w).alias("_w"),
            F.max((F.col("_prio") == 0).cast("int")).alias("_in_tgt"),
        )
        if not keep_unmatched_source:
            # UPDATE: only keys already present in the target survive;
            # source-only keys are discarded (never inserted).
            agg = agg.where(F.col("_in_tgt") == 1)
        return agg.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in rest])

    return resolve


def load(
    spark: SparkSession,
    df: DataFrame,
    target: str,
    strategy: LoadStrategy | str = LoadStrategy.FAIL,
    key_columns: Sequence[str] | None = None,
    n_buckets: int = 32,
    drop_duplicates: bool = False,
) -> LakeTable:
    """Load ``df`` into the LakeTable at ``target`` under ``strategy``.

    Duplicate-key caveat: blind APPEND may create multiple rows per key
    (same as the reference's INSERT). A later keyed UPDATE/UPSERT
    resolves to one row per key only within the buckets its batch
    touches — untouched buckets keep their duplicates (the reference's
    SQL UPDATE differs again: it rewrites EVERY matching row, keeping
    cardinality). Pipelines that append and later upsert should dedupe
    on append (``drop_duplicates=True``) for well-defined per-key
    state."""
    strategy = LoadStrategy(strategy)
    if strategy.requires_key_columns and not key_columns:
        raise ValueError(f"strategy {strategy.value} requires key_columns")
    keys = list(key_columns or [])

    exists = LakeTable.exists(target)
    if strategy is LoadStrategy.FAIL and exists:
        raise FileExistsError(f"target exists and strategy is FAIL: {target}")

    if not exists:
        table = LakeTable.create(
            spark, target, df.schema, key_columns=keys or [df.columns[0]], n_buckets=n_buckets
        )
        table.append(df, summary={"strategy": strategy.value})
        return table

    table = LakeTable(spark, target)
    if drop_duplicates and keys:
        df = _dedupe_batch(df, keys)

    if strategy is LoadStrategy.REPLACE:
        table.overwrite(df, summary={"strategy": "replace"})
    elif strategy is LoadStrategy.APPEND:
        table.append(df, summary={"strategy": "append"})
    else:  # UPDATE / UPSERT
        src = _dedupe_batch(df, keys) if not drop_duplicates else df
        resolve = _keyed_resolve(keep_unmatched_source=(strategy is LoadStrategy.UPSERT))
        commit_with_retry(
            table,
            lambda t: t.merge(
                src,
                resolve=lambda tgt, s: resolve(tgt, s, keys),
                summary={"strategy": strategy.value},
            ),
        )
    return table
