"""Format-agnostic CDC-out change feed (§2.10 CDC-out).

The row-level diff between two committed versions of any
:class:`~etl_framework_spark.lakehouse.protocol.KeyedTable` is the same
plan regardless of how the format stores its metadata: read ONLY the
buckets whose file lists differ between the versions (copy-on-write
rewrites whole buckets, so identical file list ⇒ identical content),
then one full-outer join on the key classifies each changed key as
I / U / D. Each format supplies the changed-bucket set from its own
metadata (LakeTable: snapshot/shard references; DirTable: commit-log
fold) — the join itself lives here, once.

reference parity: the reference has no CDC-out surface; this mirrors
Delta's ``table_changes`` / Iceberg's changelog scan shape so a
downstream incremental consumer can tail the lake table itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_versions(table, v_from: int, v_to: int, changed_buckets: list[int]) -> DataFrame:
    """One row per key whose state changed between two versions, with
    ``_change_type`` I/U/D; columns are the newer version's (minus
    ``_deleted``). ``changed_buckets`` must cover every bucket whose
    content can differ — both versions are read bucket-pruned to it.

    new-only ⇒ I, both-with-newer-lsn ⇒ U, old-live-now-gone ⇒ D.
    ``_lsn`` is non-null on every live stored row, so side-nullness of
    ``_lsn`` after the join is the presence test (tombstones were
    already filtered by ``current()``).
    """
    keys = table.key_columns
    old = table.current(buckets=changed_buckets, version=v_from)
    new = table.current(buckets=changed_buckets, version=v_to)
    o = old.select(*keys, F.col("_lsn").alias("_old_lsn")).alias("o")
    n = new.alias("n")
    joined = n.join(o, on=keys, how="full_outer")
    ctype = (
        F.when(F.col("o._old_lsn").isNull(), F.lit("I"))
        .when(F.col("n._lsn").isNull(), F.lit("D"))
        .when(F.col("n._lsn") != F.col("o._old_lsn"), F.lit("U"))
    )
    out_cols = [c for c in new.columns if c != "_deleted"]
    return (
        joined.withColumn("_change_type", ctype)
        .where(F.col("_change_type").isNotNull())
        .select(
            *[
                F.col(f"n.{c}").alias(c) if c not in keys else F.col(c)
                for c in out_cols
            ],
            "_change_type",
        )
    )
