"""Table→table relay (``cdc.relay``): incremental replication over the
CDC-out change feed, parametrized over ALL four (source format, target
format) pairs — the relay is format-agnostic on both sides by the
``KeyedTable`` protocol."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_framework_spark.cdc import apply_changes, sync_once, sync_table
from etl_framework_spark.datagen import gen_changes
from etl_framework_spark.lakehouse import DirTable, LakeTable
from etl_framework_spark.schemas import KEY_COLUMNS, TRANSCRIPT_SCHEMA

IMPLS = {"lake": LakeTable, "dir": DirTable}

STORED = T.StructType(
    TRANSCRIPT_SCHEMA.fields
    + [
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ]
)


@pytest.fixture(params=["lake->dir", "dir->lake", "lake->lake", "dir->dir"])
def pair(request):
    s, d = request.param.split("->")
    return IMPLS[s], IMPLS[d]


def _state(table):
    """Comparable live state: stored rows minus system bookkeeping."""
    rows = (
        table.refresh()
        .current()
        .select("conv_id", "turn_idx", "role", "text", "ts", "_lsn")
        .collect()
    )
    return sorted(rows, key=lambda r: (r.conv_id, r.turn_idx))


def _mk(impl, spark, path, schema=STORED, n_buckets=8):
    return impl.create(
        spark, path, schema=schema, key_columns=KEY_COLUMNS, n_buckets=n_buckets
    )


def test_relay_replicates_state_cross_format(spark, tmp_path, pair):
    src_impl, dst_impl = pair
    src = _mk(src_impl, spark, str(tmp_path / "src"))
    # target deliberately uses a DIFFERENT bucket count: replication is
    # keyed, not physical
    dst = _mk(dst_impl, spark, str(tmp_path / "dst"), n_buckets=4)
    apply_changes(src, gen_changes(spark, 2000, seed=7), stream_id="s", epoch_id=0)

    v = sync_once(src, dst)
    assert v is not None
    assert _state(dst) == _state(src)
    # caught up: the next sync is a no-op
    assert sync_once(src, dst) is None


def test_relay_incremental_updates_and_deletes(spark, tmp_path, pair):
    src_impl, dst_impl = pair
    src = _mk(src_impl, spark, str(tmp_path / "src"))
    dst = _mk(dst_impl, spark, str(tmp_path / "dst"))
    apply_changes(src, gen_changes(spark, 1500, seed=1), stream_id="s", epoch_id=0)
    sync_once(src, dst)

    # epoch 2 carries updates AND deletes for existing keys
    batch2 = gen_changes(spark, 1500, seed=2)
    assert batch2.where(F.col("op") == "D").count() > 0
    apply_changes(src, batch2, stream_id="s", epoch_id=1)
    sync_once(src, dst)
    assert _state(dst) == _state(src)

    # a key deleted at the source must be gone at the target
    gone = (
        src.current()
        .select("conv_id", "turn_idx")
        .join(
            dst.current().select("conv_id", "turn_idx"),
            on=["conv_id", "turn_idx"],
            how="full_outer",
        )
        .count()
    )
    assert gone == src.current().count() == dst.current().count()


def test_relay_watermark_survives_new_handle(spark, tmp_path, pair):
    """Resume: the watermark lives in the target's epoch ledger, so a
    fresh process (new table handles) continues where the old one
    stopped — no side files."""
    src_impl, dst_impl = pair
    src = _mk(src_impl, spark, str(tmp_path / "src"))
    dst = _mk(dst_impl, spark, str(tmp_path / "dst"))
    apply_changes(src, gen_changes(spark, 1000, seed=3), stream_id="s", epoch_id=0)
    sync_once(src, dst)
    v_synced = dst.version

    apply_changes(src, gen_changes(spark, 1000, seed=4), stream_id="s", epoch_id=1)
    # brand-new handles, as after a crash/restart
    src2 = src_impl(spark, src.path)
    dst2 = dst_impl(spark, dst.path)
    assert sync_once(src2, dst2) is not None
    assert dst2.version > v_synced
    assert _state(dst2) == _state(src2)
    assert sync_once(src2, dst2) is None


def test_relay_propagates_schema_evolution(spark, tmp_path, pair):
    src_impl, dst_impl = pair
    src = _mk(src_impl, spark, str(tmp_path / "src"))
    dst = _mk(dst_impl, spark, str(tmp_path / "dst"))
    apply_changes(src, gen_changes(spark, 800, seed=5), stream_id="s", epoch_id=0)
    sync_once(src, dst)

    evolved = gen_changes(spark, 800, seed=6, evolved=True)
    apply_changes(src, evolved, stream_id="s", epoch_id=1)
    sync_once(src, dst)
    assert "tool_meta" in [f.name for f in dst.refresh().schema.fields]
    assert _state(dst) == _state(src)
    # evolved payload column survives the relay
    s_meta = sorted(
        r.tool_meta
        for r in src.current().where(F.col("tool_meta").isNotNull()).collect()
    )
    d_meta = sorted(
        r.tool_meta
        for r in dst.current().where(F.col("tool_meta").isNotNull()).collect()
    )
    assert s_meta == d_meta and len(s_meta) > 0


def test_relay_skips_empty_maintenance_diffs(spark, tmp_path):
    # one fixed cross-format pair is enough here; the pair matrix is
    # covered by the other tests
    """Source compaction/expiry commits produce an empty diff; the sync
    must still advance the watermark past them (epoch-marker commit) so
    later syncs never re-diff those versions."""
    src = _mk(LakeTable, spark, str(tmp_path / "src"))
    dst = _mk(DirTable, spark, str(tmp_path / "dst"))
    apply_changes(src, gen_changes(spark, 1200, seed=8), stream_id="s", epoch_id=0)
    sync_once(src, dst)

    src.compact(min_files=1)  # physical-only commit
    v = sync_once(src, dst)
    assert v is not None  # watermark advanced
    assert dst.last_epoch("relay") == src.version
    assert _state(dst) == _state(src)
    assert sync_once(src, dst) is None


def test_sync_table_catches_up_over_multiple_commits(spark, tmp_path, pair):
    src_impl, dst_impl = pair
    src = _mk(src_impl, spark, str(tmp_path / "src"))
    dst = _mk(dst_impl, spark, str(tmp_path / "dst"))
    for e in range(3):
        apply_changes(
            src, gen_changes(spark, 600, seed=10 + e), stream_id="s", epoch_id=e
        )
    assert sync_table(src, dst) is not None
    assert _state(dst) == _state(src)
    assert sync_table(src, dst) is None
