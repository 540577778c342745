"""Sharded-manifest mode: commit cost O(touched shards), lazy reads,
shard-diffed change feed, time travel over immutable shard files."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_framework_spark.cdc import apply_changes
from etl_framework_spark.lakehouse import LakeTable
from etl_framework_spark.schemas import KEY_COLUMNS, TRANSCRIPT_SCHEMA

STORED = T.StructType(
    TRANSCRIPT_SCHEMA.fields
    + [
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ]
)


def _changes(spark, rows):
    return spark.createDataFrame(
        [
            (op, lsn, f"2026-01-01 00:00:{sec:02d}", conv, turn, "user", text, None)
            for (op, lsn, sec, conv, turn, text) in rows
        ],
        "op string, lsn long, ts string, conv_id string, turn_idx int, "
        "role string, text string, tool string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


@pytest.fixture()
def table(spark, tmp_path):
    # 512 buckets -> sharded automatically (shard_size 8 -> 64 shards)
    return LakeTable.create(
        spark, str(tmp_path / "t"), schema=STORED, key_columns=KEY_COLUMNS,
        n_buckets=512,
    )


def test_auto_sharding_threshold(spark, tmp_path):
    small = LakeTable.create(
        spark, str(tmp_path / "s"), STORED, KEY_COLUMNS, n_buckets=64
    )
    assert small.manifest_shard_size == 0 and not small.snapshot.sharded
    assert table is not None


def test_sharded_cdc_roundtrip_and_time_travel(spark, table):
    assert table.snapshot.sharded and table.manifest_shard_size == 8
    apply_changes(
        table,
        _changes(spark, [("I", i + 1, i % 60, f"c{i}", 0, f"t{i}") for i in range(40)]),
        epoch_id=0,
    )
    v1 = table.refresh().version
    apply_changes(
        table,
        _changes(spark, [("U", 100, 59, "c0", 0, "updated"), ("D", 101, 59, "c1", 0, None)]),
        epoch_id=1,
    )
    table.refresh()
    rows = {r["conv_id"]: r["text"] for r in table.current().collect()}
    assert rows["c0"] == "updated" and "c1" not in rows and len(rows) == 39
    # time travel via immutable shard files
    old = {r["conv_id"]: r["text"] for r in table.current(version=v1).collect()}
    assert old["c0"] == "t0" and old["c1"] == "t1" and len(old) == 40


def test_commit_rewrites_only_touched_shards(spark, table):
    apply_changes(
        table,
        _changes(spark, [("I", i + 1, i % 60, f"c{i}", 0, f"t{i}") for i in range(40)]),
        epoch_id=0,
    )
    before = dict(table.refresh().snapshot.shards)
    # single-key update touches exactly one bucket -> one shard
    apply_changes(table, _changes(spark, [("U", 99, 59, "c7", 0, "x")]), epoch_id=1)
    after = dict(table.refresh().snapshot.shards)
    moved = [i for i in set(before) | set(after) if before.get(i) != after.get(i)]
    assert len(moved) == 1, f"expected 1 shard rewritten, got {moved}"
    same = [i for i in before if before[i] == after.get(i)]
    assert len(same) == len(before) - len([i for i in moved if i in before])


def test_sharded_change_feed_diffs_only_moved_shards(spark, table):
    apply_changes(table, _changes(spark, [("I", 1, 1, "a", 0, "x")]), epoch_id=0)
    v1 = table.refresh().version
    apply_changes(table, _changes(spark, [("I", 2, 2, "b", 0, "y")]), epoch_id=1)
    v2 = table.refresh().version
    feed = table.changes_between(v1, v2).collect()
    assert {(r["conv_id"], r["_change_type"]) for r in feed} == {("b", "I")}


def test_sharded_concurrent_disjoint_writers_compose(spark, table):
    t_a = LakeTable(spark, table.path)
    t_b = LakeTable(spark, table.path)
    apply_changes(t_a, _changes(spark, [("I", 1, 1, "A", 0, "fa")]),
                  stream_id="a", epoch_id=0)
    apply_changes(t_b, _changes(spark, [("I", 2, 2, "B", 0, "fb")]),
                  stream_id="b", epoch_id=0)
    table.refresh()
    rows = {r["conv_id"]: r["text"] for r in table.current().collect()}
    assert rows == {"A": "fa", "B": "fb"}


def test_sharded_delete_where_prunes_and_drops(spark, table):
    apply_changes(
        table,
        _changes(spark, [("I", i + 1, i % 60, f"c{i}", 0, f"t{i}") for i in range(20)]),
        epoch_id=0,
    )
    table.refresh()
    before = dict(table.snapshot.shards)
    table.delete_where(F.col("conv_id") == "c3")
    table.refresh()
    after = dict(table.snapshot.shards)
    assert {r["conv_id"] for r in table.current().collect()} == {
        f"c{i}" for i in range(20) if i != 3
    }
    moved = [i for i in set(before) | set(after) if before.get(i) != after.get(i)]
    assert len(moved) == 1  # only the shard holding c3's bucket


def test_snapshot_json_is_small_for_sharded_tables(spark, table):
    apply_changes(
        table,
        _changes(spark, [("I", i + 1, i % 60, f"c{i}", 0, f"t{i}") for i in range(40)]),
        epoch_id=0,
    )
    table.refresh()
    p = os.path.join(table.path, "_meta", "v%012d.json" % table.version)
    snap = json.load(open(p))
    assert "buckets" not in snap and "shards" in snap
    # snapshot holds shard REFERENCES, not file lists
    assert all(isinstance(v, str) for v in snap["shards"].values())
