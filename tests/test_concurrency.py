"""Optimistic-concurrency behavior: merge preconditions surface true
conflicts (no lost updates), and ``commit_with_retry`` lets contending
writers on the SAME bucket both commit, converging to a serial order.

The lost-update scenario these tests pin down: writer A reads bucket 0's
file list, writer B appends to bucket 0 and commits, writer A commits a
'replace' of bucket 0 computed from its stale read. Without an
``expected`` precondition A's commit silently drops B's files.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_framework_spark.lakehouse import (
    CommitConflict,
    LakeTable,
    commit_with_retry,
)
from etl_framework_spark.operators.load_strategies import LoadStrategy, load

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _upsert_resolve(target, source):
    """source beats target per id (minimal keyed upsert)."""
    src = source.select(*target.columns)
    tagged = target.withColumn("_p", F.lit(0)).unionByName(
        src.withColumn("_p", F.lit(1))
    )
    w = F.struct(F.col("_p"), F.col("v"))
    return (
        tagged.groupBy("id")
        .agg(F.max(w).alias("_w"))
        .select("id", F.col("_w.v").alias("v"))
    )


def test_merge_conflicts_on_concurrent_append_same_bucket(spark, tmp_path):
    """A concurrent append into a bucket the merge also rewrites is a
    CommitConflict — not a silent lost update (ADVICE r2, medium)."""
    path = str(tmp_path / "t")
    LakeTable.create(spark, path, SCHEMA, key_columns=["id"], n_buckets=1)
    t_a = LakeTable(spark, path)
    t_a.append(_df(spark, [(1, "a")]))

    t_b = LakeTable(spark, path)  # fresh handle, sees v1
    stale = LakeTable(spark, path)  # reads BEFORE b's append
    assert stale.version == t_a.version

    t_b.append(_df(spark, [(2, "b")]))  # concurrent writer, same bucket

    with pytest.raises(CommitConflict):
        stale.merge(_df(spark, [(3, "c")]), resolve=_upsert_resolve)

    # Nothing was lost: b's row is still there, the conflicted merge
    # committed nothing.
    ids = {r["id"] for r in LakeTable(spark, path).read().collect()}
    assert ids == {1, 2}

    # The bounded retry re-reads and re-resolves: all three rows land.
    commit_with_retry(
        stale, lambda t: t.merge(_df(spark, [(3, "c")]), resolve=_upsert_resolve)
    )
    ids = {r["id"] for r in LakeTable(spark, path).read().collect()}
    assert ids == {1, 2, 3}


def test_two_writers_same_bucket_both_commit_with_retry(spark, tmp_path):
    """Two threads upserting different keys that hash to the same bucket
    both commit within the retry bound; final state equals either serial
    order (here both orders give the union)."""
    path = str(tmp_path / "t")
    LakeTable.create(spark, path, SCHEMA, key_columns=["id"], n_buckets=1)
    LakeTable(spark, path).append(_df(spark, [(0, "seed")]))

    barrier = threading.Barrier(2)
    errs: list[Exception] = []

    def writer(key: int):
        try:
            t = LakeTable(spark, path)
            batch = _df(spark, [(key, f"w{key}")])
            barrier.wait(timeout=60)
            commit_with_retry(
                t,
                lambda tt: tt.merge(batch, resolve=_upsert_resolve),
                max_retries=8,
            )
        except Exception as e:  # pragma: no cover - surfaced in assert
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(k,)) for k in (1, 2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errs, errs
    rows = {r["id"]: r["v"] for r in LakeTable(spark, path).read().collect()}
    assert rows == {0: "seed", 1: "w1", 2: "w2"}


def test_load_upsert_retries_through_contention(spark, tmp_path):
    """The keyed load strategies go through the same retry loop."""
    path = str(tmp_path / "t")
    load(spark, _df(spark, [(1, "a"), (2, "b")]), path,
         strategy=LoadStrategy.REPLACE, key_columns=["id"], n_buckets=1)

    stale = LakeTable(spark, path)
    LakeTable(spark, path).append(_df(spark, [(3, "c")]))
    _ = stale  # load() constructs its own handle; contention comes from
    # interleaved appends below
    load(spark, _df(spark, [(2, "B")]), path,
         strategy=LoadStrategy.UPSERT, key_columns=["id"], n_buckets=1)
    rows = {r["id"]: r["v"] for r in LakeTable(spark, path).current().collect()}
    assert rows == {1: "a", 2: "B", 3: "c"}


def test_format_version_guard(spark, tmp_path):
    """Unknown table.json format_version and snapshots with neither
    'buckets' nor 'shards' raise instead of reading as empty (ADVICE)."""
    import json
    import os

    path = str(tmp_path / "t")
    LakeTable.create(spark, path, SCHEMA, key_columns=["id"], n_buckets=1)
    meta = os.path.join(path, "_meta")
    with open(os.path.join(meta, "table.json")) as f:
        tm = json.load(f)
    tm["format_version"] = 99
    with open(os.path.join(meta, "table.json"), "w") as f:
        json.dump(tm, f)
    with pytest.raises(ValueError, match="format_version=99"):
        LakeTable(spark, path)

    tm["format_version"] = 2
    with open(os.path.join(meta, "table.json"), "w") as f:
        json.dump(tm, f)
    # corrupt the snapshot: neither buckets nor shards
    snap_path = os.path.join(meta, "v%012d.json" % 0)
    with open(snap_path) as f:
        s = json.load(f)
    s.pop("buckets", None)
    s.pop("shards", None)
    with open(snap_path, "w") as f:
        json.dump(s, f)
    with pytest.raises(ValueError, match="neither 'buckets' nor 'shards'"):
        LakeTable(spark, path)


def test_laketable_satisfies_keyed_table_protocol(spark, tmp_path):
    """The Iceberg adapter seam: LakeTable structurally satisfies the
    KeyedTable protocol every engine component programs against (see
    docs/ICEBERG_ADAPTER.md for the catalog-backed mapping)."""
    from etl_framework_spark.lakehouse import KeyedTable

    t = LakeTable.create(
        spark, str(tmp_path / "p"), SCHEMA, key_columns=["id"], n_buckets=1
    )
    assert isinstance(t, KeyedTable)


def test_concurrent_compact_does_not_regress_schema(spark, tmp_path):
    """A maintenance commit planned against a pre-evolution snapshot
    must not publish its stale schema_id (found by the chaos soak:
    compact raced a schema widening and readers dropped the new column
    until the next evolving write)."""
    path = str(tmp_path / "t")
    LakeTable.create(spark, path, SCHEMA, key_columns=["id"], n_buckets=2)
    w = LakeTable(spark, path)
    # find two ids landing in different buckets, then fragment one bucket
    from etl_framework_spark.lakehouse.table import bucket_expr

    probe = spark.range(20).select(
        "id", bucket_expr(F.col("id").cast("long"), 2).alias("b")
    ).collect()
    id_b0 = [r["id"] for r in probe if r["b"] == 0]
    id_b1 = [r["id"] for r in probe if r["b"] == 1]
    w.append(_df(spark, [(id_b0[0], "x")]))
    w.append(_df(spark, [(id_b0[1], "y")]))  # bucket 0 now has 2 files

    stale = LakeTable(spark, path)  # snapshot BEFORE evolution
    # another writer evolves the schema via an append to bucket 1
    evolved = spark.createDataFrame(
        [(id_b1[0], "z", "EXTRA")], "id long, v string, extra string"
    )
    LakeTable(spark, path).append(evolved)
    assert "extra" in {f.name for f in LakeTable(spark, path).schema.fields}

    stale.compact(min_files=2)  # rewrites bucket 0 from the stale snapshot

    t = LakeTable(spark, path)
    assert "extra" in {f.name for f in t.schema.fields}, "schema regressed"
    rows = {r["id"]: r["extra"] for r in t.current().collect()}
    assert rows[id_b1[0]] == "EXTRA"
