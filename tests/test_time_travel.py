"""Time travel + row-level change feed (CDC-out) on LakeTable."""

from __future__ import annotations

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
    return LakeTable.create(
        spark, str(tmp_path / "t"), schema=STORED, key_columns=KEY_COLUMNS, n_buckets=4
    )


def test_time_travel_reads_old_version(spark, table):
    apply_changes(table, _changes(spark, [("I", 1, 1, "c1", 0, "v1")]), epoch_id=0)
    v1 = table.refresh().version
    apply_changes(table, _changes(spark, [("U", 2, 2, "c1", 0, "v2")]), epoch_id=1)
    table.refresh()
    assert table.current().head()["text"] == "v2"
    assert table.current(version=v1).head()["text"] == "v1"
    assert table.read(version=0).count() == 0


def test_changes_between_versions(spark, table):
    apply_changes(
        table,
        _changes(
            spark,
            [("I", 1, 1, "c1", 0, "a"), ("I", 2, 1, "c1", 1, "b"), ("I", 3, 1, "c2", 0, "c")],
        ),
        epoch_id=0,
    )
    v1 = table.refresh().version
    apply_changes(
        table,
        _changes(
            spark,
            [("U", 4, 5, "c1", 0, "a2"), ("D", 5, 5, "c1", 1, None), ("I", 6, 5, "c3", 0, "d")],
        ),
        epoch_id=1,
    )
    v2 = table.refresh().version
    feed = {
        (r["conv_id"], r["turn_idx"]): (r["_change_type"], r["text"])
        for r in table.changes_between(v1, v2).collect()
    }
    assert feed[("c1", 0)] == ("U", "a2")
    assert feed[("c1", 1)][0] == "D"
    assert feed[("c3", 0)] == ("I", "d")
    assert ("c2", 0) not in feed  # untouched key in an untouched bucket... or same bucket but unchanged state


def test_changes_between_is_bucket_pruned(spark, table):
    apply_changes(table, _changes(spark, [("I", 1, 1, "c1", 0, "a")]), epoch_id=0)
    v1 = table.refresh().version
    apply_changes(table, _changes(spark, [("I", 2, 2, "c2", 0, "b")]), epoch_id=1)
    v2 = table.refresh().version
    feed = table.changes_between(v1, v2).collect()
    assert {(r["conv_id"], r["_change_type"]) for r in feed} == {("c2", "I")}


def test_compaction_bounds_files_and_preserves_state(spark, table):
    from etl_framework_spark.operators import LoadStrategy, load

    for i in range(4):
        df = _changes(spark, [("I", 10 + i, i, "c1", i, f"t{i}")]).drop("op", "lsn")
        load(spark, df.withColumn("_lsn", F.lit(10 + i).cast("long")).withColumn(
            "_deleted", F.lit(False)), table.path, LoadStrategy.APPEND)
    table.refresh()
    before = table.file_stats()
    assert before["max_files_per_bucket"] >= 2
    state = {(r["conv_id"], r["turn_idx"], r["text"]) for r in table.current().collect()}
    v_before = table.version
    table.compact(min_files=2)
    table.refresh()
    after = table.file_stats()
    assert after["max_files_per_bucket"] == 1
    assert {(r["conv_id"], r["turn_idx"], r["text"]) for r in table.current().collect()} == state
    # time travel across the compaction boundary still works
    assert table.current(version=v_before).count() == len(state)


def test_commit_metrics_recorded(spark, table):
    apply_changes(table, _changes(spark, [("I", 1, 1, "c1", 0, "x")]), epoch_id=0)
    summary = table.refresh().snapshot.summary
    assert summary["metrics"]["apply_seconds"] > 0
    assert summary["lineage"][0]["rows"] == 1


def test_concurrent_disjoint_writers_compose(spark, table):
    """Two writers racing on DISJOINT keys: the loser of the version race
    must rebase onto the winner's snapshot, preserving its buckets
    (regression: a stale full-replacement commit silently dropped the
    winner's files)."""
    # both handles start at the same version
    t_a = LakeTable(spark, table.path)
    t_b = LakeTable(spark, table.path)
    apply_changes(t_a, _changes(spark, [("I", 1, 1, "conv-A", 0, "from-A")]),
                  stream_id="a", epoch_id=0)
    # t_b still holds the pre-A snapshot; its commit attempt collides and
    # must retry+rebase on top of A's version
    apply_changes(t_b, _changes(spark, [("I", 2, 2, "conv-B", 0, "from-B")]),
                  stream_id="b", epoch_id=0)
    table.refresh()
    rows = {r["conv_id"]: r["text"] for r in table.current().collect()}
    assert rows == {"conv-A": "from-A", "conv-B": "from-B"}
    assert table.last_epoch("a") == 0 and table.last_epoch("b") == 0


def test_delete_where_rewrites_only_touched_buckets(spark, table):
    """GC must be delta-proportional: buckets without matching rows keep
    their exact file lists across the delete commit (carried by
    reference, not rewritten)."""
    apply_changes(
        table,
        _changes(
            spark,
            [("I", i + 1, i, f"c{i}", 0, f"t{i}") for i in range(8)],
        ),
        epoch_id=0,
    )
    table.refresh()
    before = {b: list(fs) for b, fs in table.snapshot.buckets.items()}
    # find the bucket holding c0 via the canonical bucket function
    from etl_framework_spark.lakehouse.table import bucket_expr

    target_bucket = str(
        table.current()
        .where(F.col("conv_id") == "c0")
        .select(bucket_expr("conv_id", table.n_buckets).alias("b"))
        .head()["b"]
    )
    table.delete_where(F.col("conv_id") == "c0")
    table.refresh()
    after = table.snapshot.buckets
    assert {r["conv_id"] for r in table.current().collect()} == {
        f"c{i}" for i in range(1, 8)
    }
    for b, fs in before.items():
        if b != target_bucket:
            assert after.get(b) == fs, f"untouched bucket {b} was rewritten"
    assert after.get(target_bucket) != before.get(target_bucket)
    assert table.snapshot.summary["touched_buckets"] == [int(target_bucket)]


def test_delete_where_keeps_tombstones_with_null_predicate_columns(spark, table):
    """SQL DELETE semantics: rows where the predicate evaluates NULL
    are kept. Delete tombstones carry NULL payload columns, so a
    payload predicate must not GC a tombstone that shares a bucket with
    a real match — losing its stored (ts, _lsn) would let a late,
    OLDER event resurrect the deleted key."""
    apply_changes(
        table,
        _changes(spark, [("I", 1, 1, "c1", 0, "a"), ("I", 2, 1, "c1", 1, "kill")]),
        epoch_id=0,
    )
    apply_changes(table, _changes(spark, [("D", 3, 3, "c1", 0, None)]), epoch_id=1)
    table.refresh()
    key0 = (F.col("conv_id") == "c1") & (F.col("turn_idx") == 0)
    phys = table.read().where(key0).collect()
    assert len(phys) == 1 and phys[0]["_deleted"]  # tombstone, NULL text

    table.delete_where(F.col("text") == "kill")  # same bucket as the tombstone
    table.refresh()
    assert table.current().where(F.col("text") == "kill").count() == 0
    phys = table.read().where(key0).collect()
    assert len(phys) == 1 and phys[0]["_deleted"], "tombstone was GC'd as collateral"

    # the surviving tombstone still no-ops a late out-of-order older event
    apply_changes(table, _changes(spark, [("U", 2, 2, "c1", 0, "zombie")]), epoch_id=2)
    assert table.refresh().current().where(key0).count() == 0


def test_delete_where_no_matches_is_noop(spark, table):
    apply_changes(table, _changes(spark, [("I", 1, 1, "c1", 0, "x")]), epoch_id=0)
    v = table.refresh().version
    assert table.delete_where(F.col("conv_id") == "nope") == v
    assert table.refresh().version == v


def test_merge_with_narrower_key_type_hits_right_buckets(spark, tmp_path):
    """Regression: touched_buckets must hash the source key CAST to the
    table's key type — xxhash64(int) != xxhash64(long), so an int batch
    merged into a long-keyed table used to compute a wrong touched set
    and leave stale row versions alive next to the new winners."""
    from etl_framework_spark.operators import LoadStrategy, load

    base = spark.createDataFrame(
        [(int(k), "old") for k in range(20)], "k long, v string"
    )
    path = str(tmp_path / "narrow")
    load(spark, base, path, LoadStrategy.FAIL, key_columns=["k"], n_buckets=8)
    batch = spark.createDataFrame(
        [(k, "new") for k in range(20)], "k int, v string"
    )
    t = load(spark, batch, path, LoadStrategy.UPSERT, key_columns=["k"])
    rows = t.refresh().current().collect()
    assert len(rows) == 20, "stale versions survived alongside upserted rows"
    assert {r["v"] for r in rows} == {"new"}


def test_key_column_widening_is_rejected(spark, tmp_path):
    """Widening a KEY column would silently split each key across two
    buckets (hashing is type-sensitive); the schema guard must refuse."""
    from etl_framework_spark.lakehouse.table import SchemaEvolutionError
    from etl_framework_spark.operators import LoadStrategy, load

    base = spark.createDataFrame([(1, "a")], "k int, v string")
    path = str(tmp_path / "widen")
    load(spark, base, path, LoadStrategy.FAIL, key_columns=["k"])
    wide = spark.createDataFrame([(2, "b")], "k long, v string")
    with pytest.raises(SchemaEvolutionError, match="key column"):
        load(spark, wide, path, LoadStrategy.APPEND)


def test_latest_hint_speeds_refresh_and_survives_staleness(spark, table):
    """Refresh must find the newest version even when the LATEST hint is
    stale or missing (it probes forward / falls back to the glob)."""
    import os

    apply_changes(table, _changes(spark, [("I", 1, 1, "c1", 0, "a")]), epoch_id=0)
    apply_changes(table, _changes(spark, [("U", 2, 2, "c1", 0, "b")]), epoch_id=1)
    hint = os.path.join(table.path, "_meta", "LATEST")
    assert int(open(hint).read()) == table.refresh().version
    # stale hint: refresh probes forward past it
    with open(hint, "w") as f:
        f.write("0")
    assert table.refresh().version == 2
    # missing hint: glob fallback
    os.unlink(hint)
    assert table.refresh().version == 2


def test_expire_snapshots_gc_and_time_travel_window(spark, table):
    for i in range(6):
        apply_changes(
            table, _changes(spark, [("U", i + 1, i, "c1", 0, f"v{i}")]), epoch_id=i
        )
    table.refresh()
    assert table.version == 6
    import glob as g

    n_files_before = len(
        g.glob(os.path.join(table.path, "data", "**", "*.parquet"), recursive=True)
    )
    stats = table.expire_snapshots(keep_last=2, grace_seconds=0)
    assert stats["expired_snapshots"] == 5  # v0..v4 gone, v5/v6 kept
    # live state intact
    assert table.current().head()["text"] == "v5"
    assert table.current(version=5).head()["text"] == "v4"
    # expired version signals the DEDICATED retention error (the relay
    # keys its bootstrap-vs-gap decision on this, round-4 ADVICE), not
    # a bare missing-file error
    from etl_framework_spark.lakehouse import VersionExpiredError

    with pytest.raises(VersionExpiredError):
        table.snapshot_at(2)
    # a version beyond the head is a plain ValueError, never "expired"
    with pytest.raises(ValueError) as exc_info:
        table.snapshot_at(99)
    assert not isinstance(exc_info.value, VersionExpiredError)
    n_files_after = len(
        g.glob(os.path.join(table.path, "data", "**", "*.parquet"), recursive=True)
    )
    assert n_files_after < n_files_before
    # every surviving snapshot still fully readable
    assert table.read(version=6).count() == table.read().count()


def test_expire_snapshots_grace_protects_fresh_files(spark, table):
    apply_changes(table, _changes(spark, [("I", 1, 1, "c1", 0, "a")]), epoch_id=0)
    apply_changes(table, _changes(spark, [("U", 2, 2, "c1", 0, "b")]), epoch_id=1)
    table.refresh()
    stats = table.expire_snapshots(keep_last=1, grace_seconds=3600)
    # snapshots expired but just-written data files survive the grace
    assert stats["expired_snapshots"] >= 1
    assert stats["deleted_data_files"] == 0
    assert table.current().head()["text"] == "b"
