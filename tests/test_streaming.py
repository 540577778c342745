"""Streaming ingest: drain, replay-after-kill, crash-after-commit.

The north rule's resumability cases: restart from checkpoint mid-stream
with no duplicates and no loss.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from etl_framework_spark.cdc import apply_changes  # noqa: F401 (api surface)
from etl_framework_spark.datagen import write_change_log
from etl_framework_spark.lakehouse import LakeTable
from etl_framework_spark.schemas import CHANGE_SCHEMA, KEY_COLUMNS, TRANSCRIPT_SCHEMA
from etl_framework_spark.streaming import run_to_completion, start_ingest

from tests.oracle import replay

STORED_SCHEMA = T.StructType(
    TRANSCRIPT_SCHEMA.fields
    + [
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ]
)


@pytest.fixture()
def setup(spark, tmp_path):
    change_dir = str(tmp_path / "changes")
    table_path = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    write_change_log(spark, change_dir, n_events=6000, n_batches=6, n_convs=60, seed=3)
    LakeTable.create(spark, table_path, STORED_SCHEMA, KEY_COLUMNS, n_buckets=8)
    all_pdf = spark.read.schema(CHANGE_SCHEMA).option("recursiveFileLookup", "true").parquet(
        change_dir
    ).toPandas()
    return change_dir, table_path, ckpt, all_pdf


def assert_matches_oracle(spark, table_path, all_pdf):
    expect = replay(all_pdf)
    got = (
        LakeTable(spark, table_path)
        .current()
        .drop("_deleted")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    assert len(got) == len(expect)
    pd.testing.assert_series_equal(
        got["text"], expect["text"].astype(got["text"].dtype), check_names=False
    )
    pd.testing.assert_series_equal(
        got["_lsn"], expect["_lsn"].astype(got["_lsn"].dtype), check_names=False
    )


def test_stream_drain_matches_oracle(spark, setup):
    change_dir, table_path, ckpt, all_pdf = setup
    q = start_ingest(spark, table_path, change_dir, ckpt, CHANGE_SCHEMA)
    q.awaitTermination()
    assert_matches_oracle(spark, table_path, all_pdf)


def test_replay_after_kill(spark, setup):
    """Crash the query mid-stream (after 2 applied batches), restart from
    the checkpoint, assert no loss and no dupes."""
    change_dir, table_path, ckpt, all_pdf = setup
    applied: list[int] = []

    def crash_after_two(epoch: int):
        applied.append(epoch)
        if len(applied) == 2:
            raise RuntimeError("simulated crash")

    q = start_ingest(
        spark, table_path, change_dir, ckpt, CHANGE_SCHEMA, on_batch=crash_after_two
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    assert len(applied) == 2  # died mid-stream

    # Restart from checkpoint; drains the rest (and may re-deliver the
    # epoch whose foreachBatch raised after apply -> must be skipped by
    # the epoch marker, not double-applied).
    q2 = start_ingest(spark, table_path, change_dir, ckpt, CHANGE_SCHEMA)
    q2.awaitTermination()
    assert_matches_oracle(spark, table_path, all_pdf)

    # Every lineage row committed exactly once per epoch.
    hist = LakeTable(spark, table_path).history()
    epochs = [
        h["summary"]["source_offsets"]["epoch"]
        for h in hist
        if "source_offsets" in h.get("summary", {})
    ]
    assert len(epochs) == len(set(epochs)), f"duplicate epoch commits: {epochs}"


def test_restart_with_no_new_data_is_noop(spark, setup):
    change_dir, table_path, ckpt, all_pdf = setup
    q = start_ingest(spark, table_path, change_dir, ckpt, CHANGE_SCHEMA)
    q.awaitTermination()
    v = LakeTable(spark, table_path).version
    q2 = start_ingest(spark, table_path, change_dir, ckpt, CHANGE_SCHEMA)
    q2.awaitTermination()
    assert LakeTable(spark, table_path).version == v
    assert_matches_oracle(spark, table_path, all_pdf)


@pytest.mark.slow
def test_continuous_trigger_soak(spark, tmp_path):
    """Soak: a continuous processingTime trigger runs >= 60s while a
    concurrent generator keeps appending binlog segments. Final table
    state must equal the pandas replay oracle over everything written,
    and the applied epoch sequence must be strictly monotone (each
    micro-batch committed exactly once, in order)."""
    import time

    from pyspark.sql import functions as F

    from etl_framework_spark.datagen import gen_changes

    change_dir = str(tmp_path / "changes")
    table_path = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    LakeTable.create(spark, table_path, STORED_SCHEMA, KEY_COLUMNS, n_buckets=8)
    # seed one segment so the stream has data at start
    gen_changes(spark, 500, n_convs=40, seed=100, lsn_start=1).coalesce(1).write.parquet(
        f"{change_dir}/b0000"
    )
    q = start_ingest(
        spark,
        table_path,
        change_dir,
        ckpt,
        CHANGE_SCHEMA,
        stream_id="soak",
        available_now=False,
        processing_time="1 second",
        max_files_per_trigger=4,
    )
    try:
        t0 = time.time()
        lsn, batch = 501, 1
        while time.time() - t0 < 60:
            gen_changes(
                spark, 500, n_convs=40, seed=100 + batch, lsn_start=lsn
            ).coalesce(1).write.parquet(f"{change_dir}/b{batch:04d}")
            lsn += 500
            batch += 1
            time.sleep(1.0)
        # drain: consider done when the last 3 progress reports saw no
        # input rows (all segments discovered and applied)
        deadline = time.time() + 120
        while time.time() < deadline:
            prog = q.recentProgress
            if len(prog) >= 3 and all(
                p["numInputRows"] == 0 for p in prog[-3:]
            ):
                break
            time.sleep(2.0)
        else:
            pytest.fail("stream did not drain within 120s")
    finally:
        q.stop()

    all_pdf = (
        spark.read.schema(CHANGE_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(change_dir)
        .toPandas()
    )
    assert batch >= 30, "generator should have produced >= 30 segments"
    assert_matches_oracle(spark, table_path, all_pdf)
    # epochs strictly monotone across the commit history
    epochs = [
        h["summary"]["source_offsets"]["epoch"]
        for h in LakeTable(spark, table_path).history()
        if h["summary"].get("stream_id") == "soak"
        and "source_offsets" in h["summary"]
    ]
    assert epochs == sorted(set(epochs)), f"non-monotone epochs: {epochs}"
    assert len(epochs) >= 5


@pytest.mark.slow
def test_chaos_soak_ingest_compact_expire_evolve(spark, tmp_path):
    """Chaos soak (r2 verdict ask #8): >= 60s of continuous ingest with
    CONCURRENT compaction, snapshot expiry, readers, and a mid-stream
    schema evolution (the stream restarts from its checkpoint with the
    widened binlog schema, as a real reader upgrade would).

    Invariants asserted:
    - no reader ever observes a partial commit (reads never raise, and
      every read of the keyed table sees at most one live row per key);
    - final state equals the pandas replay oracle over every event
      written, including the evolved column;
    - applied epochs are exactly-once and strictly monotone.
    """
    import threading
    import time

    from etl_framework_spark.datagen import gen_changes
    from etl_framework_spark.schemas import CHANGE_SCHEMA_EVOLVED

    change_dir = str(tmp_path / "changes")
    table_path = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    LakeTable.create(spark, table_path, STORED_SCHEMA, KEY_COLUMNS, n_buckets=8)
    gen_changes(spark, 500, n_convs=40, seed=200, lsn_start=1).coalesce(1).write.parquet(
        f"{change_dir}/b0000"
    )

    stop = threading.Event()
    failures: list[str] = []

    def maintenance():
        # concurrent compaction + snapshot expiry against the live table
        while not stop.is_set():
            try:
                t = LakeTable(spark, table_path)
                t.compact(min_files=2)
                t.expire_snapshots(keep_last=15, grace_seconds=10)
            except Exception as e:  # CommitConflict is handled inside; real errors surface
                failures.append(f"maintenance: {e!r}")
            stop.wait(3.0)

    def reader():
        while not stop.is_set():
            try:
                t = LakeTable(spark, table_path)
                cur = t.current()
                dups = (
                    cur.groupBy(*KEY_COLUMNS).count().where("count > 1").count()
                )
                if dups:
                    failures.append(f"reader saw {dups} duplicate keys at v{t.version}")
            except Exception as e:
                failures.append(f"reader: {e!r}")
            stop.wait(2.0)

    threads = [threading.Thread(target=maintenance), threading.Thread(target=reader)]
    for th in threads:
        th.start()

    lsn, batch = 501, 1

    def write_segments(seconds: float, evolved: bool):
        nonlocal lsn, batch
        t0 = time.time()
        while time.time() - t0 < seconds:
            gen_changes(
                spark, 500, n_convs=40, seed=200 + batch, lsn_start=lsn,
                evolved=evolved,
            ).coalesce(1).write.parquet(f"{change_dir}/b{batch:04d}")
            lsn += 500
            batch += 1
            time.sleep(1.0)

    def drain(q, timeout=180):
        deadline = time.time() + timeout
        while time.time() < deadline:
            prog = q.recentProgress
            if len(prog) >= 3 and all(p["numInputRows"] == 0 for p in prog[-3:]):
                return True
            time.sleep(2.0)
        return False

    try:
        # phase 1: original schema
        q = start_ingest(
            spark, table_path, change_dir, ckpt, CHANGE_SCHEMA,
            stream_id="chaos", available_now=False, processing_time="1 second",
            max_files_per_trigger=4,
        )
        try:
            write_segments(30, evolved=False)
        finally:
            q.stop()
        # phase 2: binlog widened (turn_idx int->long, + tool_meta);
        # restart from the SAME checkpoint with the evolved read schema
        q2 = start_ingest(
            spark, table_path, change_dir, ckpt, CHANGE_SCHEMA_EVOLVED,
            stream_id="chaos", available_now=False, processing_time="1 second",
            max_files_per_trigger=4,
        )
        try:
            write_segments(30, evolved=True)
            assert drain(q2), "stream did not drain"
        finally:
            q2.stop()
    finally:
        stop.set()
        for th in threads:
            th.join(timeout=60)

    assert not failures, failures
    assert batch >= 20

    # table schema evolved mid-soak
    cols = {f.name for f in LakeTable(spark, table_path).schema.fields}
    assert "tool_meta" in cols

    all_pdf = (
        spark.read.schema(CHANGE_SCHEMA_EVOLVED)
        .option("recursiveFileLookup", "true")
        .parquet(change_dir)
        .toPandas()
    )
    expect = replay(all_pdf)
    got = (
        LakeTable(spark, table_path)
        .current()
        .drop("_deleted")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    assert len(got) == len(expect)
    pd.testing.assert_series_equal(
        got["text"], expect["text"].astype(got["text"].dtype), check_names=False
    )
    pd.testing.assert_series_equal(
        got["tool_meta"],
        expect["tool_meta"].astype(got["tool_meta"].dtype),
        check_names=False,
    )
    epochs = [
        h["summary"]["source_offsets"]["epoch"]
        for h in LakeTable(spark, table_path).history()
        if h["summary"].get("stream_id") == "chaos"
        and "source_offsets" in h["summary"]
    ]
    assert epochs == sorted(set(epochs)), f"non-monotone epochs: {epochs}"


def test_inline_maintenance_compacts_and_expires(spark, tmp_path):
    """maintenance_every: the ingest daemon compacts fragmented buckets
    and expires old snapshots between epochs without changing results."""
    change_dir = str(tmp_path / "changes")
    table_path = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    write_change_log(spark, change_dir, n_events=6000, n_batches=12, n_convs=40, seed=5)
    LakeTable.create(spark, table_path, STORED_SCHEMA, KEY_COLUMNS, n_buckets=4)
    all_pdf = (
        spark.read.schema(CHANGE_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(change_dir)
        .toPandas()
    )
    q = start_ingest(
        spark, table_path, change_dir, ckpt, CHANGE_SCHEMA,
        stream_id="maint", max_files_per_trigger=1,
        maintenance_every=3, compact_min_files=2,
        expire_keep_last=5, expire_grace_seconds=3600,
    )
    q.awaitTermination()
    assert_matches_oracle(spark, table_path, all_pdf)
    t = LakeTable(spark, table_path)
    stats = t.file_stats()
    # merges REPLACE touched buckets, so the steady-state file count per
    # bucket is bounded by the resolver's salt-group count; compaction
    # keeps it at/below that bound (task retries under load can leave a
    # few extra committed part files — content stays exact, hence the
    # slack; the oracle equality above is the correctness gate)
    assert stats["max_files_per_bucket"] <= 8, stats
    # the maintenance hook really ran: compact commits in the history
    ops = [h["summary"].get("operation") for h in t.history()]
    assert "compact" in ops, ops
    # expire_snapshots bounded the version directory (one snapshot per
    # epoch + maintenance would otherwise exceed this comfortably)
    import glob
    import os

    versions = glob.glob(os.path.join(table_path, "_meta", "v*.json"))
    assert len(versions) <= 10, len(versions)


def test_two_concurrent_streams_same_table(spark, tmp_path):
    """Two independent binlog streams (disjoint conversation spaces,
    own checkpoints and stream_ids) drain CONCURRENTLY into the same
    table: merge preconditions + the retry loop make every commit land,
    and the final state equals the replay oracle over the union."""
    import threading

    from pyspark.sql import functions as F

    from etl_framework_spark.datagen import gen_changes

    table_path = str(tmp_path / "table")
    LakeTable.create(spark, table_path, STORED_SCHEMA, KEY_COLUMNS, n_buckets=4)
    dirs = {}
    for name, seed in [("a", 11), ("b", 22)]:
        d = str(tmp_path / f"log_{name}")
        # distinct conv spaces via distinct seeds and lsn ranges
        gen_changes(
            spark, 3000, n_convs=30, seed=seed, lsn_start=1 if name == "a" else 100_000
        ).withColumn("conv_id", F.concat(F.lit(name + "-"), F.col("conv_id"))).write.parquet(
            f"{d}/b0"
        )
        dirs[name] = d

    errs: list[Exception] = []

    def drain(name: str):
        try:
            q = start_ingest(
                spark, table_path, dirs[name], str(tmp_path / f"ck_{name}"),
                CHANGE_SCHEMA, stream_id=name, max_files_per_trigger=1,
            )
            q.awaitTermination()
        except Exception as e:  # pragma: no cover - surfaced in assert
            # StreamingQueryException hides the foreachBatch error in
            # its cause chain; capture the full text for the assert
            import traceback

            errs.append(
                f"{name}: {e!r}\n" + "".join(traceback.format_exception(e))[-3000:]
            )

    threads = [threading.Thread(target=drain, args=(n,)) for n in ("a", "b")]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errs, errs

    all_pdf = (
        spark.read.schema(CHANGE_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(dirs["a"], dirs["b"])
        .toPandas()
    )
    assert_matches_oracle(spark, table_path, all_pdf)
    # both streams' epoch markers committed
    t = LakeTable(spark, table_path)
    assert t.last_epoch("a") >= 0 and t.last_epoch("b") >= 0


def test_stats_driven_maintenance_bounds_files(spark, tmp_path):
    """maintenance_max_files (round-5 VERDICT #7): compaction fires from
    the per-bucket FILE COUNT (file_stats), not the epoch counter — a
    merge-on-read ingest keeps every bucket's file count bounded while
    cold buckets aren't rewritten, and the final state still matches
    the replay oracle."""
    change_dir = str(tmp_path / "changes")
    table_path = str(tmp_path / "table")
    write_change_log(spark, change_dir, n_events=6000, n_batches=6, n_convs=60, seed=5)
    LakeTable.create(
        spark, table_path, STORED_SCHEMA, KEY_COLUMNS, n_buckets=8,
        merge_policy="lww",
    )
    all_pdf = (
        spark.read.schema(CHANGE_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(change_dir)
        .toPandas()
    )
    run_to_completion(
        spark, table_path, change_dir, str(tmp_path / "ckpt"), CHANGE_SCHEMA,
        stream_id="s", max_files_per_trigger=1,
        maintenance_max_files=3,
    )
    t = LakeTable(spark, table_path)
    st = t.file_stats()
    # 6 MoR epochs over 8 buckets would leave ~6 delta files per bucket
    # unmaintained; the stats trigger keeps the ceiling at threshold+1
    # (one delta may land after the last check)
    assert st["max_files_per_bucket"] <= 4, st
    compactions = [
        h for h in t.history() if h["summary"].get("operation") == "compact"
    ]
    assert compactions, "stats trigger must have compacted at least once"
    # hot-bucket selectivity: compact commits list ONLY buckets at/over
    # the threshold, so cold buckets were never churned
    for c in compactions:
        assert c["summary"].get("buckets"), c
    assert_matches_oracle(spark, table_path, all_pdf)
