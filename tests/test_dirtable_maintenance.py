"""DirTable maintenance-vs-reader races (round-4 review findings).

Two failure modes around ``expire_snapshots`` checkpoints:

1. A handle that cached commits from v0 and THEN sees a checkpoint
   published by another process must drop the commits the checkpoint
   absorbed — otherwise it computes the next log version past the end
   of the real log and silently goes stale (and a later commit could
   ``os.link`` a version number whose log was expired, forking
   history).
2. ``expire_snapshots`` must never delete a checkpoint NEWER than its
   own cut: a concurrent maintainer may have published one whose
   absorbed commit logs are already gone — deleting it regresses the
   table.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import types as T

from etl_framework_spark.lakehouse import DirTable

SIMPLE = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SIMPLE)


def _make(spark, path, n_appends):
    t = DirTable.create(spark, path, SIMPLE, ["id"], n_buckets=4)
    for i in range(n_appends):
        t.append(_df(spark, [(i, f"v{i}")]))
    return t


def test_refresh_absorbs_foreign_checkpoint(spark, tmp_path):
    """Handle A caches commits from v0; another handle expires the log
    (checkpoint + delete old logs) and keeps committing. A.refresh()
    must fold to the true head, and A's next commit must extend it."""
    path = str(tmp_path / "t")
    a = _make(spark, path, 10)  # a holds v0..v10 cached, no checkpoint
    assert a.version == 10

    b = DirTable(spark, path)
    b.expire_snapshots(keep_last=2, grace_seconds=0)  # ckpt at v9
    b.append(_df(spark, [(100, "after-ckpt-1")]))  # v11
    b.append(_df(spark, [(101, "after-ckpt-2")]))  # v12

    a.refresh()
    assert a.version == 12
    got = {r["id"] for r in a.current().collect()}
    assert {100, 101} <= got and len(got) == 12

    v = a.append(_df(spark, [(102, "from-stale-handle")]))
    assert v == 13  # NOT a fork at some already-expired version number
    assert b.refresh().version == 13


def test_stale_handle_cannot_fork_expired_versions(spark, tmp_path):
    """Handle A last saw v4; the table advances to v20 and the log below
    the cut is expired. A must re-seed from the checkpoint rather than
    fold a stale prefix — pre-fix its next commit could publish an
    already-expired version number (the log file was deleted, so the
    os.link 'uniqueness' check passes) and fork history."""
    path = str(tmp_path / "t")
    a = _make(spark, path, 4)  # a's view: v0..v4
    b = DirTable(spark, path)
    for i in range(16):
        b.append(_df(spark, [(50 + i, f"b{i}")]))  # v5..v20
    b.expire_snapshots(keep_last=3, grace_seconds=0)  # cut=18, logs<=18 gone

    a.refresh()
    assert a.version == 20
    v = a.append(_df(spark, [(999, "tail")]))
    assert v == 21


def test_expire_keeps_newer_checkpoint(spark, tmp_path):
    """A maintainer whose view predates a concurrent (newer) checkpoint
    must not delete it: its absorbed commit logs are already gone, so
    deleting it would regress the table to the older cut."""
    path = str(tmp_path / "t")
    a = _make(spark, path, 14)  # a's frozen view: v0..v14, no ckpt

    b = DirTable(spark, path)
    b.expire_snapshots(keep_last=2, grace_seconds=0)  # ckpt-13, logs<=13 gone
    newer = glob.glob(os.path.join(path, "_log", "_ckpt-*.json"))
    assert len(newer) == 1

    # Freeze A at its pre-checkpoint view to emulate the interleaving
    # (refresh-before-cleanup happened before b's checkpoint landed).
    # Nonzero grace keeps A's (stale-view) data-file GC phase inert —
    # this test is about checkpoint survival.
    a.refresh = lambda: a  # type: ignore[method-assign]
    a.expire_snapshots(keep_last=8, grace_seconds=3600)  # its cut=7 < 13

    # b's newer checkpoint must survive a's older-cut cleanup
    survivors = sorted(glob.glob(os.path.join(path, "_log", "_ckpt-*.json")))
    assert newer[0] in survivors

    c = DirTable(spark, path)
    assert c.version == 14
    assert c.current().count() == 14


def test_commit_cannot_publish_below_a_checkpoint(spark, tmp_path):
    """TOCTOU window (round-4 ADVICE medium): between a writer's
    refresh() and its os.link, another process commits several versions
    AND expires the log (checkpoint published, old logs deleted). The
    stale writer's link of an already-expired version NUMBER then
    succeeds — publishing a commit below the newest checkpoint that no
    reader ever folds. The post-link guard must detect the newer
    checkpoint, retract the bogus file, and retry above it."""
    import types as _types

    path = str(tmp_path / "t")
    a = _make(spark, path, 3)  # a at v3
    assert a.version == 3

    fired = {"done": False}
    orig_refresh = DirTable.refresh

    def hostile_refresh(self):
        out = orig_refresh(self)
        if not fired["done"]:
            # fire ONCE, right after the commit loop's refresh: another
            # process advances the log past a's next version and expires
            # everything, so a's os.link target number is already burned.
            fired["done"] = True
            b = DirTable(spark, path)
            for i in range(5):
                b.append(_df(spark, [(200 + i, f"b{i}")]))  # v4..v8
            # nonzero grace: log files expire regardless (that's the
            # TOCTOU trigger) while a's just-written uncommitted data
            # file survives the orphan GC, as in any sane deployment
            b.expire_snapshots(keep_last=1, grace_seconds=3600)  # ckpt v8
        return out

    a.refresh = _types.MethodType(hostile_refresh, a)
    a.append(_df(spark, [(999, "stale-writer-row")]))

    # The write must land ABOVE the checkpoint and be visible to a
    # fresh reader (pre-fix: it published v4 under ckpt-8 and was lost).
    fresh = DirTable(spark, path)
    got = {r["id"] for r in fresh.current().collect()}
    assert 999 in got
    assert fresh.version >= 9
    # and the bogus below-checkpoint log file was retracted
    assert not os.path.isfile(os.path.join(path, "_log", "v%012d.json" % 4))


def test_commit_folded_by_concurrent_expire_is_not_retried(spark, tmp_path):
    """The other arm of the TOCTOU window (round-5 review): the writer's
    os.link LANDS, then a concurrent expirer with a small keep_last
    folds that fresh commit into a checkpoint before the writer's
    post-link read. The guard sees a checkpoint at/above its version —
    the same signal as the expired-number case — and pre-fix would
    unlink + retry, re-applying the same adds (a duplicate row, an
    exactly-once violation). The checkpoint's per-commit ids let the
    writer recognize its own folded commit and return success."""
    path = str(tmp_path / "t")
    a = _make(spark, path, 3)  # a at v3
    assert a.version == 3

    fired = {"done": False}
    real_link = os.link

    def hostile_link(src, dst, *a_, **kw):
        real_link(src, dst, *a_, **kw)
        if not fired["done"] and dst.endswith("v%012d.json" % 4):
            # a's v4 just landed; fold it into a checkpoint (and delete
            # its log file) before a's post-link verification runs
            fired["done"] = True
            b = DirTable(spark, path)
            b.expire_snapshots(keep_last=1, grace_seconds=3600)  # ckpt v4

    import etl_framework_spark.lakehouse.dirtable as dt_mod

    orig = dt_mod.os.link
    dt_mod.os.link = hostile_link
    try:
        v = a.append(_df(spark, [(999, "folded-row")]))
    finally:
        dt_mod.os.link = orig

    assert fired["done"], "hostile expire never ran; race not exercised"
    assert v == 4  # success at the linked version, not a retried v5
    fresh = DirTable(spark, path)
    assert fresh.version == 4
    rows = [r for r in fresh.current().collect() if r["id"] == 999]
    assert len(rows) == 1, f"double-commit: {rows}"
