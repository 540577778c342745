"""LakeTable — bucket-partitioned parquet table with snapshot isolation.

Iceberg-semantics storage for the CDC engine, built for the copy-on-write
MERGE pattern:

- **Data layout**: ``data/<commit-uuid>/_bucket=N/part-*.parquet``. Every
  row is assigned ``bucket = pmod(xxhash64(key0), n_buckets)`` — the same
  function every writer uses, so a merge can compute which buckets a
  source batch touches and read/rewrite ONLY those buckets. Untouched
  buckets are carried forward by reference in the next snapshot (this is
  what keeps MERGE cost proportional to the delta, not the table, at
  100 TB scale).
- **Snapshots**: ``_meta/v%012d.json`` manifests list
  ``bucket -> [(file, schema_id)]``. Commit = write temp file + ``os.link``
  to the final name — ``os.link`` fails if the version already exists,
  giving optimistic-concurrency commits on POSIX (a real deployment swaps
  this for an Iceberg/HMS catalog swap; the rest of the engine is
  unchanged).
- **Schema evolution**: schemas are versioned; data files keep the
  schema_id they were written with, and reads upcast old files to the
  current schema (missing columns -> NULL, widened types -> cast). Add
  column + int->long / float->double widening supported, mirroring
  Iceberg's promotion rules and replacing the reference's degrade-to-TEXT
  ALTER TABLE (reference:src/etl_framework/plugins/loaders/sql_loader.py:115-167).
- **Exactly-once**: each snapshot may record an ``epoch`` marker
  ``(stream_id, epoch_id)``; ``last_epoch(stream_id)`` lets a foreachBatch
  sink skip re-delivered epochs (epoch ids are monotone per stream, so a
  single max per stream is a complete idempotence check).
- **Lineage**: each commit stores per-bucket lineage (row counts, LSN
  ranges, source offsets) in the snapshot summary — the distributed analog
  of the reference's audit trail
  (reference:src/etl_framework/security/audit_logger.py:100-146).
"""

from __future__ import annotations

import glob
import json
import os
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_DIR = "_meta"
DATA_DIR = "data"

#: Iceberg-compatible primitive type promotions (old -> new).
_WIDENINGS = {
    ("integer", "long"): True,
    ("float", "double"): True,
}


class SchemaEvolutionError(ValueError):
    """Incoming batch schema cannot be merged into the table schema."""


class CommitConflict(RuntimeError):
    """A concurrent writer rewrote a bucket this commit also rewrote.

    Raised instead of silently publishing a stale view: the caller can
    re-read and retry the whole operation against the new snapshot."""


def bucket_expr(key, n_buckets: int):
    """The canonical row->bucket function. Pure, so any reader can
    recompute bucket membership without consulting file paths.

    ``key`` may be a column name or a Column. Spark's ``xxhash64`` is
    TYPE-sensitive (int and long hash differently), so callers hashing a
    source batch must cast the key to the table's key type first — see
    ``LakeTable.touched_buckets``."""
    col = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def merge_schemas(current: T.StructType, incoming: T.StructType) -> tuple[T.StructType, bool]:
    """Merge an incoming batch schema into the table schema.

    Returns (merged_schema, changed). New columns append as nullable;
    overlapping columns may widen per ``_WIDENINGS``; anything else raises.
    Incoming *narrower* types (e.g. int batch into long table) are fine —
    the batch is upcast at write time.
    """
    cur = {f.name: f for f in current.fields}
    fields = list(current.fields)
    changed = False
    for f in incoming.fields:
        if f.name not in cur:
            fields.append(T.StructField(f.name, f.dataType, True))
            changed = True
            continue
        old = cur[f.name]
        if old.dataType == f.dataType:
            continue
        o, n = old.dataType.typeName(), f.dataType.typeName()
        if _WIDENINGS.get((o, n)):
            idx = [x.name for x in fields].index(f.name)
            fields[idx] = T.StructField(f.name, f.dataType, old.nullable)
            changed = True
        elif _WIDENINGS.get((n, o)):
            continue  # batch is narrower; upcast on write
        else:
            raise SchemaEvolutionError(
                f"column {f.name!r}: cannot evolve {old.dataType.simpleString()} "
                f"-> {f.dataType.simpleString()}"
            )
    return T.StructType(fields), changed


def align_to_schema(
    df: DataFrame, schema: T.StructType, keep: list[str] | None = None
) -> DataFrame:
    """Project ``df`` onto ``schema``: missing columns become NULL, common
    columns are cast; ``keep`` names pass-through system columns (e.g.
    ``_bucket``) preserved verbatim. The Spark analog of the reference's
    ``_ensure_columns_exist`` + per-column ALTER
    (reference:src/etl_framework/plugins/loaders/sql_loader.py:115-167)."""
    have = set(df.columns)
    cols = [
        (F.col(f.name).cast(f.dataType) if f.name in have else F.lit(None).cast(f.dataType)).alias(
            f.name
        )
        for f in schema.fields
    ]
    cols += [F.col(c) for c in (keep or []) if c in have]
    return df.select(*cols)


@dataclass
class Snapshot:
    version: int
    schema_id: int
    summary: dict[str, Any]
    buckets: dict[str, list[dict[str, Any]]]  # bucket -> [{"path", "schema_id"}]
    epochs: dict[str, int]  # stream_id -> max applied epoch


class LakeTable:
    """A bucket-partitioned snapshot-versioned parquet table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self._snap: Snapshot | None = None
        self._schemas: dict[int, T.StructType] = {}
        self.n_buckets: int = 0
        self.key_columns: list[str] = []
        self._load_meta()

    # ------------------------------------------------------------- create
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_columns: list[str],
        n_buckets: int = 32,
        if_exists: str = "error",
    ) -> "LakeTable":
        """Create an empty table. ``if_exists``: error | ignore | replace."""
        meta = os.path.join(os.path.abspath(path), META_DIR)
        if os.path.exists(os.path.join(meta, "table.json")):
            if if_exists == "error":
                raise FileExistsError(f"LakeTable already exists at {path}")
            if if_exists == "ignore":
                return cls(spark, path)
            if if_exists == "replace":
                import shutil

                shutil.rmtree(path)
        os.makedirs(meta, exist_ok=True)
        os.makedirs(os.path.join(os.path.abspath(path), DATA_DIR), exist_ok=True)
        table_meta = {
            "format_version": 1,
            "key_columns": key_columns,
            "n_buckets": n_buckets,
            "schemas": {"0": json.loads(schema.json())},
        }
        with open(os.path.join(meta, "table.json"), "w") as f:
            json.dump(table_meta, f)
        snap = {
            "version": 0,
            "schema_id": 0,
            "summary": {"operation": "create"},
            "buckets": {},
            "epochs": {},
        }
        with open(os.path.join(meta, "v%012d.json" % 0), "w") as f:
            json.dump(snap, f)
        return cls(spark, path)

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.exists(os.path.join(os.path.abspath(path), META_DIR, "table.json"))

    # --------------------------------------------------------------- meta
    def _load_meta(self) -> None:
        meta = os.path.join(self.path, META_DIR)
        with open(os.path.join(meta, "table.json")) as f:
            tm = json.load(f)
        self.key_columns = tm["key_columns"]
        self.n_buckets = tm["n_buckets"]
        self._schemas = {
            int(k): T.StructType.fromJson(v) for k, v in tm["schemas"].items()
        }
        versions = sorted(
            int(os.path.basename(p)[1:-5])
            for p in glob.glob(os.path.join(meta, "v*.json"))
        )
        with open(os.path.join(meta, "v%012d.json" % versions[-1])) as f:
            s = json.load(f)
        self._snap = Snapshot(
            version=s["version"],
            schema_id=s["schema_id"],
            summary=s.get("summary", {}),
            buckets=s.get("buckets", {}),
            epochs=s.get("epochs", {}),
        )

    def refresh(self) -> "LakeTable":
        self._load_meta()
        return self

    @property
    def snapshot(self) -> Snapshot:
        assert self._snap is not None
        return self._snap

    @property
    def version(self) -> int:
        return self.snapshot.version

    @property
    def schema(self) -> T.StructType:
        return self._schemas[self.snapshot.schema_id]

    def history(self) -> list[dict[str, Any]]:
        meta = os.path.join(self.path, META_DIR)
        out = []
        for p in sorted(glob.glob(os.path.join(meta, "v*.json"))):
            with open(p) as f:
                s = json.load(f)
            out.append({"version": s["version"], "summary": s.get("summary", {})})
        return out

    def last_epoch(self, stream_id: str) -> int:
        """Max applied epoch for a stream (-1 if none). Epochs are monotone
        per stream, so this is a complete already-applied check."""
        return int(self.snapshot.epochs.get(stream_id, -1))

    def snapshot_at(self, version: int) -> Snapshot:
        """Load a historical snapshot (time travel)."""
        p = os.path.join(self.path, META_DIR, "v%012d.json" % version)
        with open(p) as f:
            s = json.load(f)
        return Snapshot(
            version=s["version"],
            schema_id=s["schema_id"],
            summary=s.get("summary", {}),
            buckets=s.get("buckets", {}),
            epochs=s.get("epochs", {}),
        )

    # -------------------------------------------------------------- reads
    def _read_files(self, entries: list[dict[str, Any]]) -> DataFrame | None:
        """Read manifest file entries, upcasting each schema group to the
        current table schema."""
        if not entries:
            return None
        by_schema: dict[int, list[str]] = {}
        for e in entries:
            by_schema.setdefault(int(e["schema_id"]), []).append(
                os.path.join(self.path, e["path"])
            )
        current = self.schema
        parts = []
        for sid, files in by_schema.items():
            df = self.spark.read.schema(self._schemas[sid]).parquet(*files)
            parts.append(align_to_schema(df, current))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(
        self, buckets: list[int] | None = None, version: int | None = None
    ) -> DataFrame:
        """Snapshot as a DataFrame; optionally only some buckets and/or a
        historical ``version`` (time travel — old data files are never
        mutated, only dereferenced, so any committed version stays
        readable until GC)."""
        snap = self.snapshot if version is None else self.snapshot_at(version)
        entries: list[dict[str, Any]] = []
        sel = None if buckets is None else {str(b) for b in buckets}
        for b, files in snap.buckets.items():
            if sel is None or b in sel:
                entries.extend(files)
        df = self._read_files(entries)
        if df is None:
            return self.spark.createDataFrame([], self.schema)
        return df

    def current(
        self, buckets: list[int] | None = None, version: int | None = None
    ) -> DataFrame:
        """Live rows: ``read()`` minus delete tombstones (if the table
        carries the ``_deleted`` system column)."""
        df = self.read(buckets=buckets, version=version)
        if "_deleted" in df.columns:
            df = df.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
        return df

    def changes_between(self, v_from: int, v_to: int) -> DataFrame:
        """Row-level change feed between two committed versions (CDC-out):
        one row per key whose state changed, with ``_change_type`` I/U/D.

        Bucket-pruned: only buckets whose file lists differ between the
        snapshots are read (copy-on-write rewrites whole buckets, so an
        identical file list ⇒ identical content). The diff itself is a
        full-outer join on the key within those buckets:
        new-only ⇒ I, both-with-newer-lsn ⇒ U, old-live-but-now-gone or
        tombstoned ⇒ D.
        """
        old_snap, new_snap = self.snapshot_at(v_from), self.snapshot_at(v_to)
        changed = [
            b
            for b in set(old_snap.buckets) | set(new_snap.buckets)
            if old_snap.buckets.get(b) != new_snap.buckets.get(b)
        ]
        changed_ids = sorted(int(b) for b in changed)
        old = self.current(buckets=changed_ids, version=v_from)
        new = self.current(buckets=changed_ids, version=v_to)
        keys = self.key_columns
        o = old.select(*keys, F.col("_lsn").alias("_old_lsn")).alias("o")
        n = new.alias("n")
        joined = n.join(o, on=keys, how="full_outer")
        # _lsn is non-null for every live stored row, so side-nullness of
        # _lsn is the presence test (tombstones were filtered by current())
        ctype = (
            F.when(F.col("o._old_lsn").isNull(), F.lit("I"))
            .when(F.col("n._lsn").isNull(), F.lit("D"))
            .when(F.col("n._lsn") != F.col("o._old_lsn"), F.lit("U"))
        )
        out_cols = [c for c in new.columns if c != "_deleted"]
        return (
            joined.withColumn("_change_type", ctype)
            .where(F.col("_change_type").isNotNull())
            .select(*[F.col(f"n.{c}").alias(c) if c not in keys else F.col(c) for c in out_cols], "_change_type")
        )

    def compact_tombstones(self, older_than) -> int:
        """Garbage-collect tombstones whose ``ts`` predates the log's
        out-of-orderness bound (events older than this can no longer
        arrive, so the tombstone has finished its job)."""
        return self.delete_where(
            F.coalesce(F.col("_deleted"), F.lit(False)) & (F.col("ts") < F.lit(older_than)),
            summary={"operation": "compact_tombstones"},
        )

    def touched_buckets(self, source: DataFrame) -> list[int]:
        """Buckets a source batch lands in (small: <= n_buckets rows).

        The source key is CAST to the table's key type before hashing:
        xxhash64 is type-sensitive, so an int batch merged into a
        long-keyed table (which ``merge_schemas`` permits) would
        otherwise compute a wrong touched set and leave stale row
        versions alive in the real bucket."""
        key = self.key_columns[0]
        ktype = self.schema[key].dataType
        rows = (
            source.select(
                bucket_expr(F.col(key).cast(ktype), self.n_buckets).alias("b")
            )
            .distinct()
            .collect()
        )
        return sorted(r["b"] for r in rows)

    # ------------------------------------------------------------- writes
    def _write_data(self, df: DataFrame, schema_id: int) -> dict[str, list[dict[str, Any]]]:
        """Write df (already aligned to schema_id's schema) bucket-
        partitioned; returns bucket -> manifest entries.

        If ``df`` already carries a ``_bucket`` column (the single-shuffle
        resolver emits data repartitioned by bucket and key-sorted), it is
        written as-is — no extra exchange or sort."""
        commit_id = uuid.uuid4().hex[:16]
        out_dir = os.path.join(self.path, DATA_DIR, commit_id)
        schema = self._schemas[schema_id]
        if "_bucket" in df.columns:
            keyed = df
        else:
            # One shuffle, partitioned by bucket so each output dir is
            # written by the tasks owning that bucket; file count per
            # bucket stays low.
            keyed = (
                df.withColumn("_bucket", bucket_expr(self.key_columns[0], self.n_buckets))
                .repartition("_bucket")
                .sortWithinPartitions(*self.key_columns)
            )
        keyed.write.partitionBy("_bucket").parquet(out_dir, mode="overwrite")
        buckets: dict[str, list[dict[str, Any]]] = {}
        for bdir in glob.glob(os.path.join(out_dir, "_bucket=*")):
            b = bdir.rsplit("=", 1)[1]
            for fp in glob.glob(os.path.join(bdir, "*.parquet")):
                rel = os.path.relpath(fp, self.path)
                buckets.setdefault(b, []).append({"path": rel, "schema_id": schema_id})
        # partitionBy drops _bucket from the files; record schema minus it.
        _ = schema
        return buckets

    def _commit(
        self,
        buckets: dict[str, list[dict[str, Any]]] | None,
        schema_id: int,
        summary: dict[str, Any],
        epoch: tuple[str, int] | None = None,
        max_retries: int = 10,
        rebase=None,
    ) -> int:
        """Atomically publish a new snapshot. Optimistic concurrency: the
        hard-link commit fails if another writer took the version; reload
        and retry on top of their snapshot.

        ``rebase(fresh_buckets) -> new_buckets`` — when given, the bucket
        map is REBUILT against the freshly-loaded snapshot on every
        attempt, so a concurrent writer's commits to buckets this commit
        did not touch are preserved (writers with disjoint touched sets
        compose; overlapping buckets are last-committer-wins). A static
        ``buckets`` map (no rebase) replaces the whole view and is only
        safe for single-writer tables."""
        meta = os.path.join(self.path, META_DIR)
        # summary values may be zero-arg callables (e.g. a lineage job
        # running concurrently with the data write) — resolve them now,
        # at the last moment before the snapshot is serialized.
        summary = {k: (v() if callable(v) else v) for k, v in summary.items()}
        for _ in range(max_retries):
            self._load_meta()
            snap = self.snapshot
            new_epochs = dict(snap.epochs)
            if epoch is not None:
                new_epochs[epoch[0]] = max(int(new_epochs.get(epoch[0], -1)), epoch[1])
            new = {
                "version": snap.version + 1,
                "schema_id": schema_id,
                "summary": summary,
                "buckets": rebase(snap.buckets) if rebase is not None else buckets,
                "epochs": new_epochs,
            }
            tmp = os.path.join(meta, f".tmp-{uuid.uuid4().hex}.json")
            with open(tmp, "w") as f:
                json.dump(new, f)
            final = os.path.join(meta, "v%012d.json" % new["version"])
            try:
                os.link(tmp, final)
                os.unlink(tmp)
                self._load_meta()
                return new["version"]
            except FileExistsError:
                os.unlink(tmp)
                continue
        raise RuntimeError(f"commit contention: gave up after {max_retries} retries")

    def _ensure_schema(self, incoming: T.StructType) -> int:
        """Evolve table schema to accept ``incoming``; returns schema_id."""
        merged, changed = merge_schemas(self.schema, incoming)
        if not changed:
            return self.snapshot.schema_id
        # The BUCKET key column (key_columns[0], the only hash input) may
        # never change type: xxhash64 is type-sensitive, so widening it
        # would silently split each key's rows across two buckets (old
        # writes hashed narrow, new writes hashed wide). Other key
        # columns may widen freely (they only join sorts/windows, which
        # cast), and narrower *batches* are fine — upcast before
        # hashing/writing.
        k = self.key_columns[0] if self.key_columns else None
        if k is not None:
            cur = {f.name: f.dataType for f in self.schema.fields}
            new = {f.name: f.dataType for f in merged.fields}
            if k in cur and new.get(k) != cur[k]:
                raise SchemaEvolutionError(
                    f"key column {k!r} cannot change type "
                    f"({cur[k].simpleString()} -> {new[k].simpleString()}): "
                    "bucket hashing is type-sensitive"
                )
        new_id = max(self._schemas) + 1
        self._schemas[new_id] = merged
        meta = os.path.join(self.path, META_DIR)
        with open(os.path.join(meta, "table.json")) as f:
            tm = json.load(f)
        tm["schemas"][str(new_id)] = json.loads(merged.json())
        tmp = os.path.join(meta, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(tm, f)
        os.replace(tmp, os.path.join(meta, "table.json"))
        return new_id

    def append(
        self,
        df: DataFrame,
        summary: dict[str, Any] | None = None,
        epoch: tuple[str, int] | None = None,
    ) -> int:
        """Blind append (no key resolution) with schema evolution."""
        sid = self._ensure_schema(df.schema)
        aligned = align_to_schema(df, self._schemas[sid])
        new_buckets = self._write_data(aligned, sid)

        def rebase(fresh: dict[str, list[dict[str, Any]]]):
            merged = {k: list(v) for k, v in fresh.items()}
            for b, files in new_buckets.items():
                merged.setdefault(b, []).extend(files)
            return merged

        return self._commit(
            None, sid, {"operation": "append", **(summary or {})}, epoch=epoch,
            rebase=rebase,
        )

    def overwrite(
        self,
        df: DataFrame,
        summary: dict[str, Any] | None = None,
        epoch: tuple[str, int] | None = None,
    ) -> int:
        """Replace the whole table contents (REPLACE strategy,
        reference:src/etl_framework/plugins/loaders/sql_loader.py:191-203)."""
        sid = self._ensure_schema(df.schema)
        aligned = align_to_schema(df, self._schemas[sid])
        new_buckets = self._write_data(aligned, sid)
        return self._commit(
            new_buckets, sid, {"operation": "overwrite", **(summary or {})}, epoch=epoch
        )

    def merge(
        self,
        source: DataFrame,
        resolve,
        evolve_schema: T.StructType | None = None,
        summary: dict[str, Any] | None = None,
        epoch: tuple[str, int] | None = None,
        touched: list[int] | None = None,
    ) -> int:
        """Copy-on-write MERGE: read only the buckets ``source`` touches,
        apply ``resolve(target_subset, source) -> new_subset``, rewrite
        those buckets, carry every other bucket forward by reference.

        ``resolve`` owns the row semantics (LWW upsert, delete handling);
        this method owns IO minimization + atomic publication. Iceberg
        equivalent: ``MERGE INTO t USING s ON keys WHEN MATCHED ... WHEN
        NOT MATCHED ...``.

        ``evolve_schema``: the *stored-shape* schema the source implies
        (source itself may be CDC-enveloped and wider than the table);
        defaults to ``source.schema``.
        """
        sid = self._ensure_schema(evolve_schema or source.schema)
        current = self._schemas[sid]

        if touched is None:
            touched = self.touched_buckets(source)
        target_subset = align_to_schema(self.read(buckets=touched), current)

        resolved = resolve(target_subset, source)
        aligned = align_to_schema(resolved, current, keep=["_bucket"])

        new_buckets = self._write_data(aligned, sid)
        touched_set = set(touched)

        def rebase(fresh: dict[str, list[dict[str, Any]]]):
            merged = {
                b: list(files)
                for b, files in fresh.items()
                if int(b) not in touched_set
            }
            for b, files in new_buckets.items():
                merged.setdefault(b, []).extend(files)
            return merged

        return self._commit(
            None,
            sid,
            {"operation": "merge", "touched_buckets": touched, **(summary or {})},
            epoch=epoch,
            rebase=rebase,
        )

    def file_stats(self) -> dict[str, Any]:
        """Files-per-bucket distribution (maintenance signal)."""
        counts = {b: len(fs) for b, fs in self.snapshot.buckets.items()}
        return {
            "n_buckets_with_data": len(counts),
            "total_files": sum(counts.values()),
            "max_files_per_bucket": max(counts.values(), default=0),
        }

    def compact(
        self,
        buckets: list[int] | None = None,
        min_files: int = 2,
        summary: dict[str, Any] | None = None,
    ) -> int:
        """Rewrite fragmented buckets into one sorted file set each.

        APPEND-heavy usage accumulates files per bucket (every append
        extends the bucket's file list); at scale many small files slow
        every subsequent scan and merge. Compaction reads only buckets
        with >= ``min_files`` files, rewrites them key-sorted, and
        carries every other bucket forward by reference — same
        copy-on-write shape as merge, so it can run between ingest
        epochs without blocking readers (old snapshots stay readable).
        """
        snap = self.snapshot
        frag = [
            int(b)
            for b, fs in snap.buckets.items()
            if len(fs) >= min_files and (buckets is None or int(b) in set(buckets))
        ]
        if not frag:
            return snap.version
        sid = snap.schema_id
        data = align_to_schema(self.read(buckets=frag), self._schemas[sid])
        new_buckets = self._write_data(data, sid)
        frag_set = set(frag)

        def rebase(fresh: dict[str, list[dict[str, Any]]]):
            # A concurrent merge may have REWRITTEN a fragged bucket after
            # we read it — compacting over it would resurrect stale rows.
            # Keep the fresh version for any bucket whose file list moved,
            # and publish compacted files ONLY for buckets proven
            # unchanged (a bucket deleted concurrently must stay deleted,
            # not be re-added from pre-delete compacted data).
            merged = {}
            safe = set()
            for b, fs in fresh.items():
                if int(b) in frag_set and fs == snap.buckets.get(b):
                    safe.add(b)
                    continue  # replace with compacted files below
                merged[b] = list(fs)
            for b, fs in new_buckets.items():
                if b in safe:
                    merged[b] = list(fs)
            return merged

        return self._commit(
            None,
            sid,
            {"operation": "compact", "buckets": frag, **(summary or {})},
            rebase=rebase,
        )

    def delete_where(self, condition, summary: dict[str, Any] | None = None) -> int:
        """Delete rows matching ``condition``, rewriting ONLY the buckets
        that contain matching rows.

        Two passes, both delta-proportional at scale:

        1. a column-pruned scan (key + condition columns only) finds the
           bucket ids with matches — GC'ing a handful of tombstones in a
           100 TB table reads two columns and rewrites a few buckets, not
           the table;
        2. those buckets are re-read in full, filtered, and rewritten;
           every other bucket is carried forward by reference at commit.

        Concurrency: the rebase carries forward a concurrent writer's
        commits to untouched buckets; if a TOUCHED bucket's file list
        moved between our read and the commit, ``CommitConflict`` is
        raised (failing loudly beats publishing a pre-read view that
        would drop the other writer's files)."""
        snap = self.snapshot
        sid = snap.schema_id
        key = self.key_columns[0]
        kcol = F.col(key).cast(self.schema[key].dataType)
        hit = (
            self.read()
            .where(condition)
            .select(bucket_expr(kcol, self.n_buckets).alias("b"))
            .distinct()
            .collect()
        )
        touched = sorted(r["b"] for r in hit)
        if not touched:
            return snap.version
        read_view = {str(b): list(snap.buckets.get(str(b), [])) for b in touched}
        kept = self.read(buckets=touched).where(~condition)
        new_buckets = self._write_data(kept, sid)
        touched_set = set(read_view)

        def rebase(fresh: dict[str, list[dict[str, Any]]]):
            for b in touched_set:
                if fresh.get(b, []) != read_view[b]:
                    raise CommitConflict(
                        f"bucket {b} rewritten concurrently during delete_where"
                    )
            merged = {
                b: list(fs) for b, fs in fresh.items() if b not in touched_set
            }
            for b, fs in new_buckets.items():
                merged.setdefault(b, []).extend(fs)
            return merged

        return self._commit(
            None,
            sid,
            {"operation": "delete", "touched_buckets": touched, **(summary or {})},
            rebase=rebase,
        )
