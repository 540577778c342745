"""Executor-process scaling study: N vs 4N executor JVMs.

Models the north rule's "N vs 4N executor clusters" more directly than
the thread ladder: each executor is a SEPARATE 4-core JVM with a private
heap/GC (as on a real cluster), working on the bucket-range shard a
binlog router / upstream shuffle would assign it. The two brackets:

- thread ladder (scripts/bench_scaling.py): all width shares one JVM —
  pessimistic (shared heap, GC, allocator).
- this study: separate JVMs, no network shuffle — optimistic by the
  network cost, pessimistic by the shared memory bus all 4 executors
  still sit on in this sandbox.

T(1 executor) = one 4-core JVM applying all 4 shards sequentially.
T(4 executors) = four concurrent 4-core JVMs, one shard each, writing
independent table shards (bucket ranges are disjoint, so the final
state is the union — exactly the cluster layout where each executor
owns a bucket range of the table).

    efficiency = T1 / (4 * T4_wall)

Usage: python scripts/bench_scaling_executors.py [sharded_log_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_JOB = r"""
import json, sys, time, shutil
sys.path.insert(0, {repo!r})
from etl_framework_spark.session import get_spark
from etl_framework_spark.cdc import apply_changes
from etl_framework_spark.lakehouse import LakeTable
from etl_framework_spark.schemas import CHANGE_SCHEMA, KEY_COLUMNS
import pyspark.sql.types as T

shards = {shards!r}
spark = get_spark(app_name="exec-{tag}", master="local[4]", shuffle_partitions=16)
stored = [f for f in CHANGE_SCHEMA.fields if f.name not in ("op", "lsn")]
# warm-up: JIT on a small slice of the first shard
warm = spark.read.schema(CHANGE_SCHEMA).parquet(shards[0]).limit(500_000)
shutil.rmtree("/dev/shm/exw_{tag}", ignore_errors=True)
tw = LakeTable.create(spark, "/dev/shm/exw_{tag}", T.StructType(stored), KEY_COLUMNS, n_buckets=16)
apply_changes(tw, warm, stream_id="w", epoch_id=0)
shutil.rmtree("/dev/shm/exw_{tag}", ignore_errors=True)

total_rows = 0
t0 = time.perf_counter()
for i, sh in enumerate(shards):
    ch = spark.read.schema(CHANGE_SCHEMA).parquet(sh)
    path = "/dev/shm/ex_{tag}_%d" % i
    shutil.rmtree(path, ignore_errors=True)
    tbl = LakeTable.create(spark, path, T.StructType(stored), KEY_COLUMNS, n_buckets=16)
    apply_changes(tbl, ch, stream_id="s", epoch_id=0)
    total_rows += tbl.refresh().current().count()
    shutil.rmtree(path, ignore_errors=True)
dt = time.perf_counter() - t0
print(json.dumps({"tag": "{tag}", "seconds": round(dt, 1), "rows": total_rows}))
spark.stop()
"""


def run(tag: str, shards: list[str]) -> dict:
    code = _JOB.replace("{repo!r}", repr(str(REPO))).replace(
        "{shards!r}", repr(shards)
    ).replace("{tag}", tag)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3000, cwd=str(REPO))
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise RuntimeError(f"executor run {tag} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    log = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/log64_sharded"
    shards = sorted(
        os.path.join(log, d) for d in os.listdir(log) if d.startswith("_shard=")
    )
    assert len(shards) == 4, shards

    one = run("one", shards)
    print(f"[executors] 1x local[4], all shards: {one['seconds']}s", file=sys.stderr)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = [pool.submit(run, f"p{i}", [sh]) for i, sh in enumerate(shards)]
        parts = [f.result() for f in futs]
    t4_wall = time.perf_counter() - t0
    rows4 = sum(p["rows"] for p in parts)
    print(f"[executors] 4x local[4], one shard each: wall {t4_wall:.1f}s "
          f"(per-exec {[p['seconds'] for p in parts]})", file=sys.stderr)
    assert rows4 == one["rows"], (rows4, one["rows"])

    # per-executor compute wall (excludes each JVM's ~10s startup, which
    # the sequential baseline pays only once): max of the four
    t4_compute = max(p["seconds"] for p in parts)
    eff_wall = one["seconds"] / (4 * t4_wall)
    eff_compute = one["seconds"] / (4 * t4_compute)
    payload = {
        "t1_seconds": one["seconds"],
        "t4_wall_seconds": round(t4_wall, 1),
        "t4_compute_seconds": t4_compute,
        "per_executor_seconds": [p["seconds"] for p in parts],
        "rows": one["rows"],
        "efficiency_wall": round(eff_wall, 3),
        "efficiency_compute": round(eff_compute, 3),
        "target": 0.8,
    }
    (REPO / "BENCH" / "scaling_executors.json").write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
