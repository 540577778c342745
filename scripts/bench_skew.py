"""Skew study: CDC apply on a Zipf-extreme change log (one conversation
carries ~30% of all events), unsalted vs auto-salted.

The north rule demands salted repartitioning for hot-conversation skew.
The bucketed resolver buckets on conv_id, so a hot conversation funnels
into ONE bucket; with the static default key salt that bucket's sort
serializes into a few straggler tasks. ``apply_changes``'s AUTO mode
(``detect_skew``) sizes the within-bucket key salt from a sampled key
histogram instead. This script measures both configurations on the same
log — wall seconds AND the task-time distribution of the heaviest stage
(via the Spark UI REST API): the unsalted run shows a long tail
(max >> p50), the auto run flattens it.

Writes BENCH/skew.json. Usage: python scripts/bench_skew.py [n_events]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_JOB = r"""
import json, sys, time, urllib.request
sys.path.insert(0, {repo!r})
from etl_framework_spark.session import get_spark
from etl_framework_spark.cdc import apply_changes
from etl_framework_spark.lakehouse import LakeTable
from etl_framework_spark.schemas import CHANGE_SCHEMA, KEY_COLUMNS
import pyspark.sql.types as T
import shutil as _sh

salt = {salt!r}
# the UI is off by default (session.py); this study reads task-time
# distributions from its REST API, so enable it for the run
spark = get_spark(app_name="skew", master="local[{cpus}]",
                  shuffle_partitions={shuffle},
                  extra_conf={{"spark.ui.enabled": "true",
                               "spark.ui.showConsoleProgress": "false"}})
sc = spark.sparkContext
changes = spark.read.schema(CHANGE_SCHEMA).parquet({log_dir!r})
n = changes.count()

stored = [f for f in CHANGE_SCHEMA.fields if f.name not in ("op", "lsn")]
schema = T.StructType(stored)
table_path = {table_path!r}


def rest(path):
    url = f"{{sc.uiWebUrl}}/api/v1/applications/{{sc.applicationId}}{{path}}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def stage_stats(min_stage_id):
    # max/p50 executorRunTime of the heaviest post-warmup stages
    stages = [s for s in rest("/stages?status=complete")
              if s["stageId"] >= min_stage_id and s["numCompleteTasks"] > 1]
    if not stages:
        return {{}}
    top = sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:3]
    out = []
    for s in top:
        q = rest(f"/stages/{{s['stageId']}}/0/taskSummary?quantiles=0.0,0.5,0.95,1.0")
        rt = q.get("executorRunTime", [0, 0, 0, 0])
        out.append({{
            "stage": s["stageId"], "name": s["name"].split()[0],
            "tasks": s["numCompleteTasks"],
            "task_ms_p50": rt[1], "task_ms_p95": rt[2], "task_ms_max": rt[3],
            "straggler_ratio": round(rt[3] / max(rt[1], 1.0), 2),
        }})
    return {{"stages": out, "worst_straggler_ratio": max(o["straggler_ratio"] for o in out)}}


# warm-up on a slice (JIT/codegen; daemons run warm)
_sh.rmtree(table_path, ignore_errors=True)
w = LakeTable.create(spark, table_path + "_w", schema=schema,
                     key_columns=KEY_COLUMNS, n_buckets={buckets})
apply_changes(w, changes.limit(max(n // 10, 1)), stream_id="w", epoch_id=0,
              salt_partitions=salt)
_sh.rmtree(table_path + "_w", ignore_errors=True)

times, stats, metrics = [], {{}}, {{}}
for trial in range({trials}):
    _sh.rmtree(table_path, ignore_errors=True)
    table = LakeTable.create(spark, table_path, schema=schema,
                             key_columns=KEY_COLUMNS, n_buckets={buckets})
    before = max((s["stageId"] for s in rest("/stages")), default=-1) + 1
    t0 = time.perf_counter()
    apply_changes(table, changes, stream_id="skew", epoch_id=0,
                  salt_partitions=salt)
    dt = time.perf_counter() - t0
    if not times or dt < min(times):
        stats = stage_stats(before)
        metrics = table.refresh().snapshot.summary.get("metrics", {{}})
    times.append(dt)
rows = table.refresh().current().count()
_sh.rmtree(table_path, ignore_errors=True)
best = min(times)
print(json.dumps({{"salt_mode": "auto" if salt is None else salt,
                  "seconds": round(best, 2),
                  "all_seconds": [round(x, 2) for x in times],
                  "events": n, "events_per_sec": round(n / best),
                  "final_rows": rows, "apply_metrics": metrics,
                  "task_stats": stats}}))
spark.stop()
"""


def run_config(salt, log_dir, table_path, cpus=16, buckets=64, trials=3):
    code = _JOB.format(
        repo=str(REPO), salt=salt, cpus=cpus, shuffle=4 * cpus,
        log_dir=log_dir, table_path=table_path, buckets=buckets, trials=trials,
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600, cwd=str(REPO),
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"skew run salt={salt} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.30
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="skew_", dir=base)
    log_dir = os.path.join(tmp, "log")
    try:
        # Zipf-extreme: ONE conversation carries hot_frac of all events.
        # Note the regimes: on this 16-core box a hot group only becomes
        # the wall-clock critical path when hot_frac/base_salt exceeds
        # the per-core share (1/16); a real 1000-executor cluster hits
        # that regime at hot_frac ~0.4% already, so high hot_frac here
        # EMULATES cluster conditions, and the task-time distribution is
        # the transferable evidence either way.
        gen = (
            "import sys; sys.path.insert(0, %r)\n"
            "from etl_framework_spark.session import get_spark\n"
            "from etl_framework_spark.datagen import gen_changes\n"
            "s = get_spark(app_name='gen', master='local[32]')\n"
            "gen_changes(s, %d, n_convs=%d, hot_frac=%.3f, n_hot=1)"
            ".write.parquet(%r, mode='overwrite')\n"
            "s.stop()\n"
            % (str(REPO), n_events, max(n_events // 200, 100), hot_frac, log_dir)
        )
        subprocess.run([sys.executable, "-c", gen], check=True, timeout=1800,
                       cwd=str(REPO), capture_output=True, text=True)
        results = {}
        for name, salt in [("unsalted", 0), ("auto", None)]:
            r = run_config(salt, log_dir, os.path.join(tmp, f"t_{name}"))
            results[name] = r
            ts = r.get("task_stats", {})
            print(
                f"[skew] {name}: {r['seconds']}s ({r['events_per_sec']:,} ev/s), "
                f"worst straggler ratio {ts.get('worst_straggler_ratio')}; "
                f"metrics {r.get('apply_metrics')}", file=sys.stderr,
            )
        assert results["unsalted"]["final_rows"] == results["auto"]["final_rows"]
        payload = {
            "n_events": n_events,
            "hot_profile": f"one conversation = {hot_frac:.0%} of events (n_hot=1)",
            "configs": results,
            "speedup_auto_vs_unsalted": round(
                results["unsalted"]["seconds"] / results["auto"]["seconds"], 2
            ),
        }
        bench_dir = REPO / "BENCH"
        bench_dir.mkdir(exist_ok=True)
        out_name = f"skew{'' if abs(hot_frac - 0.30) < 1e-9 else f'_{int(hot_frac * 100)}'}.json"
        (bench_dir / out_name).write_text(json.dumps(payload, indent=2))
        print(json.dumps(payload))
        return 0
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
