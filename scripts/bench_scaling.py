"""Scaling-efficiency study: the same CDC apply job at N and 4N cores.

The north rule requires throughput scaling efficiency >= 0.8 between an
N-executor and a 4N-executor cluster. No real cluster exists in this
sandbox, so the evidence is the same job on the same input at
``local[8]`` vs ``local[32]`` (each in a fresh JVM/subprocess so heap
and codegen caches don't leak between runs):

    efficiency = (throughput_4N / throughput_N) / 4

Writes BENCH/BASELINE.md (human) + BENCH/scaling.json (machine).

Usage: python scripts/bench_scaling.py [n_events]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_JOB = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from etl_framework_spark.session import get_spark
from etl_framework_spark.cdc import apply_changes
from etl_framework_spark.lakehouse import LakeTable
from etl_framework_spark.schemas import CHANGE_SCHEMA, KEY_COLUMNS
import pyspark.sql.types as T

cpus = {cpus}
spark = get_spark(
    app_name=f"scaling-{cpus}",
    master=f"local[{cpus}]",
    shuffle_partitions={shuffle},
    extra_conf={{"spark.driver.memory": "16g"}},
)
changes = spark.read.schema(CHANGE_SCHEMA).parquet({log_dir!r})
n = changes.count()  # warm the scan/file listing outside the timed window

stored = [f for f in CHANGE_SCHEMA.fields if f.name not in ("op", "lsn")]
schema = T.StructType(stored)
table_path = {table_path!r}
import shutil as _sh
_sh.rmtree(table_path, ignore_errors=True)
table = LakeTable.create(spark, table_path, schema=schema,
                         key_columns=KEY_COLUMNS, n_buckets={buckets})
t0 = time.perf_counter()
apply_changes(table, changes, stream_id="scaling", epoch_id=0)
dt = time.perf_counter() - t0
rows = table.refresh().current().count()
print(json.dumps({{"cpus": cpus, "seconds": dt, "events": n,
                  "events_per_sec": n / dt, "final_rows": rows}}))
spark.stop()
"""


def run_once(cpus: int, log_dir: str, table_path: str, buckets: int) -> dict:
    code = _JOB.format(
        repo=str(REPO),
        cpus=cpus,
        shuffle=max(2 * cpus, 16),
        log_dir=log_dir,
        table_path=table_path,
        buckets=buckets,
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=str(REPO),
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"scaling run cpus={cpus} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    buckets = 64
    tmp = tempfile.mkdtemp(prefix="scaling_")
    log_dir = os.path.join(tmp, "log")
    try:
        # Generate the shared input once (its own JVM, not timed).
        gen = (
            "import sys; sys.path.insert(0, %r)\n"
            "from etl_framework_spark.session import get_spark\n"
            "from etl_framework_spark.datagen import gen_changes\n"
            "s = get_spark(app_name='gen', master='local[32]',\n"
            "              extra_conf={'spark.driver.memory': '16g'})\n"
            "gen_changes(s, %d, n_convs=%d).write.parquet(%r, mode='overwrite')\n"
            "s.stop()\n" % (str(REPO), n_events, max(n_events // 200, 100), log_dir)
        )
        subprocess.run(
            [sys.executable, "-c", gen], check=True, timeout=1800, cwd=str(REPO),
            capture_output=True, text=True,
        )
        results = {}
        for cpus in (8, 32):
            r = run_once(cpus, log_dir, os.path.join(tmp, f"table_{cpus}"), buckets)
            results[cpus] = r
            print(f"[scaling] local[{cpus}]: {r['events']} events in "
                  f"{r['seconds']:.1f}s = {r['events_per_sec']:,.0f} ev/s",
                  file=sys.stderr)
        speedup = results[32]["events_per_sec"] / results[8]["events_per_sec"]
        eff = speedup / 4.0
        assert results[8]["final_rows"] == results[32]["final_rows"], "row mismatch"

        bench_dir = REPO / "BENCH"
        bench_dir.mkdir(exist_ok=True)
        payload = {
            "n_events": n_events,
            "runs": results,
            "speedup_8_to_32": round(speedup, 3),
            "scaling_efficiency": round(eff, 3),
            "target": 0.8,
        }
        (bench_dir / "scaling.json").write_text(json.dumps(payload, indent=2))
        md = f"""# BENCH / scaling baseline

CDC apply end-to-end (read change log -> LWW dedupe -> bucket-pruned
copy-on-write merge commit), identical input at two parallelism levels.
Single machine stand-in for the N vs 4N executor-cluster criterion
(no real cluster in this sandbox); fresh JVM per run.

| config | events | seconds | events/sec | final rows |
| --- | --- | --- | --- | --- |
| local[8], shuffle=16 | {results[8]["events"]:,} | {results[8]["seconds"]:.1f} | {results[8]["events_per_sec"]:,.0f} | {results[8]["final_rows"]:,} |
| local[32], shuffle=64 | {results[32]["events"]:,} | {results[32]["seconds"]:.1f} | {results[32]["events_per_sec"]:,.0f} | {results[32]["final_rows"]:,} |

- speedup 8 -> 32 cores (4x resources): **{speedup:.2f}x**
- scaling efficiency (speedup / 4): **{eff:.2f}** (target >= 0.8)
- identical final table state at both sizes (row counts asserted equal;
  same deterministic LWW winners by construction).

Caveats: both runs share one machine's memory bandwidth and page cache,
which *understates* the efficiency a real 4N-node cluster would get
(a real cluster adds network shuffle but also 4x memory bandwidth and
4x IO). The job is shuffle+sort dominated (groupBy dedupe, bucket
repartition, parquet write), i.e. the same profile that governs cluster
scaling.
"""
        (bench_dir / "BASELINE.md").write_text(md)
        print(json.dumps(payload))
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
