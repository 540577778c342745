"""Sustained-ingest bench: 10^9 change events through epoch micro-batches.

The single-shot ladder (BENCH/ladder.json) stops at 10^8 events because
one batch's shuffle must fit the RAM-backed scratch. Production ingest
is not one giant batch — it is a stream of epoch batches applied to a
GROWING table, which is exactly what this bench measures: N batches of
``batch_events`` each (default 10 x 10^8 = 10^9 events total) applied
through ``apply_changes`` into one LakeTable, conv keys shared across
batches so every merge pays real copy-on-write against the accumulated
state (uniform keys touch ~all buckets — the worst case for rewrite
amplification).

Reports per-epoch seconds, aggregate events/sec, and final table rows.

``--mor [max_files]`` runs the same stream through a
``merge_policy="lww"`` merge-on-read table with the ingest daemon's
stats-driven maintenance loop (compact a bucket once it reaches
``max_files`` files, default 8) — the production shape for
delta-dominated ingest. Apply time and compaction time are reported
separately: apply is the latency-critical path, compaction is the
amortized background cost a daemon overlaps with the next epoch.

Usage: python scripts/bench_sustained.py [total_events] [n_batches] [--mor [max_files]]
Writes BENCH/sustained.json (CoW) or BENCH/sustained_mor.json (--mor).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.types as T  # noqa: E402

from etl_framework_spark.cdc import apply_changes  # noqa: E402
from etl_framework_spark.datagen import gen_changes  # noqa: E402
from etl_framework_spark.lakehouse import LakeTable  # noqa: E402
from etl_framework_spark.schemas import CHANGE_SCHEMA, KEY_COLUMNS  # noqa: E402
from etl_framework_spark.session import get_spark  # noqa: E402


def main() -> int:
    argv = list(sys.argv[1:])
    mor = False
    max_files = 8
    if "--mor" in argv:
        i = argv.index("--mor")
        argv.pop(i)
        if i < len(argv) and argv[i].isdigit():
            max_files = int(argv.pop(i))
        mor = True
    total = int(argv[0]) if len(argv) > 0 else 1_000_000_000
    n_batches = int(argv[1]) if len(argv) > 1 else 10
    per = total // n_batches
    spark = get_spark(app_name="bench-sustained")

    tmp = tempfile.mkdtemp(prefix="bench_sustained_")
    stored = [f for f in CHANGE_SCHEMA.fields if f.name not in ("op", "lsn")]
    table = LakeTable.create(
        spark,
        os.path.join(tmp, "t"),
        schema=T.StructType(stored),
        key_columns=KEY_COLUMNS,
        n_buckets=64,
        merge_policy="lww" if mor else None,
    )
    epochs = []
    compactions = []  # (epoch, seconds, max_files_before)
    t_all = time.perf_counter()
    try:
        for b in range(n_batches):
            # generation is inline (pure codegen exprs, no shuffle of its
            # own) — a 10^9-event log does not fit RAM-backed storage, and
            # materializing it on the virtio disk would bench the disk.
            changes = gen_changes(
                spark,
                per,
                n_convs=max(per // 200, 100),
                seed=1000 + b,
                lsn_start=1 + b * per,
            )
            t0 = time.perf_counter()
            apply_changes(table, changes, stream_id="sustained", epoch_id=b)
            dt = time.perf_counter() - t0
            epochs.append(round(dt, 2))
            print(
                f"[sustained] epoch {b}: {per:,} events in {dt:.1f}s "
                f"= {per / dt:,.0f} ev/s",
                file=sys.stderr,
                flush=True,
            )
            if mor:
                # the ingest daemon's stats-driven maintenance: compact
                # only once a bucket's file count reaches the threshold,
                # so cold buckets are never churned (metadata-only check).
                st = table.file_stats()
                if st["max_files_per_bucket"] >= max_files:
                    t0 = time.perf_counter()
                    table.compact(min_files=max_files)
                    cdt = time.perf_counter() - t0
                    compactions.append(
                        {
                            "epoch": b,
                            "seconds": round(cdt, 2),
                            "max_files_before": st["max_files_per_bucket"],
                        }
                    )
                    print(
                        f"[sustained] compact after epoch {b}: {cdt:.1f}s "
                        f"(max files/bucket was {st['max_files_per_bucket']})",
                        file=sys.stderr,
                        flush=True,
                    )
        wall = time.perf_counter() - t_all
        table.refresh()
        out = {
            "mode": "mor" if mor else "cow",
            "total_events": per * n_batches,
            "n_batches": n_batches,
            "batch_events": per,
            "epoch_seconds": epochs,
            "wall_seconds": round(wall, 1),
            "events_per_sec": round(per * n_batches / sum(epochs), 1),
            "final_rows": table.current().count(),
            "final_version": table.version,
            "file_stats": table.file_stats(),
        }
        if mor:
            out["maintenance_max_files"] = max_files
            out["compactions"] = compactions
            out["compaction_seconds_total"] = round(
                sum(c["seconds"] for c in compactions), 1
            )
        print(json.dumps(out))
        name = "sustained_mor.json" if mor else "sustained.json"
        (REPO / "BENCH" / name).write_text(json.dumps(out, indent=1))
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
