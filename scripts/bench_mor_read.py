"""Merge-on-read READ amplification: the honest flip side of the
write-amplification win (BENCH/relay_mor.json).

MoR appends deltas in O(batch) but every read folds base + unfolded
deltas through one window — so read cost grows with the number of
unfolded delta files per bucket until a compaction collapses them.
This bench measures that curve: a fixed base table, then K delta
epochs WITHOUT compaction, timing a full ``current()`` scan at each
rung. The knee of the curve is what ``start_ingest``'s stats-driven
``maintenance_max_files`` threshold is for: the sustained-ingest run
(BENCH/sustained_mor_r5.json) holds files/bucket <= 10, i.e. left of
the knee, for 148s of amortized compaction per 10^9 events.

Usage: python scripts/bench_mor_read.py [base_events] [epoch_events] [rungs...]
Writes BENCH/mor_read.json.
"""

from __future__ import annotations

import json
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


def _timed_scan(table) -> float:
    t0 = time.perf_counter()
    table.current().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    base_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    epoch_events = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    rungs = [int(r) for r in sys.argv[3:]] or [0, 4, 8, 16, 32, 64]
    spark = get_spark(app_name="bench-mor-read")

    tmp = tempfile.mkdtemp(prefix="bench_mor_read_")
    stored = [f for f in CHANGE_SCHEMA.fields if f.name not in ("op", "lsn")]
    table = LakeTable.create(
        spark,
        f"{tmp}/t",
        schema=T.StructType(stored),
        key_columns=KEY_COLUMNS,
        n_buckets=64,
        merge_policy="lww",
    )
    out_rungs = []
    try:
        # base state, then compact so rung 0 is a pure base scan
        apply_changes(
            table,
            gen_changes(spark, base_events, n_convs=max(base_events // 200, 100)),
            stream_id="r",
            epoch_id=0,
        )
        table.compact(min_files=1)
        table.refresh()

        applied = 0
        for rung in sorted(rungs):
            while applied < rung:
                apply_changes(
                    table,
                    gen_changes(
                        spark,
                        epoch_events,
                        n_convs=max(epoch_events // 200, 100),
                        seed=100 + applied,
                        lsn_start=base_events + applied * epoch_events + 1,
                    ),
                    stream_id="r",
                    epoch_id=applied + 1,
                )
                applied += 1
            table.refresh()
            st = table.file_stats()
            # warm-up then best-of-2 (documented VM noise)
            times = [_timed_scan(table) for _ in range(3)]
            sec = min(times[1:])
            out_rungs.append(
                {
                    "delta_epochs": rung,
                    "delta_files": st["delta_files"],
                    "max_delta_files_per_bucket": st["max_delta_files_per_bucket"],
                    "scan_seconds": round(sec, 2),
                    "all_trials": [round(x, 2) for x in times],
                }
            )
            print(
                f"[mor-read] {rung} epochs unfolded "
                f"({st['delta_files']} delta files): scan {sec:.2f}s",
                file=sys.stderr,
                flush=True,
            )
        # post-compaction control: cost returns to the base scan
        t0 = time.perf_counter()
        table.compact(min_files=1)
        compact_sec = time.perf_counter() - t0
        table.refresh()
        times = [_timed_scan(table) for _ in range(3)]
        out = {
            "base_events": base_events,
            "epoch_events": epoch_events,
            "final_rows": table.current().count(),
            "rungs": out_rungs,
            "compact_seconds": round(compact_sec, 2),
            "post_compact_scan_seconds": round(min(times[1:]), 2),
        }
        print(json.dumps(out))
        (REPO / "BENCH" / "mor_read.json").write_text(json.dumps(out, indent=1))
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
