"""Per-bucket fold scoping: the read-side mirror of the O(batch) MoR
write (``split_fold_entries``).

A merge-on-read delta epoch that touches K of N buckets must only drag
THOSE buckets through the union+window fold; the other N-K buckets are
served base-only, with range-based file skipping still live. This
bench measures the claim with two arms carrying the SAME delta volume
on the SAME compacted base:

- ``spread``: deltas land in every bucket (the worst case — the fold
  covers the whole table, equivalent to the pre-scoping global fold);
- ``scoped``: deltas confined to a handful of conversations (few
  buckets) — the common shape of an incremental epoch at 100 TB, where
  one commit touches a sliver of the key space.

The spread-vs-scoped scan gap is the cost the global fold used to
charge EVERY read after ANY delta. Also probes that an ``_lsn`` bound
prunes clean-bucket files while deltas are unfolded elsewhere.

Usage: python scripts/bench_mor_scoped.py [base_events] [delta_events]
Writes BENCH/mor_scoped.json.
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


def _timed_scan(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _best(table, ranges=None, trials: int = 3) -> float:
    # warm-up then best-of-(trials-1), per the pinned noise protocol
    times = [_timed_scan(table.current(ranges=ranges)) for _ in range(trials)]
    return min(times[1:])


def _mk_base(spark, path: str, base_events: int):
    stored = [f for f in CHANGE_SCHEMA.fields if f.name not in ("op", "lsn")]
    table = LakeTable.create(
        spark,
        path,
        schema=T.StructType(stored),
        key_columns=KEY_COLUMNS,
        n_buckets=64,
        merge_policy="lww",
    )
    apply_changes(
        table,
        gen_changes(spark, base_events, n_convs=max(base_events // 200, 100)),
        stream_id="r",
        epoch_id=0,
    )
    table.compact(min_files=1)
    return table.refresh()


def main() -> int:
    base_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    delta_events = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark(app_name="bench-mor-scoped")
    tmp = tempfile.mkdtemp(prefix="bench_mor_scoped_")
    arms = {}
    try:
        for arm, n_convs in (("spread", max(base_events // 200, 100)), ("scoped", 8)):
            table = _mk_base(spark, f"{tmp}/{arm}", base_events)
            base_scan = _best(table)
            apply_changes(
                table,
                gen_changes(
                    spark,
                    delta_events,
                    n_convs=n_convs,
                    seed=101,
                    lsn_start=base_events + 1,
                ),
                stream_id="r",
                epoch_id=1,
            )
            table.refresh()
            st = table.file_stats()
            delta_scan = _best(table)
            # pruning probe: a bound no row satisfies — cost should
            # collapse to (delta buckets only), since clean buckets
            # keep file skipping while deltas are unfolded elsewhere
            pruned_scan = _best(table, ranges={"_lsn": (None, 0)})
            pruned_files = len(table.read(ranges={"_lsn": (None, 0)}).inputFiles())
            total_files = len(table.read().inputFiles())
            arms[arm] = {
                "delta_buckets": st["delta_buckets"],
                "delta_files": st["delta_files"],
                "base_scan_seconds": round(base_scan, 2),
                "delta_scan_seconds": round(delta_scan, 2),
                "pruned_scan_seconds": round(pruned_scan, 2),
                "files_read_pruned_probe": pruned_files,
                "files_read_full": total_files,
            }
            print(f"[mor-scoped] {arm}: {arms[arm]}", file=sys.stderr, flush=True)
        out = {
            "base_events": base_events,
            "delta_events": delta_events,
            "n_buckets": 64,
            "arms": arms,
            "note": (
                "same delta volume; spread touches every bucket (fold covers "
                "the table), scoped touches few (fold covers only those). The "
                "delta_scan gap is what the pre-scoping global fold charged "
                "every read after any delta."
            ),
        }
        print(json.dumps(out))
        (REPO / "BENCH" / "mor_scoped.json").write_text(json.dumps(out, indent=1))
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
