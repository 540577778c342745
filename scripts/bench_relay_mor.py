"""Write-amplification: merge-on-read decouples delta-sync cost from
bucket size (round-5 VERDICT #1 evidence).

Setup per rung: seed N events into a source, bootstrap TWO replicas of
the same table — one copy-on-write, one ``merge_policy="replace"``
(merge-on-read) — then apply a TINY delta (fixed ~400 events in 4
conversations) at the source and sync both replicas. Record each sync's
wall time and the BYTES it wrote into the replica's data directory.

The copy-on-write replica must rewrite every touched bucket in full, so
its bytes-written grows with the bucket size (table size / bucket
count); the merge-on-read replica appends one delta commit whose size
tracks the DELTA, not the bucket — at 100 TB that is the difference
between a relay tick costing gigabytes and costing kilobytes.

Writes BENCH/relay_mor.json.

Usage: python scripts/bench_relay_mor.py [delta_events] [seed_events...]
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

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from etl_framework_spark.cdc import apply_changes, sync_once  # noqa: E402
from etl_framework_spark.datagen import gen_changes  # noqa: E402
from etl_framework_spark.lakehouse import LakeTable  # noqa: E402
from etl_framework_spark.schemas import (  # noqa: E402
    KEY_COLUMNS,
    TRANSCRIPT_SCHEMA,
)
from etl_framework_spark.session import get_spark  # noqa: E402

N_BUCKETS = 8  # deliberately FEW buckets -> each bucket is large


def _data_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(os.path.join(path, "data")):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def one_rung(
    spark, stored, seed_events: int, delta_events: int,
    src_policy: str | None = None,
) -> dict:
    tmp = tempfile.mkdtemp(prefix="bench_relay_mor_")
    src = LakeTable.create(spark, f"{tmp}/src", schema=stored,
                           key_columns=KEY_COLUMNS, n_buckets=64,
                           merge_policy=src_policy)
    replicas = {
        "cow": LakeTable.create(spark, f"{tmp}/cow", schema=stored,
                                key_columns=KEY_COLUMNS, n_buckets=N_BUCKETS),
        "mor": LakeTable.create(spark, f"{tmp}/mor", schema=stored,
                                key_columns=KEY_COLUMNS, n_buckets=N_BUCKETS,
                                merge_policy="replace"),
    }
    apply_changes(
        src, gen_changes(spark, seed_events, n_convs=200_000, seed=1),
        stream_id="s", epoch_id=0,
    )
    for t in replicas.values():
        sync_once(src, t)
    src_rows = src.current().count()

    # tiny delta confined to 4 conversations (<= 4 target buckets)
    delta = gen_changes(spark, delta_events, n_convs=4, n_hot=1,
                        seed=2, lsn_start=seed_events + 1)
    delta = delta.withColumn(
        "ts", F.timestamp_seconds(F.unix_timestamp("ts") + F.lit(seed_events))
    )
    t0 = time.perf_counter()
    apply_changes(src, delta, stream_id="s", epoch_id=1)
    src_apply_s = time.perf_counter() - t0

    out: dict = {
        "seed_events": seed_events,
        "src_rows": src_rows,
        "src_policy": src_policy or "cow",
        "src_delta_apply_s": round(src_apply_s, 2),
    }
    for name, t in replicas.items():
        before = _data_bytes(t.path)
        t0 = time.perf_counter()
        sync_once(src, t)
        secs = time.perf_counter() - t0
        written = _data_bytes(t.path) - before
        s = src.current().select("conv_id", "turn_idx", "text", "_lsn")
        d = t.refresh().current().select("conv_id", "turn_idx", "text", "_lsn")
        diverged = s.exceptAll(d).count() + d.exceptAll(s).count()
        assert diverged == 0, f"{name} replica diverged: {diverged} rows"
        out[f"{name}_delta_sync_s"] = round(secs, 2)
        out[f"{name}_bytes_written"] = written
    out["write_amplification_cow_over_mor"] = round(
        out["cow_bytes_written"] / max(out["mor_bytes_written"], 1), 1
    )
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    delta_events = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    seeds = [int(a) for a in sys.argv[2:]] or [1_000_000, 4_000_000]

    spark = get_spark(app_name="bench-relay-mor", master="local[32]",
                      shuffle_partitions=64)
    stored = T.StructType(TRANSCRIPT_SCHEMA.fields + [
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ])
    one_rung(spark, stored, 100_000, delta_events)  # discarded warm-up
    rungs = []
    for seed in seeds:
        r = one_rung(spark, stored, seed, delta_events)
        print(
            f"[relay-mor] seed {seed:,}: cow {r['cow_delta_sync_s']}s/"
            f"{r['cow_bytes_written']:,}B vs mor {r['mor_delta_sync_s']}s/"
            f"{r['mor_bytes_written']:,}B "
            f"(amplification {r['write_amplification_cow_over_mor']}x)",
            file=sys.stderr,
        )
        rungs.append(r)
    # the full O(delta) pipeline: MoR source (O(batch) delta ingest) ->
    # key-scoped feed (delta-only interval -> single-pass diff) ->
    # replicas. Same biggest seed, so the sync walls are comparable to
    # the CoW-source rung above, whose rewrite interval forces the
    # feed's full-state diff.
    e2e = one_rung(spark, stored, seeds[-1], delta_events, src_policy="lww")
    print(
        f"[relay-mor] mor-source seed {seeds[-1]:,}: src apply "
        f"{e2e['src_delta_apply_s']}s, cow sync {e2e['cow_delta_sync_s']}s, "
        f"mor sync {e2e['mor_delta_sync_s']}s/"
        f"{e2e['mor_bytes_written']:,}B",
        file=sys.stderr,
    )
    out = {
        "n_buckets": N_BUCKETS,
        "delta_events": delta_events,
        "rungs": rungs,
        "mor_source_rung": e2e,
        # the decoupling claim in two numbers: growing the table grows
        # CoW's per-sync write bytes ~proportionally; MoR's stay flat
        "cow_bytes_growth": round(
            rungs[-1]["cow_bytes_written"] / max(rungs[0]["cow_bytes_written"], 1), 2
        ),
        "mor_bytes_growth": round(
            rungs[-1]["mor_bytes_written"] / max(rungs[0]["mor_bytes_written"], 1), 2
        ),
    }
    print(json.dumps(out))
    (REPO / "BENCH" / "relay_mor.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
