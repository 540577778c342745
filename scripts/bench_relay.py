"""Relay cost shape: steady-state sync is O(changed data), not O(table).

For each seed size on a ladder: seed a source table, take the initial
full sync (the O(table) bootstrap — the cost a naive re-copy pays
EVERY time), then apply a small fixed-size delta confined to a handful
of conversations and time the incremental sync. The delta sync's feed
is bucket-pruned on the source AND its merge touches only the buckets
the fed keys hash to on the target, so as the table grows the
bootstrap cost grows with it while the delta sync stays flat — that
divergence is the evidence.

Writes BENCH/relay.json.

Usage: python scripts/bench_relay.py [delta_events] [seed_events...]
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


def one_rung(spark, stored, seed_events: int, delta_events: int) -> dict:
    tmp = tempfile.mkdtemp(prefix="bench_relay_")
    src = LakeTable.create(spark, f"{tmp}/src", schema=stored,
                           key_columns=KEY_COLUMNS, n_buckets=64)
    dst = LakeTable.create(spark, f"{tmp}/dst", schema=stored,
                           key_columns=KEY_COLUMNS, n_buckets=64)

    # wide keyspace: the seed materializes millions of distinct rows
    apply_changes(
        src, gen_changes(spark, seed_events, n_convs=200_000, seed=1),
        stream_id="s", epoch_id=0,
    )
    src_rows = src.current().count()

    t0 = time.perf_counter()
    sync_once(src, dst)
    bootstrap_s = time.perf_counter() - t0
    assert dst.current().count() == src_rows

    # delta confined to 8 conversations -> at most 8 target buckets.
    # gen_changes stamps ts from the batch-local index, so a follow-up
    # batch would lose LWW to the seeded winners; lift its event time
    # past the seed's range to model a fresh binlog tail.
    delta = gen_changes(spark, delta_events, n_convs=8, n_hot=1,
                        seed=2, lsn_start=seed_events + 1)
    delta = delta.withColumn(
        "ts",
        F.timestamp_seconds(F.unix_timestamp("ts") + F.lit(seed_events)),
    )
    apply_changes(src, delta, stream_id="s", epoch_id=1)
    feed_rows = src.changes_between(src.version - 1, src.version).count()

    t0 = time.perf_counter()
    sync_once(src, dst)
    delta_s = time.perf_counter() - t0
    s = src.current().select("conv_id", "turn_idx", "text", "_lsn")
    d = dst.current().select("conv_id", "turn_idx", "text", "_lsn")
    # symmetric: missing rows AND stale/extra replica rows both count
    diverged = s.exceptAll(d).count() + d.exceptAll(s).count()
    assert diverged == 0, f"replica diverged: {diverged} rows"
    assert feed_rows > 0, "delta produced no state change — rung is vacuous"

    relay_commits = [h for h in dst.history()
                     if h.get("summary", {}).get("operation") == "relay"]
    touched = relay_commits[-1]["summary"].get("touched_buckets")
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "seed_events": seed_events,
        "src_rows": src_rows,
        "bootstrap_sync_s": round(bootstrap_s, 2),
        "delta_sync_s": round(delta_s, 2),
        "delta_feed_rows": feed_rows,
        "delta_touched_buckets": (
            len(touched) if isinstance(touched, list) else touched
        ),
    }


def main() -> None:
    delta_events = int(sys.argv[1]) if len(sys.argv) > 1 else 80_000
    seeds = [int(a) for a in sys.argv[2:]] or [1_000_000, 4_000_000, 16_000_000]

    spark = get_spark(app_name="bench-relay", master="local[32]",
                      shuffle_partitions=64)
    stored = T.StructType(TRANSCRIPT_SCHEMA.fields + [
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ])
    # discarded warm-up rung: the first job batch of a session pays
    # JIT/codegen/heap-growth costs that would poison the smallest rung
    one_rung(spark, stored, 200_000, delta_events)
    rungs = []
    for seed_events in seeds:
        r = one_rung(spark, stored, seed_events, delta_events)
        print(f"[relay] seed {seed_events:,}: bootstrap {r['bootstrap_sync_s']}s, "
              f"delta {r['delta_sync_s']}s ({r['delta_feed_rows']} keys, "
              f"{r['delta_touched_buckets']}/64 buckets)", file=sys.stderr)
        rungs.append(r)

    out = {
        "delta_events": delta_events,
        "n_buckets": 64,
        "rungs": rungs,
        "bootstrap_growth": round(
            rungs[-1]["bootstrap_sync_s"] / rungs[0]["bootstrap_sync_s"], 2
        ),
        "delta_growth": round(
            rungs[-1]["delta_sync_s"] / rungs[0]["delta_sync_s"], 2
        ),
        "data_growth": round(rungs[-1]["src_rows"] / rungs[0]["src_rows"], 2),
    }
    print(json.dumps(out))
    (REPO / "BENCH" / "relay.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
