"""Benchmark harness (driver contract).

Runs the engine's headline workload at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line on stdout:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...,
     "query_stats": {"q1": {"median": s, "best": s, "n": k, "spread": r}}}

Protocol (pinned round 4): each operator query runs
``$SPARK_GRAFT_BENCH_TRIALS`` (default 3) warm trials; the recorded
``queries[name]`` scalar is the BEST trial (steady-state capability on a
VM with ~2x run-to-run noise — same methodology as BENCH/scaling.json),
and ``query_stats`` keeps median/best/n/spread so cross-round deltas can
be read against measured variance instead of adjudicated as noise.
``spread`` = (max-min)/median of the trials.

Two workload families:

1. **cdc_apply** — the engine's reason to exist: generate a deterministic
   change log (volume scaled to sf), apply it end-to-end (LWW dedupe +
   bucket-pruned copy-on-write merge) into a fresh LakeTable. This is
   the number BENCH/BASELINE.md's scaling study tracks (events/sec to
   stderr; wall seconds in the JSON).
2. **operator queries** — representative SURVEY.md §2 coverage (scan/
   filter/agg/join/window/dedup/knn) from ``__spark_entry__.queries()``,
   each forced with a noop sink so measured time is full execution, not
   collect-to-driver.

All timing excludes SparkSession startup.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from etl_framework_spark.session import get_spark  # noqa: E402

#: headline operator queries (subset of queries() that exercises each
#: operator family: filter/project, agg, join, broadcast, window, LWW,
#: set-op, text/dedup, vector search).
HEADLINE = [
    "filter_project",
    "pricing_summary",
    "join_agg",
    "broadcast_lookup",
    "lww_latest_event",
    "rank_topk_per_group",
    "sessionize",
    "anti_join",
    "dedup_exact",
    "token_stats_by_source",
    "knn_cosine",
    "calc_program",
]

#: change events per unit sf (sf0.1 -> 2M events).
EVENTS_PER_SF = 20_000_000


def _force(df) -> int:
    """Fully execute a DataFrame without shipping rows to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _stats(times: list[float]) -> dict:
    """Pinned trial summary: best is THE recorded number; median/spread
    quantify this VM's run-to-run noise so round-over-round deltas can be
    judged against measured variance."""
    med = statistics.median(times)
    return {
        "median": round(med, 3),
        "best": round(min(times), 3),
        "n": len(times),
        "spread": round((max(times) - min(times)) / med, 3) if med > 0 else 0.0,
    }


def bench_cdc_apply(
    spark, n_events: int, n_buckets: int = 64, merge_policy: str | None = None
) -> tuple[list[float], int]:
    """End-to-end change application: gen -> parquet log -> LWW+merge.

    ``merge_policy="lww"`` measures the MERGE-ON-READ write path (delta
    append, no bucket rewrite) — the round-5 write-amplification lever;
    ``None`` keeps the copy-on-write path for round-over-round
    comparability."""
    from etl_framework_spark.cdc import apply_changes
    from etl_framework_spark.datagen import gen_changes
    from etl_framework_spark.lakehouse import LakeTable
    from etl_framework_spark.schemas import CHANGE_SCHEMA, KEY_COLUMNS

    tmp = tempfile.mkdtemp(prefix="bench_cdc_")
    try:
        log_dir = os.path.join(tmp, "log")
        # Materialize the log first so generation cost isn't measured.
        gen_changes(spark, n_events, n_convs=max(n_events // 200, 100)).write.parquet(
            log_dir, mode="overwrite"
        )
        stored = [f for f in CHANGE_SCHEMA.fields if f.name not in ("op", "lsn")]
        import pyspark.sql.types as T

        changes = spark.read.schema(CHANGE_SCHEMA).parquet(log_dir)
        applied = changes.count()  # forces a cheap scan; also the true count
        # untimed warm-up on a slice: JIT/codegen for the apply pipeline
        # (a production ingest daemon runs warm)
        warm = LakeTable.create(
            spark,
            os.path.join(tmp, "warm"),
            schema=T.StructType(stored),
            key_columns=KEY_COLUMNS,
            n_buckets=n_buckets,
            merge_policy=merge_policy,
        )
        apply_changes(warm, changes.limit(max(applied // 10, 1)), stream_id="w", epoch_id=0)
        # $SPARK_GRAFT_BENCH_TRIALS warm trials into fresh tables (same
        # knob as the headline queries, floor 2 so the spread stat is
        # defined): this VM shows ~2x run-to-run noise (methodology of
        # BENCH/scaling.json); the best warm trial is the steady-state
        # capability a long-lived ingest daemon actually delivers.
        n_trials = max(int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3")), 2)
        times = []
        for trial in range(n_trials):
            table = LakeTable.create(
                spark,
                os.path.join(tmp, f"table{trial}"),
                schema=T.StructType(stored),
                key_columns=KEY_COLUMNS,
                n_buckets=n_buckets,
                merge_policy=merge_policy,
            )
            t0 = time.perf_counter()
            apply_changes(table, changes, stream_id="bench", epoch_id=0)
            times.append(time.perf_counter() - t0)
        return times, applied
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1
    spark = get_spark(app_name="bench")

    queries: dict[str, float] = {}
    qs = entrymod.queries()
    # Untimed warm-up: one scan+agg exercises codegen/JIT and the parquet
    # footer cache so the FIRST measured query isn't charged ~1.5s of JVM
    # warm-up (timing policy: exclude startup costs; a production cluster
    # runs warm).
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "sum(l_extendedprice)", "count(*)"
    ).write.format("noop").mode("overwrite").save()
    trials = max(int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3")), 1)
    query_stats: dict[str, dict] = {}
    for name in HEADLINE:
        fn = qs[name]
        times = []
        for _ in range(trials):
            df = fn(spark, sf_dir)  # rebuilt per trial: no plan reuse
            t0 = time.perf_counter()
            _force(df)
            times.append(time.perf_counter() - t0)
        query_stats[name] = _stats(times)
        queries[name] = query_stats[name]["best"]
        print(
            f"[bench] {name}: best {queries[name]:.3f}s "
            f"(median {query_stats[name]['median']:.3f}s, n={trials}, "
            f"spread {query_stats[name]['spread']:.2f})",
            file=sys.stderr,
        )

    n_events = max(int(sf * EVENTS_PER_SF), 10_000)
    cdc_times, applied = bench_cdc_apply(spark, n_events)
    query_stats["cdc_apply"] = _stats(cdc_times)
    cdc_sec = query_stats["cdc_apply"]["best"]
    queries["cdc_apply"] = cdc_sec
    print(
        f"[bench] cdc_apply: {applied} events in {cdc_sec:.2f}s "
        f"= {applied / cdc_sec:,.0f} events/sec",
        file=sys.stderr,
    )

    # merge-on-read write path (round 5): same log, deltas instead of
    # bucket rewrites — the number that scales with BATCH size, not
    # bucket size, at 100 TB
    mor_times, mor_applied = bench_cdc_apply(spark, n_events, merge_policy="lww")
    query_stats["cdc_apply_mor"] = _stats(mor_times)
    mor_sec = query_stats["cdc_apply_mor"]["best"]
    queries["cdc_apply_mor"] = mor_sec
    print(
        f"[bench] cdc_apply_mor: {mor_applied} events in {mor_sec:.2f}s "
        f"= {mor_applied / mor_sec:,.0f} events/sec",
        file=sys.stderr,
    )

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "query_stats": query_stats,
                "sf": sf,
                "cdc_events_per_sec": round(applied / cdc_sec, 1),
                "cdc_mor_events_per_sec": round(mor_applied / mor_sec, 1),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
