"""Manifest commit-cost bench: sharded vs inline at growing table size.

Isolates the METADATA layer (no Spark jobs): populates a table's bucket
map with N live buckets x 3 files via one overwrite delta, then times
single-bucket replace commits — the shape of a steady-state CDC
micro-batch touching one bucket. The claim under test (VERDICT round 1,
item 6): sharded commit cost is O(touched shards) and stays FLAT as the
table grows, while the inline manifest rewrites the whole bucket map
every commit.

Usage: python scripts/bench_manifest.py  -> one JSON line on stdout.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import types as T

from etl_framework_spark.lakehouse.table import BucketDelta, LakeTable

SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])
SIZES = [100, 1000, 5000, 10_000]
COMMITS = 60


def fake_entries(bucket: int, n_files: int = 3, sid: int = 0):
    return [
        {"path": f"data/fake/{bucket}-{i}.parquet", "schema_id": sid}
        for i in range(n_files)
    ]


def bench(spark, n_buckets: int, shard_size: int | None) -> float:
    tmp = tempfile.mkdtemp(prefix="bench_manifest_")
    try:
        t = LakeTable.create(
            spark,
            f"{tmp}/t",
            SCHEMA,
            key_columns=["k"],
            n_buckets=n_buckets,
            manifest_shard_size=shard_size,
        )
        t._commit(
            BucketDelta(
                "overwrite", {str(b): fake_entries(b) for b in range(n_buckets)}
            ),
            0,
            {"operation": "seed"},
        )
        t0 = time.perf_counter()
        for i in range(COMMITS):
            b = str((i * 37) % n_buckets)
            t._commit(
                BucketDelta("replace", {b: fake_entries(int(b), n_files=3)}),
                0,
                {"operation": "merge"},
            )
        return (time.perf_counter() - t0) / COMMITS * 1000.0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    # LakeTable.create needs no SparkSession until data IO; pass None.
    out = {"commit_ms": {}, "commits_per_point": COMMITS}
    for n in SIZES:
        inline = bench(None, n, shard_size=0)
        sharded = bench(None, n, shard_size=max(1, n // 64))
        out["commit_ms"][str(n)] = {
            "inline": round(inline, 3),
            "sharded": round(sharded, 3),
        }
    first = out["commit_ms"][str(SIZES[0])]["sharded"]
    last = out["commit_ms"][str(SIZES[-1])]["sharded"]
    out["sharded_growth_ratio"] = round(last / first, 2)
    out["inline_growth_ratio"] = round(
        out["commit_ms"][str(SIZES[-1])]["inline"]
        / out["commit_ms"][str(SIZES[0])]["inline"],
        2,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
