"""Quickstart: the full engine surface in one runnable script.

    python examples/quickstart.py

Walks the same ground as the reference's demo series (CSV ETL, mapping
programs, database load strategies, incremental updates —
reference:demo/01_basic_csv_etl.py..10_end_to_end_scenario.py) plus the
engine's own CDC/streaming/lakehouse features.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_framework_spark import (
    CHANGE_SCHEMA,
    KEY_COLUMNS,
    TRANSCRIPT_SCHEMA,
    LakeTable,
    apply_changes,
    get_spark,
)
from etl_framework_spark.datagen import gen_changes, write_change_log
from etl_framework_spark.operators import LoadStrategy, exact_dedup, knn_brute, load
from etl_framework_spark.streaming import run_to_completion
from etl_framework_spark.transforms import MappingProgram, encrypt_columns, decrypt_columns


def main() -> int:
    spark = get_spark(app_name="quickstart", master="local[4]", shuffle_partitions=8)
    work = Path(tempfile.mkdtemp(prefix="quickstart_"))
    stored = T.StructType(TRANSCRIPT_SCHEMA.fields)

    print("== 1. batch CDC apply (LWW upsert into a LakeTable) ==")
    table = LakeTable.create(
        spark, str(work / "transcripts"), schema=stored, key_columns=KEY_COLUMNS, n_buckets=8
    )
    apply_changes(table, gen_changes(spark, 20_000, seed=1), stream_id="qs", epoch_id=0)
    table.refresh()
    print(f"   version={table.version} live_rows={table.current().count()}")

    print("== 2. exactly-once: re-delivering epoch 0 is a no-op ==")
    result = apply_changes(table, gen_changes(spark, 500, seed=2), stream_id="qs", epoch_id=0)
    print(f"   re-delivery returned: {result} (None = skipped)")

    print("== 3. schema evolution mid-stream (adds tool_meta, widens turn_idx) ==")
    apply_changes(
        table,
        gen_changes(spark, 5_000, seed=3, lsn_start=50_000, evolved=True),
        stream_id="qs",
        epoch_id=1,
    )
    table.refresh()
    print(f"   columns now: {[f.name for f in table.schema.fields]}")

    print("== 4. streaming ingest with checkpoint resume ==")
    write_change_log(spark, str(work / "log"), 10_000, n_batches=5, seed=7)
    t2 = LakeTable.create(
        spark, str(work / "t2"), schema=stored, key_columns=KEY_COLUMNS, n_buckets=8
    )
    run_to_completion(
        spark, str(work / "t2"), str(work / "log"), str(work / "ckpt"), CHANGE_SCHEMA
    )
    t2 = LakeTable(spark, str(work / "t2"))
    print(f"   streamed to version={t2.version}, rows={t2.current().count()}")
    print(f"   lineage sample: {t2.snapshot.summary['lineage'][:2]}")

    print("== 5. load strategies (reference parity) ==")
    df = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0)], "id long, name string, v double"
    )
    load(spark, df, str(work / "lt"), LoadStrategy.REPLACE, key_columns=["id"])
    delta = spark.createDataFrame(
        [(2, "bob2", 21.0), (3, "carol", 30.0)], "id long, name string, v double"
    )
    load(spark, delta, str(work / "lt"), LoadStrategy.UPSERT, key_columns=["id"])
    print(f"   after upsert: {sorted((r['id'], r['name']) for r in LakeTable(spark, str(work / 'lt')).current().collect())}")

    print("== 6. JSON mapping program (config-as-query) ==")
    prog = MappingProgram.from_json(
        {
            "business_rules": {"rate": 1.19},
            "calculations": [
                {"name": "gross", "formula": "round(v * rate, 2)"},
                {"name": "flag", "value": "loaded"},
            ],
        }
    )
    prog.apply(LakeTable(spark, str(work / "lt")).current()).select(
        "id", "gross", "flag"
    ).show()

    print("== 7. column crypto (JVM-side AES) ==")
    enc = encrypt_columns(df, ["name"], key="k", mode="ECB")
    dec = decrypt_columns(enc, ["name"], key="k", mode="ECB")
    print(f"   roundtrip ok: {dec.orderBy('id').collect() == df.orderBy('id').collect()}")

    print("== 8. corpus ops: dedup + vector search ==")
    docs = spark.createDataFrame(
        [(0, "the same text"), (1, "the same text"), (2, "another doc")],
        "doc_id long, text string",
    )
    exact_dedup(docs).show()
    vecs = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    knn_brute(vecs, [1.0, 0.1, 0.0, 0.0], k=2).show()

    print("== 9. time travel + change feed ==")
    print(f"   history: {[h['summary'].get('operation') for h in table.history()]}")

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print("quickstart complete")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
