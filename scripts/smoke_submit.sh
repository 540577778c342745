#!/usr/bin/env bash
# North-rule deployment evidence: run the ingest job via a REAL
# `spark-submit --py-files <zip>` from a neutral directory, so the
# etl_framework_spark package can only resolve from the shipped zip
# (exactly the layout a multi-executor cluster submit uses), then
# cross-check the resulting table state against an in-process library
# run of the same change batch.
#
# Usage: bash scripts/smoke_submit.sh [n_events]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
N="${1:-20000}"
WORK="$(mktemp -d /tmp/smoke_submit.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT

cd "$REPO"
zip -qr "$WORK/etl_framework_spark.zip" etl_framework_spark
cp scripts/ingest_job.py "$WORK/"

python - "$WORK" "$N" <<'EOF'
import sys
work, n = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, "/root/repo")
from etl_framework_spark import get_spark
from etl_framework_spark.datagen import gen_changes
spark = get_spark(master="local[4]", shuffle_partitions=8)
gen_changes(spark, n, seed=7).write.mode("overwrite").parquet(f"{work}/log/batch0")
spark.stop()
EOF

cd "$WORK"
spark-submit --py-files etl_framework_spark.zip ingest_job.py \
    --table "$WORK/t" --changes "$WORK/log" --checkpoint "$WORK/ck" \
    --create --master 'local[8]' 2>&1 | grep -E "table version" | tee submit.out

python - "$WORK" "$N" <<'EOF'
import sys
work, n = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, "/root/repo")
from pyspark.sql import types as T
from etl_framework_spark import get_spark
from etl_framework_spark.schemas import TRANSCRIPT_SCHEMA, KEY_COLUMNS
from etl_framework_spark.lakehouse import LakeTable
from etl_framework_spark.cdc import apply_changes
from etl_framework_spark.datagen import gen_changes

spark = get_spark(master="local[4]", shuffle_partitions=8)
stored = T.StructType(TRANSCRIPT_SCHEMA.fields + [
    T.StructField("_lsn", T.LongType(), True),
    T.StructField("_deleted", T.BooleanType(), True)])
ref = LakeTable.create(spark, f"{work}/ref", stored, KEY_COLUMNS, n_buckets=8)
apply_changes(ref, gen_changes(spark, n, seed=7), stream_id="ref", epoch_id=0)
want = ref.current().count()

got_table = LakeTable(spark, f"{work}/t")
got = got_table.current().count()
assert got == want, f"submit-path state diverged: {got} != {want}"
print(f"SMOKE_SUBMIT OK: {got} live rows, submit path == library path")
EOF
