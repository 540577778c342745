"""Streaming ingest: drain, replay-after-kill, crash-after-commit.

The north rule's resumability cases: restart from checkpoint mid-stream
with no duplicates and no loss.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from etl_framework_spark.cdc import apply_changes  # noqa: F401 (api surface)
from etl_framework_spark.datagen import write_change_log
from etl_framework_spark.lakehouse import LakeTable
from etl_framework_spark.schemas import CHANGE_SCHEMA, KEY_COLUMNS, TRANSCRIPT_SCHEMA
from etl_framework_spark.streaming import start_ingest

from tests.oracle import replay

STORED_SCHEMA = T.StructType(
    TRANSCRIPT_SCHEMA.fields
    + [
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ]
)


@pytest.fixture()
def setup(spark, tmp_path):
    change_dir = str(tmp_path / "changes")
    table_path = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    write_change_log(spark, change_dir, n_events=6000, n_batches=6, n_convs=60, seed=3)
    LakeTable.create(spark, table_path, STORED_SCHEMA, KEY_COLUMNS, n_buckets=8)
    all_pdf = spark.read.schema(CHANGE_SCHEMA).option("recursiveFileLookup", "true").parquet(
        change_dir
    ).toPandas()
    return change_dir, table_path, ckpt, all_pdf


def assert_matches_oracle(spark, table_path, all_pdf):
    expect = replay(all_pdf)
    got = (
        LakeTable(spark, table_path)
        .current()
        .drop("_deleted")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    assert len(got) == len(expect)
    pd.testing.assert_series_equal(
        got["text"], expect["text"].astype(got["text"].dtype), check_names=False
    )
    pd.testing.assert_series_equal(
        got["_lsn"], expect["_lsn"].astype(got["_lsn"].dtype), check_names=False
    )


def test_stream_drain_matches_oracle(spark, setup):
    change_dir, table_path, ckpt, all_pdf = setup
    q = start_ingest(spark, table_path, change_dir, ckpt, CHANGE_SCHEMA)
    q.awaitTermination()
    assert_matches_oracle(spark, table_path, all_pdf)


def test_replay_after_kill(spark, setup):
    """Crash the query mid-stream (after 2 applied batches), restart from
    the checkpoint, assert no loss and no dupes."""
    change_dir, table_path, ckpt, all_pdf = setup
    applied: list[int] = []

    def crash_after_two(epoch: int):
        applied.append(epoch)
        if len(applied) == 2:
            raise RuntimeError("simulated crash")

    q = start_ingest(
        spark, table_path, change_dir, ckpt, CHANGE_SCHEMA, on_batch=crash_after_two
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    assert len(applied) == 2  # died mid-stream

    # Restart from checkpoint; drains the rest (and may re-deliver the
    # epoch whose foreachBatch raised after apply -> must be skipped by
    # the epoch marker, not double-applied).
    q2 = start_ingest(spark, table_path, change_dir, ckpt, CHANGE_SCHEMA)
    q2.awaitTermination()
    assert_matches_oracle(spark, table_path, all_pdf)

    # Every lineage row committed exactly once per epoch.
    hist = LakeTable(spark, table_path).history()
    epochs = [
        h["summary"]["source_offsets"]["epoch"]
        for h in hist
        if "source_offsets" in h.get("summary", {})
    ]
    assert len(epochs) == len(set(epochs)), f"duplicate epoch commits: {epochs}"


def test_restart_with_no_new_data_is_noop(spark, setup):
    change_dir, table_path, ckpt, all_pdf = setup
    q = start_ingest(spark, table_path, change_dir, ckpt, CHANGE_SCHEMA)
    q.awaitTermination()
    v = LakeTable(spark, table_path).version
    q2 = start_ingest(spark, table_path, change_dir, ckpt, CHANGE_SCHEMA)
    q2.awaitTermination()
    assert LakeTable(spark, table_path).version == v
    assert_matches_oracle(spark, table_path, all_pdf)
