"""Property-based replay: random change logs, engine state == oracle.

Hypothesis generates arbitrary multi-batch change logs (random ops,
out-of-order timestamps, key collisions); the invariant is the north
rule's: after applying every batch, the table's live rows equal the
trivially-correct replay oracle (max (ts, lsn) per key; delete winner =>
absent), with per-turn text equality under stable key ordering.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_framework_spark.cdc import apply_changes
from etl_framework_spark.lakehouse import LakeTable
from etl_framework_spark.schemas import KEY_COLUMNS, TRANSCRIPT_SCHEMA

STORED = T.StructType(
    TRANSCRIPT_SCHEMA.fields
    + [
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ]
)

# events: (op, ts_sec, conv_i, turn, text_i); lsn = position in the log
event = st.tuples(
    st.sampled_from(["I", "U", "U", "D"]),
    st.integers(min_value=0, max_value=30),  # coarse ts -> plenty of ts ties
    st.integers(min_value=0, max_value=3),  # 4 conversations -> collisions
    st.integers(min_value=0, max_value=2),  # 3 turns
    st.integers(min_value=0, max_value=99),
)


def oracle(events):
    """Replay in (ts, lsn) order; last writer wins; D removes."""
    state = {}
    for lsn, (op, ts, conv, turn, txt) in sorted(
        enumerate(events), key=lambda p: (p[1][1], p[0])
    ):
        key = (f"c{conv}", turn)
        if op == "D":
            state[key] = None
        else:
            state[key] = f"t{txt}"
    return {k: v for k, v in state.items() if v is not None}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(event, min_size=1, max_size=40),
    n_batches=st.integers(min_value=1, max_value=3),
)
def test_engine_matches_replay_oracle(spark, tmp_path_factory, events, n_batches):
    tmp = tmp_path_factory.mktemp("prop")
    table = LakeTable.create(
        spark, str(tmp / "t"), schema=STORED, key_columns=KEY_COLUMNS, n_buckets=4
    )
    rows = [
        (
            op,
            lsn,
            f"2026-01-01 00:00:{ts:02d}",
            f"c{conv}",
            turn,
            None if op == "D" else "user",
            None if op == "D" else f"t{txt}",
            None,
        )
        for lsn, (op, ts, conv, turn, txt) in enumerate(events)
    ]
    per = max(len(rows) // n_batches, 1)
    for b in range(n_batches):
        chunk = rows[b * per :] if b == n_batches - 1 else rows[b * per : (b + 1) * per]
        if not chunk:
            continue
        df = spark.createDataFrame(
            chunk,
            "op string, lsn long, ts string, conv_id string, turn_idx int, "
            "role string, text string, tool string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        apply_changes(table, df, stream_id="prop", epoch_id=b)
        table.refresh()

    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in table.current().collect()
    }
    expected = oracle(events)
    assert got == expected
