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


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(event, min_size=1, max_size=40),
    n_batches=st.integers(min_value=1, max_value=4),
    compact_after=st.sets(st.integers(min_value=0, max_value=3)),
    impl_name=st.sampled_from(["lake", "dir"]),
)
def test_merge_on_read_matches_replay_oracle(
    spark, tmp_path_factory, events, n_batches, compact_after, impl_name
):
    """The MoR arm of the replay property: the same random logs through
    a ``merge_policy="lww"`` table — every epoch lands as delta files,
    reads go through the scoped per-bucket fold, and compaction points
    are random (so the final read mixes compacted base, multi-commit
    base, and unfolded deltas). Invariants: (1) live state equals the
    replay oracle at EVERY batch boundary, not just the end; (2) a
    ``ranges``-bounded read obeys the prune-only contract — it returns
    a subset of the full read containing every row that satisfies the
    bound."""
    from etl_framework_spark.lakehouse import DirTable

    impl = {"lake": LakeTable, "dir": DirTable}[impl_name]
    tmp = tmp_path_factory.mktemp("prop_mor")
    table = impl.create(
        spark,
        str(tmp / "t"),
        schema=STORED,
        key_columns=KEY_COLUMNS,
        n_buckets=4,
        merge_policy="lww",
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
    seen = 0
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
        seen += len(chunk)
        if b in compact_after:
            table.compact(min_files=1)
            table.refresh()
        got = {
            (r["conv_id"], r["turn_idx"]): r["text"]
            for r in table.current().collect()
        }
        assert got == oracle(events[:seen]), (b, impl_name)

    # prune-only contract on the final (possibly delta-holding) state
    full = table.current().collect()
    mid_lsn = len(events) // 2
    bounded = table.current(ranges={"_lsn": (mid_lsn, None)}).collect()
    full_keys = {(r["conv_id"], r["turn_idx"], r["_lsn"]) for r in full}
    bounded_keys = {(r["conv_id"], r["turn_idx"], r["_lsn"]) for r in bounded}
    assert bounded_keys <= full_keys
    assert {k for k in full_keys if k[2] >= mid_lsn} <= bounded_keys
