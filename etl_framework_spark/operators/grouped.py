"""Grouped-apply extension point (``applyInPandas``).

The Spark mapping of the reference's arbitrary custom ``Transformer``
(reference:src/etl_framework/core/transformer.py:10-24): where the
reference hands the WHOLE DataFrame to imperative pandas code, Spark
hands each KEY GROUP to imperative pandas code — the per-group logic
stays arbitrary Python, but groups are processed in parallel across
executors with Arrow-batched transfer (never row-at-a-time).

Scale notes:
- one shuffle on the grouping keys; skewed groups are the operator's
  natural limit (a single conversation must fit one task — true of any
  per-group imperative semantics);
- the group function must be pure per group (no cross-group state);
- output schema is declared up front so Catalyst can plan downstream
  without running Python.

``validate_conversation_turns`` is the concrete use case SURVEY §2.11
names: per-conversation transcript validation that genuinely needs
ordered, whole-group imperative logic.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def grouped_apply(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType | str,
) -> DataFrame:
    """Apply ``fn`` (pandas in, pandas out) to each group of ``keys``.

    Thin, typed wrapper over ``DataFrame.groupBy(...).applyInPandas`` —
    the registry-friendly extension point the Pipeline exposes for
    custom transformers whose semantics are inherently per-group.
    """
    return df.groupBy(*[str(k) for k in keys]).applyInPandas(fn, schema=schema)


TURN_VALIDATION_SCHEMA = (
    "conv_id string, n_turns int, n_missing int, n_dup_turns int, "
    "role_repeats int, max_gap_seconds double, valid boolean"
)


def _validate_one_conversation(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-conversation turn validation (runs once per conv_id group).

    Checks the north-rule invariants a transcript must satisfy after
    CDC replay: stable turn ordering (turn_idx contiguous from 0, no
    duplicates) and role alternation; also reports the largest
    inter-turn timestamp gap. Imperative on purpose — this is the
    extension point's demonstration that arbitrary pandas logic drops
    in; everything here is also SQL-expressible so the DuckDB oracle
    can confirm the plumbing end to end.
    """
    g = pdf.sort_values(["turn_idx", "ts"], kind="mergesort")
    turns = g["turn_idx"].to_numpy()
    n = len(g)
    n_dup = int(n - pd.unique(turns).size)
    expected = turns.max() + 1 if n else 0
    n_missing = int(expected - pd.unique(turns).size)
    roles = g["role"].to_numpy()
    role_repeats = int((roles[1:] == roles[:-1]).sum()) if n > 1 else 0
    ts = g["ts"]
    gaps = ts.diff().dt.total_seconds().dropna()
    max_gap = float(gaps.max()) if len(gaps) else 0.0
    return pd.DataFrame(
        {
            "conv_id": [g["conv_id"].iloc[0]],
            "n_turns": [n],
            "n_missing": [n_missing],
            "n_dup_turns": [n_dup],
            "role_repeats": [role_repeats],
            "max_gap_seconds": [max_gap],
            "valid": [n_dup == 0 and n_missing == 0],
        }
    )


def validate_conversation_turns(df: DataFrame) -> DataFrame:
    """Per-conversation validation over (conv_id, turn_idx, role, ts)."""
    return grouped_apply(
        df.select("conv_id", "turn_idx", "role", "ts"),
        ["conv_id"],
        _validate_one_conversation,
        TURN_VALIDATION_SCHEMA,
    )


USER_SESSION_SCHEMA = (
    "user_id long, n_events int, n_types int, max_gap_seconds double, "
    "total_value double"
)


def _user_session_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user event-stream stats (grouped-apply over ``events``)."""
    g = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    gaps = g["ts"].diff().dt.total_seconds().dropna()
    return pd.DataFrame(
        {
            "user_id": [g["user_id"].iloc[0]],
            "n_events": [len(g)],
            "n_types": [g["event_type"].nunique()],
            "max_gap_seconds": [float(gaps.max()) if len(gaps) else 0.0],
            "total_value": [float(g["value"].sum())],
        }
    )


def user_session_stats(events: DataFrame) -> DataFrame:
    """Grouped-apply over the events table: one row per user."""
    return grouped_apply(
        events.select("user_id", "event_id", "ts", "event_type", "value"),
        ["user_id"],
        _user_session_stats,
        USER_SESSION_SCHEMA,
    )
