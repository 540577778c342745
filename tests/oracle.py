"""Trivially-correct replay oracle (driver-side pandas).

Independent of the engine: sorts the change log by (ts, lsn) and applies
events one at a time into a dict — the golden-recompute pattern from the
reference's functional tests
(reference:tests/functional/workflows/test_business_workflow.py:71-90).
Only usable at test scale; that's the point.
"""

from __future__ import annotations

import pandas as pd


def replay(changes: pd.DataFrame, payload_cols: list[str] | None = None) -> pd.DataFrame:
    """Sequentially apply a CDC log; returns the final table state
    (conv_id, turn_idx, *payload, ts, _lsn) sorted by key."""
    if payload_cols is None:
        payload_cols = [
            c for c in changes.columns if c not in ("op", "lsn", "ts", "conv_id", "turn_idx")
        ]
    ordered = changes.sort_values(["ts", "lsn"], kind="mergesort")
    state: dict = {}
    for row in ordered.itertuples(index=False):
        key = (row.conv_id, row.turn_idx)
        if row.op == "D":
            state.pop(key, None)
        else:
            state[key] = {
                "conv_id": row.conv_id,
                "turn_idx": row.turn_idx,
                **{c: getattr(row, c) for c in payload_cols},
                "ts": row.ts,
                "_lsn": row.lsn,
            }
    if not state:
        return pd.DataFrame(
            columns=["conv_id", "turn_idx", *payload_cols, "ts", "_lsn"]
        )
    out = pd.DataFrame(list(state.values()))
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
