"""As-of (event-time) join — SURVEY.md §2.4 J6.

For each left row, attach the latest right row with the same key whose
timestamp is <= (backward) or >= (forward) the left timestamp.

Plan: tag and union both sides, ONE shuffle+sort per key over the
combined stream, carry the most recent right row forward with a window
(`last(struct, ignorenulls=True)` — the whole right row as one struct,
so a NULL field inside a right row never splices columns from different
rows), then keep left rows. Cost is O((|L|+|R|) log) with a single
exchange — versus the naive range-join formulation (L x R per key then
argmax) which explodes quadratically on hot keys.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """As-of join; right payload columns are suffixed on collision.

    ``direction='backward'``: latest right with ``right_ts <= left_ts``;
    ``'forward'``: earliest right with ``right_ts >= left_ts``.
    Ties on equal timestamps: the right row is visible to a left row at
    the same instant; among equal right timestamps the later one in sort
    order wins (keep right_ts unique per key for determinism).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(on)
    lpay = [c for c in left.columns if c not in keys and c != left_ts]
    rpay = [c for c in right.columns if c not in keys and c != right_ts]
    rcarry = rpay + [right_ts] if right_ts not in rpay else rpay
    out_names = {c: (c + suffix if c in left.columns else c) for c in rcarry}
    rtypes = dict(right.dtypes)

    l_tag = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lpay],
        F.lit(None)
        .cast(
            "struct<" + ", ".join(f"`{c}`:{rtypes[c]}" for c in rcarry) + ">"
        )
        .alias("_r"),
    )
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lpay],
        F.struct(*[F.col(c) for c in rcarry]).alias("_r"),
    )
    both = l_tag.unionByName(r_tag)

    if direction == "backward":
        # right rows sort BEFORE left rows at equal _ts (visible to them)
        w = Window.partitionBy(*keys).orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
    else:
        w = Window.partitionBy(*keys).orderBy(F.col("_ts").desc(), F.col("_is_left").asc())
    w = w.rowsBetween(Window.unboundedPreceding, 0)
    carried = both.withColumn("_c", F.last("_r", ignorenulls=True).over(w))
    return carried.where(F.col("_is_left") == 1).select(
        *keys,
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in lpay],
        *[F.col(f"_c.{c}").alias(out_names[c]) for c in rcarry],
    )
