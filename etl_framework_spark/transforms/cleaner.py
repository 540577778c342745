"""DataFrame cleaning ops (reference DataCleaner parity).

All pure metadata or single-projection ops — nothing here shuffles except
``fill_missing`` (explicitly window-ordered, see its docstring).
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_NAME_LEN = 50  # reference:src/etl_framework/plugins/transformers/cleaner.py:104


def sanitize_name(name: str) -> str:
    """strip/lower, spaces+dashes -> _, drop non-alnum, prefix leading
    digits, cap length (reference:src/etl_framework/plugins/transformers/
    cleaner.py:82-118)."""
    s = name.strip().lower()
    s = re.sub(r"[ \-]+", "_", s)
    s = re.sub(r"[^a-z0-9_]", "", s)
    if not s or not re.match(r"^[a-z_]", s):
        s = f"col_{s}" if s else "col"
    return s[:MAX_NAME_LEN]


def standardize_column_names(df: DataFrame) -> DataFrame:
    """Sanitize all names + dedup with numeric suffixes
    (reference:cleaner.py:206-215,250-258). Pure metadata: ``toDF``."""
    seen: dict[str, int] = {}
    out = []
    for c in df.columns:
        s = sanitize_name(c)
        if s in seen:
            seen[s] += 1
            s = f"{s}_{seen[s]}"
        else:
            seen[s] = 0
        out.append(s)
    return df.toDF(*out)


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Case-insensitive-fallback rename (reference:cleaner.py:217-224)."""
    lower = {c.lower(): c for c in df.columns}
    resolved = {}
    for src, dst in mapping.items():
        if src in df.columns:
            resolved[src] = dst
        elif src.lower() in lower:
            resolved[lower[src.lower()]] = dst
    return df.withColumnsRenamed(resolved)


def fill_missing(
    df: DataFrame,
    order_by: Sequence[str],
    columns: Sequence[str] | None = None,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Forward-fill then backward-fill (reference:cleaner.py:227-238).

    pandas ``ffill`` is implicitly ordered by row position; a distributed
    fill REQUIRES an explicit total order (here: ``order_by``, e.g.
    ``(conv_id, turn_idx)``) and should be partitioned (``partition_by``)
    so the window doesn't serialize on a single task. Unpartitioned use
    on big data is a deliberate error.
    """
    if not order_by:
        raise ValueError("fill_missing requires an explicit ordering")
    cols = list(columns or [c for c in df.columns if c not in order_by])
    pb = [F.col(c) for c in (partition_by or [])]
    fwd = (
        Window.partitionBy(*pb)
        .orderBy(*[F.col(c) for c in order_by])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bwd = (
        Window.partitionBy(*pb)
        .orderBy(*[F.col(c) for c in order_by])
        .rowsBetween(0, Window.unboundedFollowing)
    )
    for c in cols:
        df = df.withColumn(
            c,
            F.coalesce(
                F.last(F.col(c), ignorenulls=True).over(fwd),
                F.first(F.col(c), ignorenulls=True).over(bwd),
            ),
        )
    return df


def drop_empty_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """dropna(how='all') (reference:cleaner.py:241)."""
    cols = list(subset or df.columns)
    any_notnull = None
    for c in cols:
        cond = F.col(c).isNotNull()
        any_notnull = cond if any_notnull is None else (any_notnull | cond)
    return df.where(any_notnull)
