"""Dict-lookup enrichment with auto source-column detection.

Spark-first parity with the reference DataEnricher
(reference:src/etl_framework/plugins/transformers/enricher.py:16-263):

- **Validation is driver-side, once** — lookup-dict size cap, key/value
  type filtering, dangerous-pattern rejection, column-name safety: all
  config-sized work, evaluated before any job is planned.
- **Source-column detection is resolved ONCE against a driver-side
  sample** (reference:enricher.py:146-195 probes 5 sample values per
  column): one ``take(sample_rows)`` job, then pure Python matching —
  never a per-column distributed probe, never Python in the row loop.
- **The lookup itself compiles to the plan**: an inline literal
  ``create_map`` for config-sized dicts (whole-stage codegen, zero
  shuffle), or a broadcast left join above ``broadcast_threshold``
  entries (still zero shuffle on the big side). Both are the Spark
  analogs of the reference's ``Series.map`` with NULL for misses.
"""

from __future__ import annotations

import warnings
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: reference caps (enricher.py:50-61)
MAX_LOOKUP_ENTRIES = 10_000
MAX_VALUE_CHARS = 1_000
#: above this the inline literal map becomes a broadcast join
BROADCAST_THRESHOLD = 256

_KEY_PATTERNS = (";", "--", "/*", "*/", "union", "select", "exec")
_VALUE_PATTERNS = ("<script>", "javascript:", "onload=", "onerror=")
_COLUMN_PATTERNS = (";", "--", "/*", "*/", "union", "select", "drop", "delete")


def validate_lookup_dict(lookup: dict) -> dict:
    """Reference security filter (enricher.py:35-103): cap size, keep
    only scalar keys/values, drop dangerous string patterns, truncate
    oversized values."""
    items = list(lookup.items())
    if len(items) > MAX_LOOKUP_ENTRIES:
        warnings.warn(f"lookup dict truncated to {MAX_LOOKUP_ENTRIES} entries")
        items = items[:MAX_LOOKUP_ENTRIES]
    out: dict = {}
    for k, v in items:
        if not isinstance(k, (str, int, float, bool)):
            continue
        if not isinstance(v, (str, int, float, bool, type(None))):
            continue
        if isinstance(k, str) and any(p in k.lower() for p in _KEY_PATTERNS):
            continue
        if isinstance(v, str):
            if len(v) > MAX_VALUE_CHARS:
                v = v[:MAX_VALUE_CHARS]
            if any(p in v.lower() for p in _VALUE_PATTERNS):
                continue
        out[k] = v
    return out


def validate_column_name(name: Any) -> bool:
    """Reference column-name gate (enricher.py:105-147)."""
    if not isinstance(name, str) or not name or len(name) > 50:
        return False
    low = name.lower()
    if any(p in low for p in _COLUMN_PATTERNS):
        return False
    if ".." in name or "/" in name or "\\" in name:
        return False
    return True


class EnricherTransformer:
    """Registry transformer: adds ``new_column_name`` = lookup of a
    (possibly auto-detected) source column. Plugs into
    ``Pipeline.add_transformer``."""

    def __init__(
        self,
        lookup_dict: dict | None = None,
        new_column_name: str = "enriched",
        source_column: str | None = None,
        enable_security: bool = True,
        sample_rows: int = 50,
    ):
        self.lookup_dict = lookup_dict or {}
        self.new_column_name = new_column_name
        self.source_column = source_column
        self.enable_security = enable_security
        self.sample_rows = sample_rows
        self.name = "EnricherTransformer"

    # ------------------------------------------------------------ detect
    def find_source_column(self, df: DataFrame, lookup: dict) -> str | None:
        """Reference detection semantics (enricher.py:146-195), resolved
        once driver-side: an explicitly named column wins if present;
        otherwise the FIRST column (in ``df.columns`` order, skipping
        unsafe names) with at least one sampled value appearing as a
        lookup key. The sample is one ``take`` job shared by every
        column — O(sample) driver work, no per-column scans."""
        if self.source_column:
            return self.source_column if self.source_column in df.columns else None
        if not lookup:
            return None
        sample = df.take(self.sample_rows)
        for col in df.columns:
            if self.enable_security and not validate_column_name(col):
                continue
            seen = []
            for row in sample:
                v = row[col]
                if v is None or v in seen:
                    continue
                seen.append(v)
                if len(seen) > 5:
                    break
            try:
                if any(v in lookup for v in seen):
                    return col
            except TypeError:  # unhashable column values (arrays/maps)
                continue
        return None

    # ------------------------------------------------------------- apply
    def transform(self, df: DataFrame) -> DataFrame:
        if not self.lookup_dict:
            return df
        lookup = (
            validate_lookup_dict(self.lookup_dict)
            if self.enable_security
            else dict(self.lookup_dict)
        )
        if not lookup:
            return df
        new_name = self.new_column_name
        if self.enable_security and not validate_column_name(new_name):
            new_name = "enriched_data"  # reference fallback (enricher.py:210)
        src = self.find_source_column(df, lookup)
        if src is None:
            return df

        # Heterogeneous key types can't share one typed map column;
        # match on string form then (Python dict semantics need exact
        # type equality, but mixed-type configs are already outside the
        # reference's JSON-config reality).
        key_types = {type(k) for k in lookup}
        stringify = len(key_types) > 1
        key_col = F.col(src).cast("string") if stringify else F.col(src)
        items = (
            {str(k): v for k, v in lookup.items()} if stringify else lookup
        )
        if len(items) <= BROADCAST_THRESHOLD:
            pairs: list = []
            for k, v in items.items():
                pairs.extend([F.lit(k), F.lit(v)])
            return df.withColumn(new_name, F.create_map(*pairs)[key_col])
        spark = df.sparkSession
        lk = spark.createDataFrame(
            list(items.items()), ["_enrich_key", new_name]
        )
        joined = df.join(
            F.broadcast(lk), key_col == F.col("_enrich_key"), "left"
        ).drop("_enrich_key")
        return joined
