"""Feather (Arrow IPC) writer/reader (reference L-family:
reference:src/etl_framework/plugins/loaders/file_loader.py:281-299).

pyarrow is a hard dependency of PySpark's Arrow path, so unlike
Excel/PDF this format needs no import gate.

- ``write_feather`` is DISTRIBUTED: one ``mapInPandas`` pass writes one
  feather file per non-empty partition directly from executors (the
  directory must be shared storage on a cluster — same contract as any
  file sink).
- ``read_feather`` is distributed too: a ``binaryFile`` scan ships each
  feather file's bytes to an executor that decodes it via Arrow IPC;
  the Spark schema is derived from the first file's footer driver-side
  so Catalyst can plan without running Python.
"""

from __future__ import annotations

import glob
import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def write_feather(df: DataFrame, path: str) -> int:
    """Write ``df`` as a directory of feather part files; returns the
    number of part files written."""
    os.makedirs(path, exist_ok=True)

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.feather as fe

        tables = [
            pa.Table.from_pandas(b, preserve_index=False) for b in batches if len(b)
        ]
        if tables:
            fe.write_feather(
                pa.concat_tables(tables),
                os.path.join(path, f"part-{uuid.uuid4().hex}.feather"),
            )
            yield pd.DataFrame({"files": [1]})

    n = int(
        df.mapInPandas(write_part, "files int").agg({"files": "sum"}).collect()[0][0]
        or 0
    )
    if n == 0:
        # Empty dataset: emit ONE schema-only feather file so a
        # subsequent read_feather round-trips to an empty DataFrame
        # instead of FileNotFoundError.
        import pyarrow as pa
        import pyarrow.feather as fe
        from pyspark.sql.pandas.types import to_arrow_schema

        fe.write_feather(
            pa.Table.from_batches([], schema=to_arrow_schema(df.schema)),
            os.path.join(path, f"part-{uuid.uuid4().hex}.feather"),
        )
        n = 1
    return n


def read_feather(spark: SparkSession, path: str) -> DataFrame:
    """Read a feather file or directory of part files, distributed."""
    from pyspark.sql.pandas.types import from_arrow_schema

    import pyarrow.feather as fe

    files = (
        sorted(glob.glob(os.path.join(path, "*.feather")))
        if os.path.isdir(path)
        else [path]
    )
    if not files:
        raise FileNotFoundError(f"no feather files under {path}")
    arrow_schema = fe.read_table(files[0], memory_map=True).schema
    schema = from_arrow_schema(arrow_schema)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import pyarrow.feather as fe2

        for b in batches:
            for _, row in b.iterrows():
                t = fe2.read_table(io.BytesIO(row["content"]))
                yield t.to_pandas()

    binaries = spark.read.format("binaryFile").load(
        path if not os.path.isdir(path) else os.path.join(path, "*.feather")
    )
    return binaries.select("content").mapInPandas(decode, schema=schema)
