"""Schema-pinned source readers (SURVEY.md §2.1 S1-S5).

Reference extractors infer schema on every read
(reference:src/etl_framework/plugins/extractors/csv_extractor.py:63,
json_extractor.py:91, excel_extractor.py:68) — at 10^10-row scale
inference re-reads data and produces run-dependent types, so every
reader here takes an explicit ``StructType`` (or documents exactly when
inference is allowed: interactive exploration only).

Excel and PDF have no distributed readers; they are driver-side or
``binaryFile``+``mapInPandas`` paths with the third-party libs gated
behind import-try (not installed in this container — the Spark-side
plumbing is real, the codec import raises a clear error).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    infer: bool = False,
    **options,
) -> DataFrame:
    """CSV scan (reference S1). Schema required unless ``infer=True``
    is explicitly opted into (one extra pass over the files)."""
    if schema is None and not infer:
        raise ValueError("read_csv requires an explicit schema (or infer=True)")
    r = spark.read.options(header=header, **options)
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", True)
    return r.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    multiline: bool = False,
    **options,
) -> DataFrame:
    """JSON-lines (or multiline array) scan (reference S3)."""
    if schema is None:
        raise ValueError("read_json requires an explicit schema")
    return (
        spark.read.schema(schema).options(multiLine=multiline, **options).json(path)
    )


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """Parquet scan; optional schema pins column order + subsetting."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def flatten_json(df: DataFrame, explode_arrays: bool = True, sep: str = "_") -> DataFrame:
    """Flatten nested structs (and optionally arrays-of-structs) into
    columns, the Spark analog of the reference's ``pd.json_normalize``
    (reference:src/etl_framework/plugins/extractors/json_extractor.py:85-103).

    Structs flatten to ``parent<sep>child`` columns; each array of
    structs is exploded (one at a time, outermost first). Scalars pass
    through. Pure select/explode — no UDFs, streams through codegen.
    """
    while True:
        fields = df.schema.fields
        struct_cols = [f.name for f in fields if isinstance(f.dataType, T.StructType)]
        array_struct_cols = [
            f.name
            for f in fields
            if explode_arrays
            and isinstance(f.dataType, T.ArrayType)
            and isinstance(f.dataType.elementType, T.StructType)
        ]
        if not struct_cols and not array_struct_cols:
            return df
        if struct_cols:
            cols = []
            for f in fields:
                if f.name in struct_cols:
                    for sub in f.dataType.fields:  # type: ignore[union-attr]
                        cols.append(
                            F.col(f"`{f.name}`.`{sub.name}`").alias(
                                f"{f.name}{sep}{sub.name}"
                            )
                        )
                else:
                    cols.append(F.col(f"`{f.name}`"))
            df = df.select(*cols)
            continue
        name = array_struct_cols[0]
        others = [F.col(f"`{c}`") for c in df.columns if c != name]
        df = df.select(*others, F.explode_outer(F.col(f"`{name}`")).alias(name))


def read_excel(
    spark: SparkSession, path: str, sheet_name: int | str = 0, schema: T.StructType | None = None
) -> DataFrame:
    """Excel scan (reference S2). Driver-side read (Excel files are
    small by construction; a 100 TB pipeline does not ingest xlsx),
    then Arrow-converted to a distributed DataFrame.

    Prefers pandas+openpyxl when installed; otherwise falls back to the
    self-contained SpreadsheetML parser (``sources.xlsx``), so the path
    is fully functional and tested without third-party Excel libs."""
    import pandas as pd

    try:
        import openpyxl  # noqa: F401

        pdf = pd.read_excel(path, sheet_name=sheet_name)
    except ImportError:
        from etl_framework_spark.sources.xlsx import parse_xlsx

        header, rows = parse_xlsx(path, sheet=sheet_name)
        pdf = pd.DataFrame(rows, columns=header)
    return (
        spark.createDataFrame(pdf, schema=schema)
        if schema is not None
        else spark.createDataFrame(pdf)
    )


PDF_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("table_idx", T.IntegerType(), False),
        T.StructField("row_idx", T.IntegerType(), False),
        T.StructField("cells", T.ArrayType(T.StringType()), True),
    ]
)


def read_pdf_tables(
    spark: SparkSession, path: str, max_pages: int = 100, max_tables_per_page: int = 10
) -> DataFrame:
    """PDF table scan (reference S4:
    reference:src/etl_framework/plugins/extractors/pdf_extractor.py:40-174).

    Distributed shape: ``binaryFile`` scan -> ``mapInPandas`` that opens
    each PDF from bytes and emits (file, page, table, row, cells) rows
    with provenance, mirroring the reference's page/table metadata
    columns (reference:pdf_extractor.py:124). pdfplumber is preferred
    when installed (scanned/complex layouts); without it the
    self-contained codec (``sources.pdfmini``) parses simple
    machine-generated report PDFs, so the path stays fully testable.
    """
    binaries = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator) -> Iterator:
        import io

        import pandas as pd

        try:
            import pdfplumber
        except ImportError:
            pdfplumber = None

        def tables_of(content: bytes):
            if pdfplumber is not None:
                with pdfplumber.open(io.BytesIO(content)) as pdf:
                    return [
                        page.extract_tables()[:max_tables_per_page]
                        for page in pdf.pages[:max_pages]
                    ]
            from etl_framework_spark.sources.pdfmini import parse_simple_pdf_tables

            # minimal codec: one table per page
            return [[rows] for rows in parse_simple_pdf_tables(content)[:max_pages]]

        for b in batches:
            out = []
            for _, row in b.iterrows():
                for pno, page_tables in enumerate(tables_of(bytes(row["content"]))):
                    for tno, tbl in enumerate(page_tables):
                        for rno, cells in enumerate(tbl):
                            out.append(
                                {
                                    "source_file": row["path"],
                                    "page": pno,
                                    "table_idx": tno,
                                    "row_idx": rno,
                                    "cells": [
                                        None if c is None else str(c) for c in cells
                                    ],
                                }
                            )
            yield pd.DataFrame(out, columns=[f.name for f in PDF_TABLE_SCHEMA.fields])

    return binaries.select("path", "content").mapInPandas(run, schema=PDF_TABLE_SCHEMA)
