"""Source readers: CSV/JSON scans with pinned schemas, JSON flattening,
gated Excel/PDF paths (SURVEY.md §2.1)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from etl_framework_spark.sources import (
    flatten_json,
    read_csv,
    read_json,
    read_pdf_tables,
)

CSV_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def test_read_csv_pinned_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,name,amount\n1,a,1.5\n2,b,2.5\n")
    df = read_csv(spark, str(p), schema=CSV_SCHEMA)
    assert df.schema == CSV_SCHEMA
    assert df.count() == 2
    assert df.where("id = 2").head()["amount"] == 2.5


def test_read_csv_requires_schema_or_optin(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="explicit schema"):
        read_csv(spark, str(p))
    df = read_csv(spark, str(p), infer=True)
    assert df.columns == ["a", "b"]


def test_read_json_and_flatten(spark, tmp_path):
    rows = [
        {"id": 1, "user": {"name": "ann", "geo": {"cc": "DE"}},
         "events": [{"t": 1, "v": 10}, {"t": 2, "v": 20}]},
        {"id": 2, "user": {"name": "bob", "geo": {"cc": "FR"}}, "events": []},
    ]
    p = tmp_path / "t.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "user",
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField(
                            "geo", T.StructType([T.StructField("cc", T.StringType())])
                        ),
                    ]
                ),
            ),
            T.StructField(
                "events",
                T.ArrayType(
                    T.StructType(
                        [T.StructField("t", T.LongType()), T.StructField("v", T.LongType())]
                    )
                ),
            ),
        ]
    )
    df = read_json(spark, str(p), schema=schema)
    flat = flatten_json(df)
    assert set(flat.columns) == {"id", "user_name", "user_geo_cc", "events_t", "events_v"}
    got = {(r["id"], r["events_t"], r["user_geo_cc"]) for r in flat.collect()}
    # explode_outer keeps the empty-array row with NULL event fields
    assert got == {(1, 1, "DE"), (1, 2, "DE"), (2, None, "FR")}


def test_pdf_reader_gated_not_silently_wrong(spark, tmp_path):
    p = tmp_path / "f.pdf"
    p.write_bytes(b"%PDF-1.4 fake")
    df = read_pdf_tables(spark, str(p))
    # schema is real even though the codec is absent
    assert [f.name for f in df.schema.fields] == [
        "source_file", "page", "table_idx", "row_idx", "cells"
    ]
    try:
        import pdfplumber  # noqa: F401

        has_lib = True
    except ImportError:
        has_lib = False
    if not has_lib:
        from py4j.protocol import Py4JJavaError
        from pyspark.errors.exceptions.captured import PythonException

        with pytest.raises((PythonException, Py4JJavaError)):
            df.collect()
