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


def test_pdf_tables_roundtrip_distributed(spark, tmp_path):
    """S4 end to end without pdfplumber: the minimal codec
    (sources/pdfmini.py) writes simple report PDFs and the distributed
    binaryFile + mapInPandas reader recovers (page, row, cells)."""
    from etl_framework_spark.sources.pdfmini import write_simple_pdf

    rows1 = [["id", "name"], ["1", "alpha (x)"], ["2", "beta"]]
    rows2 = [["k", "v"], ["9", "page two"]]
    p = tmp_path / "report.pdf"
    write_simple_pdf(str(p), [rows1, rows2])
    df = read_pdf_tables(spark, str(p))
    assert [f.name for f in df.schema.fields] == [
        "source_file", "page", "table_idx", "row_idx", "cells"
    ]
    got = {
        (r["page"], r["row_idx"]): list(r["cells"]) for r in df.collect()
    }
    assert got[(0, 0)] == ["id", "name"]
    assert got[(0, 1)] == ["1", "alpha (x)"]
    assert got[(1, 1)] == ["9", "page two"]
    assert len(got) == 5


def test_pdf_reader_garbage_yields_no_rows(spark, tmp_path):
    p = tmp_path / "f.pdf"
    p.write_bytes(b"%PDF-1.4 fake")
    assert read_pdf_tables(spark, str(p)).count() == 0


def test_xlsx_roundtrip_without_openpyxl(spark, tmp_path):
    """The self-contained SpreadsheetML codec makes the Excel path (S2)
    fully testable without third-party Excel libs: write via the
    minimal writer, read via read_excel (which falls back to the
    minimal parser when openpyxl is absent)."""
    from etl_framework_spark.sources import read_excel, write_xlsx

    p = str(tmp_path / "book.xlsx")
    write_xlsx(
        p,
        ["id", "name", "score", "flag"],
        [[1, "alpha", 1.5, True], [2, "be & <to>", 2.0, False], [3, None, None, None]],
    )
    df = read_excel(spark, p)
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert [r["name"] for r in rows] == ["alpha", "be & <to>", None]
    assert rows[0]["score"] == 1.5 and rows[1]["flag"] is False


def test_xlsx_sheet_selection_and_header(tmp_path):
    from etl_framework_spark.sources import parse_xlsx, write_xlsx

    p = str(tmp_path / "s.xlsx")
    write_xlsx(p, ["a", "b"], [[10, "x"]], sheet_name="Data")
    header, rows = parse_xlsx(p, sheet="Data")
    assert header == ["a", "b"] and rows == [[10, "x"]]
    header0, _ = parse_xlsx(p, sheet=0)
    assert header0 == ["a", "b"]


def test_feather_roundtrip_distributed(spark, tmp_path):
    """Feather sink/scan (L-family): distributed write (one Arrow IPC
    part per partition) and distributed decode preserving schema."""
    from etl_framework_spark.sources import read_feather, write_feather

    df = spark.range(0, 1000, 1, 4).selectExpr(
        "id", "CAST(id AS DOUBLE) * 1.5 AS v", "CAST(id AS STRING) AS s"
    )
    path = str(tmp_path / "fth")
    n_parts = write_feather(df, path)
    assert n_parts >= 1
    back = read_feather(spark, path)
    # nullability flags may relax through the Arrow roundtrip; names and
    # types must survive exactly
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]
    assert back.count() == 1000
    assert back.agg({"v": "sum"}).collect()[0][0] == sum(i * 1.5 for i in range(1000))


def test_feather_empty_dataset_roundtrip(spark, tmp_path):
    """An empty DataFrame round-trips through the feather sink: the
    writer emits one schema-only file, the reader returns an empty frame
    with the right schema (ADVICE r2)."""
    from etl_framework_spark.sources import read_feather, write_feather

    df = spark.range(0).selectExpr("id", "CAST(id AS STRING) AS s")
    path = str(tmp_path / "fth_empty")
    assert write_feather(df, path) == 1
    back = read_feather(spark, path)
    assert back.count() == 0
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]


def test_file_loader_feather_and_xlsx(spark, tmp_path):
    from etl_framework_spark.pipeline import (
        DataFrameExtractor,
        FileLoader,
        Pipeline,
    )
    from etl_framework_spark.sources import read_excel, read_feather

    src = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    pipe = Pipeline(spark, enable_security=False)
    pipe.register_extractor("mem", DataFrameExtractor())
    pipe.register_loader("feather", FileLoader(format="feather"))
    pipe.register_loader("xlsx", FileLoader(format="xlsx"))
    fpath, xpath = str(tmp_path / "f"), str(tmp_path / "b.xlsx")
    pipe.run("mem", src, "feather", fpath, strategy="replace")
    pipe.run("mem", src, "xlsx", xpath, strategy="replace")
    assert read_feather(spark, fpath).count() == 2
    assert {r["name"] for r in read_excel(spark, xpath).collect()} == {"a", "b"}
    with pytest.raises(FileExistsError):
        pipe.run("mem", src, "xlsx", xpath, strategy="fail")
