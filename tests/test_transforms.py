"""Transform layer: calc compiler (golden-recompute), cleaner, crypto.

Golden-recompute pattern from
reference:tests/functional/workflows/test_business_workflow.py:71-90 —
every formula re-computed independently in pandas with tolerance.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_framework_spark.transforms import (
    MappingProgram,
    decrypt_columns,
    detect_sensitive_columns,
    drop_empty_rows,
    encrypt_columns,
    fill_missing,
    mask_column,
    standardize_column_names,
)
from etl_framework_spark.transforms.calc_compiler import (
    CalcValidationError,
    translate_pandas_formula,
)

ROLLER_CONFIG = {
    # Modeled on reference:demo/config/roller_door_mapping.json
    "column_mapping": {"Order ID": "order_id", "WIDTH": "door_width"},
    "business_rules": {
        "price_rate": 1.25,
        "min_days": 10,
        "material_prices": {"AL": 45.5, "ST": 32.0, "WO": 28.75},
    },
    "calculations": [
        {"name": "area_sq_units", "formula": "door_width * door_height"},
        {
            "name": "material_price",
            "type": "lookup",
            "lookup": "material_prices",
            "source_column": "material",
            "default": 0.0,
        },
        {
            "name": "unit_price_calc",
            "formula": "area_sq_units / 1000 * price_rate + material_price",
        },
        {"name": "handling_fee", "value": 150.0},
        {"name": "total_price", "formula": "unit_price_calc * quantity + handling_fee"},
        {
            "name": "lead_days",
            "dialect": "pandas",
            "formula": "raw_days.where(raw_days > min_days, min_days)",
        },
        {
            "name": "size_class",
            "source_column": "area_sq_units",
            "bins": [0, 3_000_000, 6_000_000, None],
            "labels": ["small", "medium", "large"],
        },
        {"name": "note", "value": "x", "condition": "not:has:door_width"},
    ],
    "loading_strategy": {"strategy": "upsert", "key_columns": ["order_id"]},
}


@pytest.fixture()
def orders(spark):
    pdf = pd.DataFrame(
        {
            "Order ID": [1, 2, 3, 4],
            "WIDTH": [2400.0, 1800.0, 3000.0, 1200.0],
            "door_height": [2100.0, 2000.0, 2200.0, 1000.0],
            "material": ["AL", "ST", "WO", "XX"],
            "quantity": [2, 1, 3, 5],
            "raw_days": [5, 30, 8, 12],
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_mapping_program_golden_recompute(spark, orders):
    df, pdf = orders
    prog = MappingProgram.from_json(ROLLER_CONFIG)
    out = prog.apply(df).orderBy("order_id").toPandas()

    width = pdf["WIDTH"]
    height = pdf["door_height"]
    area = width * height
    mat = pdf["material"].map({"AL": 45.5, "ST": 32.0, "WO": 28.75}).fillna(0.0)
    unit = area / 1000 * 1.25 + mat
    total = unit * pdf["quantity"] + 150.0
    lead = pdf["raw_days"].where(pdf["raw_days"] > 10, 10)

    assert list(out.columns[:2]) == ["order_id", "door_width"]  # renamed
    for got, exp in [
        (out["area_sq_units"], area),
        (out["material_price"], mat),
        (out["unit_price_calc"], unit),
        (out["total_price"], total),
        (out["lead_days"], lead),
    ]:
        assert all(
            math.isclose(g, e, rel_tol=1e-9, abs_tol=0.01) for g, e in zip(got, exp)
        ), f"{got.name}: {list(got)} != {list(exp)}"
    assert (out["handling_fee"] == 150.0).all()
    assert list(out["size_class"]) == ["medium", "medium", "large", "small"]
    assert "note" not in out.columns  # not:has gate blocked it


def test_calcs_collapse_to_one_projection(spark, orders):
    """The ordered withColumn chain must fuse into a single projection —
    no per-calculation passes (SURVEY.md §2.8 'Catalyst collapses')."""
    df, _ = orders
    out = MappingProgram.from_json(ROLLER_CONFIG).apply(df)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Project") <= 2, plan


def test_eq_condition_row_gate(spark, orders):
    df, _ = orders
    prog = MappingProgram.from_json(
        {
            "calculations": [
                {
                    "name": "al_area",
                    "formula": "door_height * 2",
                    "condition": "eq:material:AL",
                }
            ]
        }
    )
    out = prog.apply(df.withColumnRenamed("WIDTH", "w")).toPandas()
    assert out.loc[out.material == "AL", "al_area"].notna().all()
    assert out.loc[out.material != "AL", "al_area"].isna().all()


def test_bad_formula_yields_error_column(spark, orders):
    df, _ = orders
    prog = MappingProgram.from_json(
        {"calculations": [{"name": "broken", "formula": "no_such_col * 2"}]}
    )
    out = prog.apply(df)
    assert "broken_error" in out.columns
    assert "broken" not in out.columns


def test_injection_rejected():
    with pytest.raises(CalcValidationError):
        MappingProgram.from_json(
            {"calculations": [{"name": "x", "formula": "1; DROP TABLE users"}]}
        )
    with pytest.raises(CalcValidationError):
        MappingProgram.from_json(
            {"calculations": [{"name": "bad name!", "formula": "1"}]}
        )


def test_translate_pandas_idioms():
    assert translate_pandas_formula("a // b") == "FLOOR(a / b)"
    assert translate_pandas_formula("x.isin(['A', 'B'])") == "x IN ('A', 'B')"
    assert (
        translate_pandas_formula("d.where(d > 5, 5)")
        == "CASE WHEN d > 5 THEN d ELSE 5 END"
    )
    assert "datediff" in translate_pandas_formula("(pd.Timestamp.now() - ts).dt.days")
    assert translate_pandas_formula("q.dt.quarter") == "quarter(q)"


def test_standardize_column_names(spark):
    df = spark.createDataFrame(
        pd.DataFrame([[1, 2, 3, 4]], columns=["Order ID", "order-id", "9col", "A!B"])
    )
    out = standardize_column_names(df)
    assert out.columns == ["order_id", "order_id_1", "col_9col", "ab"]


def test_fill_missing_matches_pandas(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 5 + ["b"] * 5,
            "i": list(range(5)) * 2,
            "v": [None, 1.0, None, 3.0, None, None, None, 7.0, None, 9.0],
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        fill_missing(df, order_by=["i"], columns=["v"], partition_by=["k"])
        .orderBy("k", "i")
        .toPandas()
    )
    exp = (
        pdf.sort_values(["k", "i"])
        .groupby("k")["v"]
        .apply(lambda s: s.ffill().bfill())
        .reset_index(drop=True)
    )
    assert list(out["v"]) == list(exp)


def test_fill_missing_requires_order():
    with pytest.raises(ValueError):
        fill_missing(None, order_by=[])


def test_drop_empty_rows(spark):
    pdf = pd.DataFrame({"a": [1.0, None, None], "b": ["x", None, "y"]})
    df = spark.createDataFrame(pdf)
    assert drop_empty_rows(df).count() == 2


def test_aes_roundtrip_and_null_safety(spark):
    pdf = pd.DataFrame({"ssn": ["123-45-6789", None, "987-65-4321"], "x": [1, 2, 3]})
    df = spark.createDataFrame(pdf)
    enc = encrypt_columns(df, ["ssn"], key="k3y", mode="ECB")
    rows = enc.orderBy("x").collect()
    assert rows[0]["ssn"] not in (None, "123-45-6789")  # ciphertext differs
    assert rows[1]["ssn"] is None  # null-safe
    dec = decrypt_columns(enc, ["ssn"], key="k3y", mode="ECB").orderBy("x").collect()
    assert [r["ssn"] for r in dec] == ["123-45-6789", None, "987-65-4321"]


def test_fernet_roundtrip_vectorized(spark):
    pytest.importorskip("cryptography")
    pdf = pd.DataFrame({"email": ["a@b.c", None, "d@e.f"], "i": [1, 2, 3]})
    df = spark.createDataFrame(pdf)
    enc = encrypt_columns(df, ["email"], key="secret", method="fernet")
    dec = decrypt_columns(enc, ["email"], key="secret", method="fernet")
    assert [r["email"] for r in dec.orderBy("i").collect()] == ["a@b.c", None, "d@e.f"]


def test_mask_column(spark):
    df = spark.createDataFrame(pd.DataFrame({"card": ["4111111111111111", "12", None]}))
    out = [r["card"] for r in mask_column(df, "card").collect()]
    assert out[0] == "************1111"
    assert out[1] == "12"
    assert out[2] is None


def test_detect_sensitive_columns(spark):
    df = spark.createDataFrame(
        pd.DataFrame([[1, "x", "y", "z"]], columns=["id", "email_addr", "SSN", "name"])
    )
    assert set(detect_sensitive_columns(df)) == {"email_addr", "SSN"}


# ---------------------------------------------------------------- enricher


def test_enricher_auto_detects_source_column(spark):
    """Reference detection semantics (enricher.py:146-195): first column
    whose sampled values contain a lookup key wins; lookup misses stay
    NULL (Series.map semantics)."""
    from etl_framework_spark.transforms import EnricherTransformer

    df = spark.createDataFrame(
        [(1, "US", 9.9), (2, "DE", 8.8), (3, "XX", 7.7)],
        "id int, country string, v double",
    )
    t = EnricherTransformer(
        {"US": "United States", "DE": "Germany"}, new_column_name="country_name"
    )
    out = {r["id"]: r["country_name"] for r in t.transform(df).collect()}
    assert out == {1: "United States", 2: "Germany", 3: None}


def test_enricher_explicit_source_and_missing_column(spark):
    from etl_framework_spark.transforms import EnricherTransformer

    df = spark.createDataFrame([(1, "US", "DE")], "id int, a string, b string")
    # explicit source column beats detection order
    t = EnricherTransformer({"DE": "Germany"}, source_column="b")
    assert t.transform(df).head()["enriched"] == "Germany"
    # explicit-but-absent column: no-op (reference returns df unchanged)
    t2 = EnricherTransformer({"DE": "Germany"}, source_column="nope")
    assert t2.transform(df).columns == df.columns


def test_enricher_security_validation():
    """Reference filters (enricher.py:35-103): dangerous keys/values
    dropped, long values truncated, non-scalar entries skipped."""
    from etl_framework_spark.transforms.enricher import (
        validate_column_name,
        validate_lookup_dict,
    )

    lk = validate_lookup_dict(
        {
            "ok": "fine",
            "1; DROP TABLE x": "evil-key",
            "xss": "<script>alert(1)</script>",
            ("tuple",): "bad-key-type",
            "obj": object(),
            "long": "x" * 2000,
        }
    )
    assert set(lk) == {"ok", "long"}
    assert len(lk["long"]) == 1000
    assert validate_column_name("country")
    assert not validate_column_name("a;b")
    assert not validate_column_name("a/../b")
    assert not validate_column_name("x" * 51)


def test_enricher_invalid_new_column_falls_back(spark):
    from etl_framework_spark.transforms import EnricherTransformer

    df = spark.createDataFrame([(1, "US")], "id int, c string")
    t = EnricherTransformer({"US": "yes"}, new_column_name="bad;name")
    assert t.transform(df).head()["enriched_data"] == "yes"


def test_enricher_broadcast_path_over_threshold(spark):
    """Above BROADCAST_THRESHOLD entries the lookup becomes a broadcast
    join — same results, plan carries BroadcastHashJoin."""
    from etl_framework_spark.transforms import EnricherTransformer

    lookup = {f"k{i}": i for i in range(500)}
    df = spark.createDataFrame([(i, f"k{i}") for i in range(600)], "id int, c string")
    t = EnricherTransformer(lookup, new_column_name="num")
    out = t.transform(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = {r["id"]: r["num"] for r in out.collect()}
    assert rows[3] == 3 and rows[599] is None


def test_enricher_in_pipeline(spark, tmp_path):
    from etl_framework_spark.lakehouse import LakeTable
    from etl_framework_spark.pipeline import (
        DataFrameExtractor,
        LakeLoader,
        Pipeline,
    )
    from etl_framework_spark.transforms import EnricherTransformer

    pipe = Pipeline(spark, enable_security=False)
    pipe.register_extractor("mem", DataFrameExtractor())
    pipe.register_loader("lake", LakeLoader(spark, n_buckets=2))
    pipe.add_transformer(EnricherTransformer({"US": "United States"}))
    src = spark.createDataFrame([(1, "US")], "id int, country string")
    pipe.run("mem", src, "lake", str(tmp_path / "t"), strategy="replace")
    assert (
        LakeTable(spark, str(tmp_path / "t")).current().head()["enriched"]
        == "United States"
    )
