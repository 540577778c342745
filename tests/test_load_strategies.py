"""Load-strategy semantics, parametrized like the reference's integration
suite (reference:tests/integration/pipeline/test_pipeline_integration.py:169-198)."""

from __future__ import annotations

import pandas as pd
import pytest

from etl_framework_spark.lakehouse import LakeTable
from etl_framework_spark.operators import LoadStrategy, load


def orders_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["order_id", "customer", "qty", "status"])
    return spark.createDataFrame(pdf)


BASE = [
    ("ORD1", "acme", 1, "pending"),
    ("ORD2", "bob", 2, "pending"),
    ("ORD3", "carol", 3, "shipped"),
]


def state(table: LakeTable) -> dict:
    return {
        r["order_id"]: (r["customer"], r["qty"], r["status"])
        for r in table.current().collect()
    }


def test_fail_creates_then_errors(spark, tmp_path):
    target = str(tmp_path / "t")
    load(spark, orders_df(spark, BASE), target, LoadStrategy.FAIL)
    assert len(state(LakeTable(spark, target))) == 3
    with pytest.raises(FileExistsError):
        load(spark, orders_df(spark, BASE), target, LoadStrategy.FAIL)


def test_replace_overwrites(spark, tmp_path):
    target = str(tmp_path / "t")
    load(spark, orders_df(spark, BASE), target, LoadStrategy.FAIL)
    load(spark, orders_df(spark, [("ORD9", "zed", 9, "new")]), target, LoadStrategy.REPLACE)
    assert state(LakeTable(spark, target)) == {"ORD9": ("zed", 9, "new")}


def test_append_doubles_rows(spark, tmp_path):
    target = str(tmp_path / "t")
    load(spark, orders_df(spark, BASE), target, LoadStrategy.APPEND)
    load(spark, orders_df(spark, BASE), target, LoadStrategy.APPEND)
    assert LakeTable(spark, target).current().count() == 6


def test_append_evolves_schema(spark, tmp_path):
    """New column on append: old rows read back with NULL (richer than the
    reference's ALTER ... ADD COLUMN TEXT degrade,
    reference:src/etl_framework/plugins/loaders/sql_loader.py:115-167)."""
    target = str(tmp_path / "t")
    load(spark, orders_df(spark, BASE), target, LoadStrategy.APPEND)
    extra = spark.createDataFrame(
        pd.DataFrame(
            [("ORD4", "dan", 4, "pending", "express")],
            columns=["order_id", "customer", "qty", "status", "ship_mode"],
        )
    )
    table = load(spark, extra, target, LoadStrategy.APPEND)
    got = {r["order_id"]: r["ship_mode"] for r in table.current().collect()}
    assert got == {"ORD1": None, "ORD2": None, "ORD3": None, "ORD4": "express"}


def test_update_modifies_existing_never_inserts(spark, tmp_path):
    target = str(tmp_path / "t")
    load(spark, orders_df(spark, BASE), target, LoadStrategy.FAIL, key_columns=["order_id"])
    upd = orders_df(
        spark,
        [("ORD2", "bob", 20, "completed"), ("ORD8", "new", 8, "pending")],
    )
    table = load(spark, upd, target, LoadStrategy.UPDATE, key_columns=["order_id"])
    s = state(table)
    assert s["ORD2"] == ("bob", 20, "completed")
    assert "ORD8" not in s
    assert len(s) == 3


def test_upsert_updates_and_inserts(spark, tmp_path):
    target = str(tmp_path / "t")
    load(spark, orders_df(spark, BASE), target, LoadStrategy.FAIL, key_columns=["order_id"])
    up = orders_df(
        spark,
        [("ORD2", "bob", 20, "completed"), ("ORD8", "new", 8, "pending")],
    )
    table = load(spark, up, target, LoadStrategy.UPSERT, key_columns=["order_id"])
    s = state(table)
    assert s["ORD2"] == ("bob", 20, "completed")
    assert s["ORD8"] == ("new", 8, "pending")
    assert len(s) == 4


def test_upsert_composite_key(spark, tmp_path):
    """Composite keys as in the reference demo config
    (reference:demo/config/roller_door_mapping.json:130-141)."""
    target = str(tmp_path / "t")
    load(
        spark,
        orders_df(spark, BASE),
        target,
        LoadStrategy.FAIL,
        key_columns=["order_id", "customer"],
    )
    up = orders_df(spark, [("ORD1", "acme", 11, "x"), ("ORD1", "other", 1, "y")])
    table = load(spark, up, target, LoadStrategy.UPSERT, key_columns=["order_id", "customer"])
    s = {(r["order_id"], r["customer"]): r["qty"] for r in table.current().collect()}
    assert s[("ORD1", "acme")] == 11
    assert s[("ORD1", "other")] == 1
    assert len(s) == 4


def test_update_on_missing_target_creates(spark, tmp_path):
    """reference:src/etl_framework/plugins/loaders/sql_loader.py:236-239"""
    target = str(tmp_path / "t")
    table = load(spark, orders_df(spark, BASE), target, LoadStrategy.UPDATE, key_columns=["order_id"])
    assert len(state(table)) == 3


def test_strategy_flags():
    assert LoadStrategy.UPSERT.requires_key_columns
    assert LoadStrategy.UPDATE.requires_key_columns
    assert not LoadStrategy.APPEND.requires_key_columns
    assert LoadStrategy.REPLACE.is_destructive
    assert not LoadStrategy.FAIL.is_destructive
    with pytest.raises(ValueError):
        LoadStrategy("bogus")
