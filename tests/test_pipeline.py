"""Pipeline orchestration, RBAC/audit, LoadOptions precedence, CLI, and
the grouped-apply extension point.

Strategy matrix mirrors the reference's pipeline integration suite
(reference:tests/integration/pipeline/test_pipeline_integration.py:195-252).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_framework_spark.lakehouse import LakeTable
from etl_framework_spark.operators import LoadStrategy
from etl_framework_spark.pipeline import (
    CleanerTransformer,
    CsvExtractor,
    DataFrameExtractor,
    FileLoader,
    FnTransformer,
    LakeLoader,
    LoadOptions,
    MappingTransformer,
    Pipeline,
    strategy_from_string,
)
from etl_framework_spark.security import AccessController, Role


@pytest.fixture()
def src(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id int, name string, v double"
    )


def _pipe(spark, tmp_path, username="admin", **kw):
    p = Pipeline(
        spark,
        username=username,
        audit_log_file=str(tmp_path / "audit.jsonl"),
        audit_table=str(tmp_path / "audit_table"),
        **kw,
    )
    p.register_extractor("mem", DataFrameExtractor())
    p.register_loader("lake", LakeLoader(spark, n_buckets=4))
    return p


@pytest.mark.parametrize("strategy", ["replace", "append", "upsert", "update"])
def test_pipeline_strategies(spark, tmp_path, src, strategy):
    target = str(tmp_path / "t")
    pipe = _pipe(spark, tmp_path)
    pipe.run("mem", src, "lake", target, strategy="replace", key_columns=["id"])
    batch2 = spark.createDataFrame(
        [(2, "B2", 22.0), (9, "new", 99.0)], "id int, name string, v double"
    )
    pipe.run("mem", batch2, "lake", target, strategy=strategy, key_columns=["id"])
    rows = {r["id"]: r["name"] for r in LakeTable(spark, target).current().collect()}
    if strategy == "replace":
        assert rows == {2: "B2", 9: "new"}
    elif strategy == "append":
        assert len(LakeTable(spark, target).current().collect()) == 5
    elif strategy == "upsert":
        assert rows == {1: "a", 2: "B2", 3: "c", 9: "new"}
    else:  # update: never inserts
        assert rows == {1: "a", 2: "B2", 3: "c"}


def test_pipeline_transformer_chain_is_one_lazy_plan(spark, tmp_path, src):
    target = str(tmp_path / "t")
    pipe = _pipe(spark, tmp_path)
    pipe.add_transformer(CleanerTransformer())
    pipe.add_transformer(FnTransformer(lambda df: df.where(F.col("v") > 15)))
    pipe.add_transformer(
        MappingTransformer({"calculations": [{"name": "v2", "formula": "v * 2"}]})
    )
    df = pipe.run("mem", src, "lake", target, strategy="replace")
    assert set(df.columns) == {"id", "name", "v", "v2"}
    out = {r["id"]: r["v2"] for r in LakeTable(spark, target).current().collect()}
    assert out == {2: 40.0, 3: 60.0}


def test_pipeline_audit_records_rows_processed(spark, tmp_path, src):
    target = str(tmp_path / "t")
    pipe = _pipe(spark, tmp_path)
    pipe.run("mem", src, "lake", target, strategy="replace")
    audit = LakeTable(spark, str(tmp_path / "audit_table")).current().collect()
    runs = [r for r in audit if r["event_type"] == "pipeline_execution"]
    assert len(runs) == 1 and runs[0]["success"]
    details = json.loads(runs[0]["details"])
    assert details["rows_processed"] == 3  # from observe(), no extra pass
    assert details["pipeline"] == "mem_to_lake"


def test_rbac_denies_unauthorized_transform_and_audits(spark, tmp_path, src):
    """VIEWER cannot TRANSFORM: the transformer is skipped (reference
    behavior) and a permission_denied audit row is written."""
    ac = AccessController(users_config="eve:viewer;admin:admin")
    ac.add_user("op-no-transform", set())  # registered but no roles at all
    target = str(tmp_path / "t")
    pipe = _pipe(spark, tmp_path, username="eve", access_controller=ac)
    pipe.add_transformer(FnTransformer(lambda df: df.drop("v"), name="DropV"))
    # viewer lacks EXECUTE_PIPELINE entirely
    with pytest.raises(PermissionError):
        pipe.run("mem", src, "lake", target, strategy="replace")
    # the denial is flushed to the audit table before the raise
    audit = LakeTable(spark, str(tmp_path / "audit_table")).current().collect()
    denied = [r for r in audit if r["event_type"] == "permission_denied"]
    assert denied and json.loads(denied[0]["details"])["operation"] == "execute_pipeline"


def test_rbac_operator_runs_but_skips_denied_stage_never_happens(spark, tmp_path, src):
    """OPERATOR has all pipeline ops: the transformer runs."""
    ac = AccessController(users_config="op:operator")
    target = str(tmp_path / "t")
    pipe = _pipe(spark, tmp_path, username="op", access_controller=ac)
    pipe.add_transformer(FnTransformer(lambda df: df.drop("v"), name="DropV"))
    pipe.run("mem", src, "lake", target, strategy="replace")
    assert "v" not in LakeTable(spark, target).current().columns


def test_rbac_roles_matrix():
    ac = AccessController(users_config="v:viewer;o:operator;aud:auditor")
    from etl_framework_spark.security import Operation

    assert not ac.check_permission("v", Operation.EXECUTE_PIPELINE)
    assert ac.check_permission("o", Operation.EXECUTE_PIPELINE)
    assert not ac.check_permission("o", Operation.VIEW_AUDIT_LOGS)
    assert ac.check_permission("aud", Operation.VIEW_AUDIT_LOGS)
    assert not ac.check_permission("ghost", Operation.READ_CONFIG)


def test_load_options_three_level_precedence():
    opts = LoadOptions.resolve(
        cli={"strategy": "upsert", "key_columns": None},
        mapping={"strategy": "append", "key_columns": ["k"], "n_buckets": 16},
        env={"strategy": "replace", "key_columns": ["envk"], "n_buckets": 64,
             "drop_duplicates": True},
    )
    assert opts.strategy is LoadStrategy.UPSERT      # CLI wins
    assert opts.key_columns == ["k"]                 # mapping beats env
    assert opts.n_buckets == 16                      # mapping beats env
    assert opts.drop_duplicates is True              # env only


def test_load_options_validation():
    with pytest.raises(ValueError, match="requires key_columns"):
        LoadOptions(strategy="upsert")
    with pytest.raises(ValueError, match="invalid key column"):
        LoadOptions(strategy="upsert", key_columns=["bad name; drop"])


def test_strategy_string_strictness(spark, tmp_path, src):
    """A typo'd strategy RAISES everywhere except run_legacy: the
    reference's silent fall-back-to-REPLACE
    (reference:core/load_strategy.py:27-38) turns 'upsrt' into a table
    drop — modern entry points refuse; run_legacy keeps parity."""
    with pytest.raises(ValueError, match="unknown load strategy"):
        strategy_from_string("upsrt")
    with pytest.raises(ValueError, match="unknown load strategy"):
        LoadOptions(strategy="upsrt", key_columns=["id"])
    assert strategy_from_string("upsrt", fallback=True) is LoadStrategy.REPLACE
    assert strategy_from_string(None) is LoadStrategy.REPLACE

    target = str(tmp_path / "t")
    pipe = _pipe(spark, tmp_path)
    pipe.run("mem", src, "lake", target, strategy="replace", key_columns=["id"])
    before = LakeTable(spark, target).current().count()
    with pytest.raises(ValueError, match="unknown load strategy"):
        pipe.run("mem", src.limit(1), "lake", target, strategy="upsrt")
    # the typo'd run must not have REPLACEd (dropped) the table
    assert LakeTable(spark, target).current().count() == before
    # run_legacy: reference behavior, unknown string falls back to REPLACE
    pipe.run_legacy("mem", src.limit(1), "lake", target, strategy="upsrt")
    assert LakeTable(spark, target).current().count() == 1


def test_cli_rejects_unknown_strategy(spark, tmp_path, src):
    """--strategy itself is argparse-choice-guarded (SystemExit); the
    typo path is the mapping file's loading_strategy block — it must
    raise, not silently REPLACE."""
    from etl_framework_spark.cli import main

    csv_dir = str(tmp_path / "in.csv")
    src.write.option("header", True).csv(csv_dir)
    mpath = tmp_path / "mapping.json"
    mpath.write_text(json.dumps({"loading_strategy": {"strategy": "upsrt"}}))
    with pytest.raises(ValueError, match="unknown load strategy"):
        main(
            [
                "--source", csv_dir,
                "--extractor", "csv",
                "--loader", "lake",
                "--target", str(tmp_path / "t"),
                "--mapping", str(mpath),
            ]
        )
    with pytest.raises(SystemExit):  # argparse choice guard
        main(
            [
                "--source", csv_dir,
                "--target", str(tmp_path / "t"),
                "--strategy", "upsrt",
            ]
        )


def test_load_options_from_env():
    env = {
        "ETL_LOAD_STRATEGY": "append",
        "ETL_KEY_COLUMNS": "a, b",
        "ETL_N_BUCKETS": "8",
        "ETL_DROP_DUPLICATES": "true",
    }
    p = LoadOptions.from_env(env)
    assert p == {
        "strategy": "append",
        "key_columns": ["a", "b"],
        "n_buckets": 8,
        "drop_duplicates": True,
    }


def test_cli_end_to_end(spark, tmp_path, src):
    """CLI parity (reference cli/main.py:137-241): csv source -> mapping
    transform -> lake target under upsert, mapping file supplying the
    strategy (level-2 precedence)."""
    from etl_framework_spark.cli import main

    csv_dir = str(tmp_path / "in.csv")
    src.write.option("header", True).csv(csv_dir)
    mapping = {
        "calculations": [{"name": "doubled", "formula": "v * 2"}],
        "loading_strategy": {"strategy": "upsert", "key_columns": ["id"]},
    }
    mpath = tmp_path / "mapping.json"
    mpath.write_text(json.dumps(mapping))
    target = str(tmp_path / "t")
    rc = main(
        [
            "--source", csv_dir,
            "--extractor", "csv",
            "--loader", "lake",
            "--target", target,
            "--mapping", str(mpath),
        ]
    )
    assert rc == 0
    rows = {r["id"]: r["doubled"] for r in LakeTable(spark, target).current().collect()}
    assert rows == {1: 20.0, 2: 40.0, 3: 60.0}


def test_file_loader_modes(spark, tmp_path, src):
    pipe = Pipeline(spark, enable_security=False)
    pipe.register_extractor("mem", DataFrameExtractor())
    pipe.register_loader("file", FileLoader(format="parquet"))
    out = str(tmp_path / "out.parquet")
    pipe.run("mem", src, "file", out, strategy="replace")
    assert spark.read.parquet(out).count() == 3
    with pytest.raises(Exception):  # FAIL on existing
        pipe.run("mem", src, "file", out, strategy="fail")
    with pytest.raises(ValueError, match="keyed strategies"):
        pipe.run("mem", src, "file", out, strategy="upsert", key_columns=["id"])


# ---------------------------------------------------------------- grouped


def test_grouped_validator_flags_dups_and_gaps(spark):
    from etl_framework_spark.operators.grouped import validate_conversation_turns

    rows = [
        # conv ok: contiguous 0..2, alternating roles
        ("ok", 0, "user", "2026-01-01 00:00:00"),
        ("ok", 1, "assistant", "2026-01-01 00:00:10"),
        ("ok", 2, "user", "2026-01-01 00:01:10"),
        # conv bad: duplicate turn 1, missing turn 2, repeated role
        ("bad", 0, "user", "2026-01-01 00:00:00"),
        ("bad", 1, "user", "2026-01-01 00:00:05"),
        ("bad", 1, "assistant", "2026-01-01 00:00:06"),
        ("bad", 3, "assistant", "2026-01-01 00:00:09"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["conv_id"]: r for r in validate_conversation_turns(df).collect()}
    ok, bad = out["ok"], out["bad"]
    assert ok["valid"] and ok["n_missing"] == 0 and ok["n_dup_turns"] == 0
    assert ok["role_repeats"] == 0 and ok["max_gap_seconds"] == 60.0
    assert not bad["valid"]
    assert bad["n_dup_turns"] == 1
    assert bad["n_missing"] == 1  # turn 2 absent (4 turns, max=3, 3 distinct)
    assert bad["role_repeats"] == 2  # user,user and assistant,assistant


def test_grouped_apply_arbitrary_fn(spark):
    import pandas as pd

    from etl_framework_spark.operators.grouped import grouped_apply

    df = spark.createDataFrame([(1, 2.0), (1, 4.0), (2, 10.0)], "k int, v double")

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["v"] = pdf["v"] - pdf["v"].mean()
        return pdf

    out = grouped_apply(df, ["k"], demean, "k int, v double").collect()
    got = sorted((r["k"], r["v"]) for r in out)
    assert got == [(1, -1.0), (1, 1.0), (2, 0.0)]


def test_security_config_auto_encrypts_sensitive_columns(spark, tmp_path):
    """With encryption enabled via config, name-matched sensitive
    columns are encrypted lazily inside the same load plan and the
    transformation is audited (reference pipeline.py:189-235); the
    ciphertext round-trips through decrypt_columns."""
    from etl_framework_spark.security import SecurityConfig
    from etl_framework_spark.transforms.crypto import decrypt_columns

    cfg = SecurityConfig(encryption_enabled=True, encryption_key="k" * 16)
    pipe = _pipe(spark, tmp_path, security_config=cfg)
    src = spark.createDataFrame(
        [(1, "alice@example.com", "x")], "id int, email string, note string"
    )
    target = str(tmp_path / "t")
    pipe.run("mem", src, "lake", target, strategy="replace")
    row = LakeTable(spark, target).current().head()
    assert row["email"] != "alice@example.com" and row["note"] == "x"
    dec = decrypt_columns(
        LakeTable(spark, target).current(), ["email"], "k" * 16
    ).head()
    assert dec["email"] == "alice@example.com"
    audit = LakeTable(spark, str(tmp_path / "audit_table")).current().collect()
    assert any(r["event_type"] == "data_modification" for r in audit)


def test_path_validation_rejects_traversal_and_bad_extension(spark, tmp_path):
    from etl_framework_spark.security import validate_file_path

    pipe = _pipe(spark, tmp_path)
    with pytest.raises(ValueError, match="traversal"):
        pipe.run("mem", "../../etc/passwd.csv", "lake", str(tmp_path / "t"))
    with pytest.raises(ValueError, match="not allowed"):
        validate_file_path("/data/in.exe", "read")
    assert validate_file_path("/lake/mytable", "write")  # extension-less: table dir


@pytest.mark.performance
def test_pipeline_throughput_floor(spark, tmp_path):
    """Reference performance floor: a 50k-row pipeline must sustain
    >1,000 rows/s (reference:tests/functional/workflows/
    test_business_workflow.py:323-330). The Spark engine clears it by
    orders of magnitude; the assertion pins the parity contract."""
    import time

    src = spark.range(50_000).selectExpr(
        "id", "CAST(id % 97 AS DOUBLE) AS v", "CAST(id AS STRING) AS name"
    )
    pipe = Pipeline(spark, enable_security=False)
    pipe.register_extractor("mem", DataFrameExtractor())
    pipe.register_loader("lake", LakeLoader(spark, n_buckets=4))
    pipe.add_transformer(
        MappingTransformer({"calculations": [{"name": "v2", "formula": "v * 2"}]})
    )
    t0 = time.perf_counter()
    pipe.run("mem", src, "lake", str(tmp_path / "t"), strategy="replace")
    dt = time.perf_counter() - t0
    assert 50_000 / dt > 1_000, f"{50_000 / dt:.0f} rows/s below reference floor"


@pytest.mark.performance
def test_encryption_throughput_floor(spark):
    """Reference: encrypt 10k rows in <5 s
    (reference:tests/unit/security/test_encryption_unit.py:231-233)."""
    import time

    from etl_framework_spark.transforms.crypto import decrypt_columns, encrypt_columns

    df = spark.range(10_000).selectExpr("id", "CAST(id AS STRING) AS email")
    t0 = time.perf_counter()
    enc = encrypt_columns(df, ["email"], "k" * 16)
    n = enc.count()
    assert time.perf_counter() - t0 < 5 and n == 10_000
    dec = decrypt_columns(enc, ["email"], "k" * 16)
    assert dec.where("email = CAST(id AS STRING)").count() == 10_000


def test_cli_json_string_input(spark, tmp_path):
    """Reference CLI --json-string/--json-path parity
    (reference:src/etl_framework/cli/main.py:148-187)."""
    import json as _json

    from etl_framework_spark.cli import main

    payload = _json.dumps(
        {"data": {"results": [{"id": 1, "meta": {"score": 0.5}}, {"id": 2, "meta": {"score": 0.9}}]}}
    )
    target = str(tmp_path / "t")
    rc = main(
        [
            "--json-string", payload,
            "--extractor", "json",
            "--json-path", "data.results",
            "--loader", "lake",
            "--target", target,
            "--strategy", "replace",
        ]
    )
    assert rc == 0
    rows = {r["id"]: r["meta_score"] for r in LakeTable(spark, target).current().collect()}
    assert rows == {1: 0.5, 2: 0.9}


def test_unconfigured_access_control_denies_non_admin():
    """With no ETL_USERS only 'admin' exists — no implicit 'system'
    principal, so a default security gate is not a no-op (ADVICE r2)."""
    from etl_framework_spark.security import Operation

    ac = AccessController(users_config="")
    assert ac.check_permission("admin", Operation.EXECUTE_PIPELINE)
    assert not ac.check_permission("system", Operation.EXECUTE_PIPELINE)


def test_audit_buffer_clears_without_table_sink(spark, tmp_path):
    """flush() must not accumulate events forever when only the JSONL
    sink is configured (ADVICE r2): events are durable in the file at
    log time."""
    from etl_framework_spark.security import AuditLogger

    log = AuditLogger(log_file=str(tmp_path / "a.jsonl"), table_path=None)
    log.log_event("x", "admin", {"i": 1})
    assert len(log.pending) == 1
    assert log.flush(spark) is None
    assert log.pending == []
    # events survived in the JSONL file
    assert len((tmp_path / "a.jsonl").read_text().strip().splitlines()) == 1


def test_audit_memory_only_config_keeps_buffer_on_flush(spark):
    """Memory-only audit (no JSONL, no table): the buffer IS the trail —
    flush must not discard it (ADVICE r3)."""
    from etl_framework_spark.security import AuditLogger

    log = AuditLogger(log_file=None, table_path=None)
    log.log_event("x", "admin", {"i": 1})
    assert log.flush(spark) is None
    assert len(log.pending) == 1


def test_audit_memory_only_buffer_is_bounded(spark, monkeypatch):
    """Memory-only audit is the DEFAULT secure-pipeline config, so the
    kept buffer must be a bounded ring (newest win, evictions counted) —
    a week-long scheduler process cannot grow it without limit."""
    from etl_framework_spark.security import AuditLogger

    monkeypatch.setattr(AuditLogger, "MAX_MEMORY_EVENTS", 50)
    log = AuditLogger(log_file=None, table_path=None)
    for i in range(80):
        log.log_event("x", "admin", {"i": i})
    assert len(log.pending) == 50
    assert log.dropped_events == 30
    kept = [json.loads(r["details"])["i"] for r in log.pending]
    assert kept == list(range(30, 80))  # newest survive, in order


def test_json_string_extractor_path_errors(spark):
    from etl_framework_spark.pipeline import JsonStringExtractor

    with pytest.raises(ValueError, match="not found"):
        JsonStringExtractor("nope.missing").extract(spark, '{"a": 1}')


def test_xlsx_sink_row_cap_enforced(spark, tmp_path, monkeypatch):
    """The xlsx sink's documented ~10^6-row cap is a GUARD, not an
    assumption (r2 verdict note): oversized inputs fail loudly with
    bounded driver memory (limit(cap+1) probe)."""
    import etl_framework_spark.pipeline as plmod

    pipe = Pipeline(spark, enable_security=False)
    pipe.register_extractor("mem", DataFrameExtractor())
    pipe.register_loader("xlsx", FileLoader(format="xlsx"))
    df = spark.range(0, 50).selectExpr("id", "CAST(id AS STRING) AS s")
    out = str(tmp_path / "o.xlsx")

    monkeypatch.setattr(plmod, "XLSX_MAX_ROWS", 10)
    with pytest.raises(ValueError, match="caps at 10"):
        pipe.run("mem", df, "xlsx", out, strategy="replace")
    assert not (tmp_path / "o.xlsx").exists()

    monkeypatch.setattr(plmod, "XLSX_MAX_ROWS", 1_000_000)
    pipe.run("mem", df, "xlsx", out, strategy="replace")
    from etl_framework_spark.sources import read_excel

    assert read_excel(spark, out).count() == 50
