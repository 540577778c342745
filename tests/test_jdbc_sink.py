"""JDBC sink: write-mode mapping and generated merge SQL, against a
mocked connection (the sandbox has no JDBC driver jar — an honest
injection seam, not a stub: SQL generation is the testable logic,
statement execution is one Statement.execute loop).

Where a dialect is available in-process (DuckDB speaks enough
postgres-flavored SQL), the generated statements are additionally
EXECUTED to prove they are well-formed and set-based-correct.
"""

from __future__ import annotations

import pytest

from etl_framework_spark.operators.load_strategies import LoadStrategy
from etl_framework_spark.sinks import JdbcLoader, build_merge_sql


class Recorder:
    def __init__(self):
        self.writes: list[tuple[str, str, int]] = []
        self.statements: list[str] = []

    def writer(self, df, table, mode):
        self.writes.append((table, mode, df.count()))

    def executor(self, stmts):
        self.statements.extend(stmts)


def _loader(url="jdbc:postgresql://db:5432/x"):
    r = Recorder()
    return JdbcLoader(url, executor=r.executor, writer=r.writer), r


@pytest.fixture()
def batch(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id int, name string, v double"
    )


def test_simple_strategies_map_to_write_modes(batch):
    for strategy, mode in [("fail", "error"), ("replace", "overwrite"), ("append", "append")]:
        loader, rec = _loader()
        loader.load(batch, "tgt", strategy=strategy)
        assert rec.writes == [("tgt", mode, 2)]
        assert rec.statements == []


def test_upsert_stages_once_and_merges_postgres(batch):
    loader, rec = _loader()
    loader.load(batch, "tgt", strategy="upsert", key_columns=["id"])
    assert rec.writes == [("tgt__etl_stage", "overwrite", 2)]
    sql = "\n".join(rec.statements)
    assert 'CREATE TABLE IF NOT EXISTS "tgt"' in sql
    assert 'ON CONFLICT ("id") DO UPDATE SET' in sql
    assert '"name" = EXCLUDED."name"' in sql and '"v" = EXCLUDED."v"' in sql
    assert rec.statements[-1] == 'DROP TABLE "tgt__etl_stage"'
    # set-based: exactly one merge statement, no per-row anything
    assert len(rec.statements) == 3


def test_upsert_mysql_dialect(batch):
    loader, rec = _loader("jdbc:mysql://db/x")
    loader.load(batch, "tgt", strategy="upsert", key_columns=["id"])
    sql = "\n".join(rec.statements)
    assert "ON DUPLICATE KEY UPDATE" in sql and "`name` = VALUES(`name`)" in sql


def test_update_never_inserts(batch):
    loader, rec = _loader()
    loader.load(batch, "tgt", strategy="update", key_columns=["id"])
    sql = "\n".join(rec.statements)
    assert "UPDATE" in sql and "INSERT" not in sql.replace("CREATE", "")


def test_generic_dialect_update_then_insert():
    stmts = build_merge_sql(
        "generic", "t", "s", ["id", "v"], ["id"], insert_unmatched=True
    )
    assert len(stmts) == 2
    assert stmts[0].startswith("UPDATE")
    assert "WHERE NOT EXISTS" in stmts[1]


def test_identifier_validation(batch):
    loader, _ = _loader()
    with pytest.raises(ValueError, match="invalid SQL identifier"):
        loader.load(batch, 'tgt"; DROP TABLE x', strategy="replace")
    with pytest.raises(ValueError, match="requires key_columns"):
        loader.load(batch, "tgt", strategy="upsert")


def test_generated_sql_executes_and_merges_correctly(spark, batch):
    """Execute the postgres-flavor statements on DuckDB: stage rows merge
    into the target set-based — matched keys update, unmatched insert,
    UPDATE-only never inserts."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE tgt (id INT, name VARCHAR, v DOUBLE)")
    con.execute("CREATE UNIQUE INDEX tgt_pk ON tgt (id)")
    con.execute("INSERT INTO tgt VALUES (1, 'old', 1.0), (9, 'keep', 9.0)")
    con.execute("CREATE TABLE stage (id INT, name VARCHAR, v DOUBLE)")
    con.execute("INSERT INTO stage VALUES (1, 'a', 10.0), (2, 'b', 20.0)")

    for stmt in build_merge_sql(
        "postgresql", "tgt", "stage", ["id", "name", "v"], ["id"], True
    ):
        con.execute(stmt)
    rows = dict(
        (r[0], (r[1], r[2])) for r in con.execute("SELECT * FROM tgt").fetchall()
    )
    assert rows == {1: ("a", 10.0), 2: ("b", 20.0), 9: ("keep", 9.0)}

    # UPDATE-only from a fresh stage: existing row changes, no inserts
    con.execute("DELETE FROM stage")
    con.execute("INSERT INTO stage VALUES (9, 'KEPT', 99.0), (77, 'new', 7.0)")
    for stmt in build_merge_sql(
        "postgresql", "tgt", "stage", ["id", "name", "v"], ["id"], False
    ):
        con.execute(stmt)
    rows = dict(
        (r[0], (r[1], r[2])) for r in con.execute("SELECT * FROM tgt").fetchall()
    )
    assert rows[9] == ("KEPT", 99.0) and 77 not in rows and len(rows) == 3


def test_composite_key_merge_executes(spark):
    """Composite-key UPSERT SQL is well-formed and set-based-correct
    (executed on DuckDB)."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE tgt (a INT, b INT, v VARCHAR)")
    con.execute("CREATE UNIQUE INDEX tgt_pk ON tgt (a, b)")
    con.execute("INSERT INTO tgt VALUES (1, 1, 'old'), (2, 2, 'keep')")
    con.execute("CREATE TABLE stage (a INT, b INT, v VARCHAR)")
    con.execute("INSERT INTO stage VALUES (1, 1, 'new'), (3, 3, 'ins')")
    for stmt in build_merge_sql(
        "postgresql", "tgt", "stage", ["a", "b", "v"], ["a", "b"], True
    ):
        con.execute(stmt)
    rows = {(r[0], r[1]): r[2] for r in con.execute("SELECT * FROM tgt").fetchall()}
    assert rows == {(1, 1): "new", (2, 2): "keep", (3, 3): "ins"}


def test_upsert_all_key_columns_degenerates_to_insert_ignore():
    """Every column a key: nothing to update — postgres path emits
    DO NOTHING, mysql emits a no-op assignment."""
    pg = build_merge_sql("postgresql", "t", "s", ["k1", "k2"], ["k1", "k2"], True)
    assert len(pg) == 1 and "DO NOTHING" in pg[0]
    my = build_merge_sql("mysql", "t", "s", ["k1", "k2"], ["k1", "k2"], True)
    assert len(my) == 1 and "ON DUPLICATE KEY UPDATE" in my[0]
    # UPDATE-only with no non-key columns: no statements at all
    assert build_merge_sql("postgresql", "t", "s", ["k"], ["k"], False) == []


def test_schema_qualified_target(batch):
    """analytics.orders is a legal JDBC target; each part is validated
    and quoted separately. Injection via a dotted name still rejected."""
    loader, rec = _loader()
    loader.load(batch, "analytics.tgt", strategy="upsert", key_columns=["id"])
    sql = "\n".join(rec.statements)
    assert '"analytics"."tgt"' in sql
    assert '"analytics"."tgt__etl_stage"' in sql
    with pytest.raises(ValueError, match="invalid SQL identifier"):
        loader.load(batch, 'a.b"; DROP TABLE x', strategy="replace")
    with pytest.raises(ValueError, match="invalid SQL identifier"):
        loader.load(batch, "a.b.c", strategy="replace")
