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
    assert len(rec.writes) == 1
    stage, mode, n = rec.writes[0]
    # uuid-suffixed stage: concurrent loads can't clobber each other
    assert stage.startswith("tgt__etl_stage_") and len(stage) > len("tgt__etl_stage_")
    assert (mode, n) == ("overwrite", 2)
    sql = "\n".join(rec.statements)
    assert 'ON CONFLICT ("id") DO UPDATE SET' in sql
    assert '"name" = EXCLUDED."name"' in sql and '"v" = EXCLUDED."v"' in sql
    assert rec.statements[-1] == f'DROP TABLE IF EXISTS "{stage}"'
    # set-based: exactly one merge statement + the stage drop
    assert len(rec.statements) == 2


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
    assert '"analytics"."tgt__etl_stage_' in sql
    with pytest.raises(ValueError, match="invalid SQL identifier"):
        loader.load(batch, 'a.b"; DROP TABLE x', strategy="replace")
    with pytest.raises(ValueError, match="invalid SQL identifier"):
        loader.load(batch, "a.b.c", strategy="replace")


def test_update_missing_target_replaces_with_data(batch):
    """Reference parity (sql_loader.py:236-239): UPDATE to a missing
    target replaces with the batch — it must NOT create an empty table
    and silently drop the rows (ADVICE r3 medium)."""
    rec = Recorder()
    loader = JdbcLoader(
        "jdbc:postgresql://db:5432/x",
        executor=rec.executor,
        writer=rec.writer,
        exists=lambda t: False,
    )
    loader.load(batch, "tgt", strategy="update", key_columns=["id"])
    assert rec.writes == [("tgt", "overwrite", 2)]
    assert rec.statements == []  # no stage, no merge


def test_upsert_missing_target_creates_with_primary_key(batch):
    """UPSERT to a missing target creates it WITH a PRIMARY KEY on the
    merge keys, so this merge and every later one has its ON CONFLICT
    constraint (ADVICE r3 medium)."""
    rec = Recorder()
    loader = JdbcLoader(
        "jdbc:postgresql://db:5432/x",
        executor=rec.executor,
        writer=rec.writer,
        exists=lambda t: False,
    )
    loader.load(batch, "tgt", strategy="upsert", key_columns=["id"])
    create = rec.statements[0]
    assert create.startswith('CREATE TABLE IF NOT EXISTS "tgt" (')
    assert '"id" INTEGER' in create and '"v" DOUBLE PRECISION' in create
    assert 'PRIMARY KEY ("id")' in create
    assert "ON CONFLICT" in rec.statements[1]


def test_stage_dropped_even_when_merge_fails(batch):
    """The stage table is reaped in a finally — a failed merge must not
    leak it (ADVICE r3 low)."""
    drops: list[str] = []

    def failing_executor(stmts):
        for s in stmts:
            if s.startswith("DROP TABLE IF EXISTS"):
                drops.append(s)
            else:
                raise RuntimeError("merge blew up")

    rec = Recorder()
    loader = JdbcLoader(
        "jdbc:postgresql://db:5432/x", executor=failing_executor, writer=rec.writer
    )
    with pytest.raises(RuntimeError, match="merge blew up"):
        loader.load(batch, "tgt", strategy="upsert", key_columns=["id"])
    assert len(drops) == 1 and drops[0].startswith('DROP TABLE IF EXISTS "tgt__etl_stage_')


def test_fresh_target_upsert_executes_end_to_end(spark, batch):
    """The full fresh-target UPSERT path EXECUTED on DuckDB: typed
    CREATE with PK, merge, stage drop — then a SECOND upsert against the
    created table proves the constraint is real (the exact failure the
    old CTAS path had)."""
    import duckdb

    con = duckdb.connect()

    def executor(stmts):
        for s in stmts:
            con.execute(s)

    def writer(df, table, mode):
        pdf = df.toPandas()
        con.register("_batch", pdf)
        con.execute(f'CREATE OR REPLACE TABLE "{table}" AS SELECT * FROM _batch')
        con.unregister("_batch")

    def exists(t):
        try:
            con.execute(f'SELECT 1 FROM "{t}" WHERE 1 = 0')
            return True
        except duckdb.CatalogException:
            return False

    loader = JdbcLoader(
        "jdbc:postgresql://db:5432/x", executor=executor, writer=writer, exists=exists
    )
    loader.load(batch, "fresh", strategy="upsert", key_columns=["id"])
    rows = dict(
        (r[0], (r[1], r[2]))
        for r in con.execute('SELECT * FROM "fresh"').fetchall()
    )
    assert rows == {1: ("a", 10.0), 2: ("b", 20.0)}

    batch2 = spark.createDataFrame(
        [(2, "B2", 22.0), (3, "c", 30.0)], "id int, name string, v double"
    )
    loader.load(batch2, "fresh", strategy="upsert", key_columns=["id"])
    rows = dict(
        (r[0], (r[1], r[2]))
        for r in con.execute('SELECT * FROM "fresh"').fetchall()
    )
    assert rows == {1: ("a", 10.0), 2: ("B2", 22.0), 3: ("c", 30.0)}
    # no stage tables leaked
    leftover = con.execute(
        "SELECT table_name FROM information_schema.tables WHERE table_name LIKE '%etl_stage%'"
    ).fetchall()
    assert leftover == []


def test_missing_table_error_classifier():
    """Only a clear catalog miss counts as "table missing" — ambiguous
    probe failures (connection drop, lock timeout, permissions) must NOT,
    or an UPDATE load would route a live target to a destructive
    overwrite (round-4 review)."""
    from etl_framework_spark.sinks.jdbc import _is_missing_table_error

    missing = [
        'relation "tgt" does not exist',            # postgres / duckdb
        "Table 'db.tgt' doesn't exist",             # mysql
        "no such table: tgt",                       # sqlite
        "Table TGT not found",                      # h2
        "Invalid object name 'tgt'",                # sqlserver
        "Unknown table 'tgt'",                      # mysql DROP variant
    ]
    not_missing = [
        "Connection refused: connect",
        "Lock wait timeout exceeded; try restarting transaction",
        "permission denied for relation tgt",
        "I/O error while communicating with server",
    ]
    assert all(_is_missing_table_error(Exception(m)) for m in missing)
    assert not any(_is_missing_table_error(Exception(m)) for m in not_missing)


def test_create_table_sql_is_race_safe():
    """Two concurrent first loads both probe 'missing' and both emit the
    CREATE; the loser must no-op (IF NOT EXISTS / IF OBJECT_ID guard),
    not fail the whole load."""
    from pyspark.sql import types as T

    from etl_framework_spark.sinks.jdbc import build_create_table_sql

    schema = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("v", T.DoubleType()),
    ])
    for dialect in ("postgresql", "mysql", "sqlite", "generic"):
        sql = build_create_table_sql(dialect, "tgt", schema, ["id"])
        assert sql.startswith("CREATE TABLE IF NOT EXISTS"), (dialect, sql)
    # and the guarded CREATE actually no-ops on a second run (DuckDB)
    import duckdb

    con = duckdb.connect()
    sql = build_create_table_sql("postgresql", "tgt", schema, ["id"])
    con.execute(sql)
    con.execute(sql)  # loser of the race: must not raise
    assert con.execute("SELECT COUNT(*) FROM tgt").fetchone()[0] == 0


def test_missing_table_classifier_prefers_sqlstate():
    """SQLState, when the driver surfaces one, is authoritative over
    message text (round-4 ADVICE): 42P01/42S02/42102 classify as
    missing-table even with an odd message, and a NON-catalog SQLState
    wins over a message that pattern-matches "does not exist"."""
    from etl_framework_spark.sinks.jdbc import _is_missing_table_error

    class FakeJavaEx:
        def __init__(self, state):
            self._state = state

        def getSQLState(self):
            return self._state

        def getCause(self):
            return None

    class FakeWrapped(Exception):
        def __init__(self, msg, state):
            super().__init__(msg)
            self.java_exception = FakeJavaEx(state)

    assert _is_missing_table_error(FakeWrapped("boom", "42P01"))
    assert _is_missing_table_error(FakeWrapped("boom", "42S02"))
    assert _is_missing_table_error(FakeWrapped("boom", "42102"))
    # authoritative negative: connection failure state beats message text
    assert not _is_missing_table_error(
        FakeWrapped('relation "tgt" does not exist', "08006")
    )
    # oracle folds ORA-00942 into generic 42000 — an unrecognized
    # 42-class state must fall through to the noun-gated message check
    # (round-5 review), in BOTH directions
    assert _is_missing_table_error(
        FakeWrapped("ORA-00942: table or view does not exist", "42000")
    )
    assert not _is_missing_table_error(
        FakeWrapped("ORA-00904: invalid identifier", "42000")
    )


def test_missing_table_classifier_rejects_non_table_absence():
    """Generic absence verbs without a table-ish noun must NOT classify
    as missing-table (round-4 ADVICE): a missing DATABASE or a missing
    DRIVER CLASS otherwise routed UPDATE loads into replace-with-data."""
    from etl_framework_spark.sinks.jdbc import _is_missing_table_error

    not_missing = [
        'database "x" does not exist',
        "FATAL: database 'analytics' does not exist",
        "java.lang.ClassNotFoundException: org.postgresql.Driver not found",
        "role \"etl\" does not exist",
    ]
    assert not any(_is_missing_table_error(Exception(m)) for m in not_missing)


def test_cleanup_failure_does_not_mask_merge_error(batch):
    """When the merge fails AND the stage DROP also fails (same dead
    connection), the ORIGINAL merge error must propagate, not the
    cleanup's (round-4 ADVICE: the finally-block replaced it)."""
    def dead_connection(stmts):
        for s in stmts:
            if s.startswith("DROP TABLE IF EXISTS"):
                raise RuntimeError("connection is closed")
            raise RuntimeError("merge blew up")

    rec = Recorder()
    loader = JdbcLoader(
        "jdbc:postgresql://db:5432/x", executor=dead_connection, writer=rec.writer
    )
    with pytest.raises(RuntimeError, match="merge blew up"):
        loader.load(batch, "tgt", strategy="upsert", key_columns=["id"])


def test_cleanup_failure_on_success_path_still_raises(batch):
    """With the merge SUCCEEDED, a failed stage DROP leaks a table —
    that must surface loudly instead of being swallowed."""
    def drop_fails(stmts):
        for s in stmts:
            if s.startswith("DROP TABLE IF EXISTS"):
                raise RuntimeError("drop refused")

    rec = Recorder()
    loader = JdbcLoader(
        "jdbc:postgresql://db:5432/x", executor=drop_fails, writer=rec.writer
    )
    with pytest.raises(RuntimeError, match="drop refused"):
        loader.load(batch, "tgt", strategy="upsert", key_columns=["id"])
