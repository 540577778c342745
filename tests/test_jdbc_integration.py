"""Full-path JDBC integration: Spark's parallel JDBC writer plus the
JVM-DriverManager merge execution, against a REAL database.

The unit tests in test_jdbc_sink.py inject writer/executor and verify
generated SQL (executing it on python-duckdb); this module removes every
injection and drives ``JdbcLoader``'s default path — ``df.write.jdbc``
partition connections, ``java.sql.DriverManager`` statement execution,
the real existence probe, loader-side table pre-creation — end to end
over DuckDB's JDBC driver jar.

Jar discovery: ``$SPARK_GRAFT_JDBC_JAR``, else any ``*jdbc*.jar`` under
``~/.cache/coursier``. Tests SKIP when no jar is found, so the module is
a no-op on machines without one; where a jar exists (including this
sandbox) the real execution path is covered. To run against another
DBMS: ``SPARK_GRAFT_JDBC_JAR=/path/postgresql.jar
SPARK_GRAFT_JDBC_URL=jdbc:postgresql://host/db pytest -m jdbc``.

The scenario runs in a SUBPROCESS with its own SparkSession because the
driver jar must be on the JVM classpath at launch
(``--driver-class-path``); the suite's shared session cannot take it on
after the fact.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.jdbc


def _find_jar() -> str | None:
    env = os.environ.get("SPARK_GRAFT_JDBC_JAR")
    if env and os.path.exists(env):
        return env
    hits = glob.glob(
        os.path.expanduser("~/.cache/coursier/**/*jdbc*.jar"), recursive=True
    )
    # prefer an embedded database driver (no server needed)
    for h in hits:
        if "duckdb" in os.path.basename(h) or "sqlite" in os.path.basename(h):
            return h
    return None


_SCENARIO = r"""
import glob, json, os, sys
sys.path.insert(0, {repo!r})
jar = {jar!r}
os.environ["PYSPARK_SUBMIT_ARGS"] = (
    f"--driver-memory 2g --driver-class-path {{jar}} --jars {{jar}} pyspark-shell"
)
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName("jdbc-integration")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from etl_framework_spark.sinks.jdbc import JdbcLoader

url = {url!r}
loader = JdbcLoader(url)
out = {{}}

df = spark.createDataFrame(
    [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
    "id int, name string, amount double",
).repartition(2)  # >1 partition: one JDBC connection per partition

# 1. APPEND to a missing target: loader pre-creates, parallel writer lands
loader.load(df, "tgt", "append")
out["append_count"] = spark.read.jdbc(url, "tgt").count()

# 2. FAIL to the now-existing target must raise
try:
    loader.load(df, "tgt", "fail")
    out["fail_raised"] = False
except ValueError:
    out["fail_raised"] = True

# 3. UPSERT: stage table + set-based merge through DriverManager
up = spark.createDataFrame(
    [(1, "a", 99.0), (5, "e", 50.0)], "id int, name string, amount double"
)
loader.load(up, "tgt", "upsert", key_columns=["id"])
out["upsert"] = {{
    int(r["id"]): r["amount"] for r in spark.read.jdbc(url, "tgt").collect()
}}

# 4. UPDATE-only: changes matched rows, never inserts
upd = spark.createDataFrame(
    [(2, "b", -1.0), (6, "zz", 0.0)], "id int, name string, amount double"
)
loader.load(upd, "tgt", "update", key_columns=["id"])
out["update"] = {{
    int(r["id"]): r["amount"] for r in spark.read.jdbc(url, "tgt").collect()
}}

# 5. UPSERT to a MISSING target: created with PRIMARY KEY, then merged
loader.load(up, "tgt2", "upsert", key_columns=["id"])
loader.load(up.withColumn("amount", up.amount + 1), "tgt2", "upsert", key_columns=["id"])
out["tgt2"] = {{
    int(r["id"]): r["amount"] for r in spark.read.jdbc(url, "tgt2").collect()
}}

# 6. REPLACE overwrites in place
loader.load(up, "tgt", "replace")
out["replace_count"] = spark.read.jdbc(url, "tgt").count()

# 7. every uuid-suffixed stage table was reaped
out["leftover_stages"] = spark.read.jdbc(
    url,
    "(SELECT table_name FROM information_schema.tables "
    "WHERE table_name LIKE '%etl_stage%') s",
).count()

print("RESULT:" + json.dumps(out))
spark.stop()
"""


@pytest.fixture(scope="module")
def scenario(tmp_path_factory):
    jar = _find_jar()
    if jar is None:
        pytest.skip("no JDBC driver jar found (set SPARK_GRAFT_JDBC_JAR)")
    url = os.environ.get("SPARK_GRAFT_JDBC_URL")
    if url is None:
        db = tmp_path_factory.mktemp("jdbcdb") / "it.duckdb"
        if "duckdb" in os.path.basename(jar):
            url = f"jdbc:duckdb:{db}"
        elif "sqlite" in os.path.basename(jar):
            url = f"jdbc:sqlite:{db}"
        else:
            pytest.skip("server-DB jar needs SPARK_GRAFT_JDBC_URL")
    code = _SCENARIO.format(repo=str(REPO), jar=jar, url=url)
    env = {k: v for k, v in os.environ.items() if k != "PYSPARK_SUBMIT_ARGS"}
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(REPO),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")][-1]
    return json.loads(line[len("RESULT:") :])


def test_parallel_append_creates_and_lands(scenario):
    assert scenario["append_count"] == 4


def test_fail_strategy_raises_on_existing_target(scenario):
    assert scenario["fail_raised"] is True


def test_upsert_merges_matched_and_unmatched(scenario):
    assert scenario["upsert"] == {"1": 99.0, "2": 20.0, "3": 30.0, "4": 40.0, "5": 50.0}


def test_update_only_never_inserts(scenario):
    assert scenario["update"]["2"] == -1.0
    assert "6" not in scenario["update"]
    assert len(scenario["update"]) == 5


def test_upsert_missing_target_gets_primary_key(scenario):
    # second upsert over the created-with-PK table updated, not duplicated
    assert scenario["tgt2"] == {"1": 100.0, "5": 51.0}


def test_replace_overwrites(scenario):
    assert scenario["replace_count"] == 2


def test_stage_tables_reaped(scenario):
    assert scenario["leftover_stages"] == 0
