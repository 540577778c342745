"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01, then compares row count,
column names, and values (rows sorted by all columns, columns sorted by
name) — a stricter local predictor of the driver's value-hash compare.

Usage: python scripts/check_entry.py [--no-arrow] [sf_dir] [query ...]

``--no-arrow`` disables Arrow conversion for the whole session, mirroring
the driver's harness (a plain ``SparkSession`` without the repo's Arrow
config). The round-3 red row (``cdc_changes_feed``) only reproduced in
that mode — non-Arrow ``createDataFrame`` rejects pandas' float64
promotion of nullable long columns — so both modes must stay green.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from etl_framework_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        problems.append(f"columns {sorted(got.columns)} != {sorted(exp.columns)}")
        return problems
    if len(got) != len(exp):
        problems.append(f"rows {len(got)} != {len(exp)}")
    g, e = normalize(got), normalize(exp)
    if len(g) == len(e):
        for c in g.columns:
            if not g[c].equals(e[c]):
                neq = (g[c].astype(str) != e[c].astype(str)).to_numpy().nonzero()[0][:3]
                sample = [(g[c].iloc[i], e[c].iloc[i]) for i in neq]
                # dtype note helps diagnose long-vs-int / hugeint issues
                problems.append(
                    f"col {c} differs (dtypes {g[c].dtype}/{e[c].dtype}) e.g. {sample}"
                )
    return problems


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--no-arrow"]
    no_arrow = "--no-arrow" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    spark = get_spark(app_name="check_entry")
    if no_arrow:
        # Mirror the driver harness: no Arrow on either conversion path.
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
        print("mode: arrow DISABLED (driver-harness emulation)")
    con = duckdb.connect()
    for t in entrymod.REPO_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark raised {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: duckdb raised {ex}")
            failures += 1
            continue
        problems = compare(name, got, exp)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name}: {len(got)} rows")

    # smoke entry()
    if not only:
        n = entrymod.entry(spark).count()
        print(f"entry(): {n} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
