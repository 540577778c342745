"""Command-line entry point: extract -> transform -> load in one command.

Spark-first parity with the reference CLI
(reference:src/etl_framework/cli/main.py:137-241): named extractor and
loader choices, a JSON mapping file for cleaning/calculations, load
strategies with key columns, and security flags — with LoadOptions
resolved at 3 precedence levels (CLI args > mapping file's
``loading_strategy`` block > ``ETL_*`` environment variables,
reference:src/etl_framework/cli/main.py:473-505).

Usage::

    python -m etl_framework_spark.cli \
        --source data.csv --extractor csv \
        --loader lake --target /lake/mytable \
        --strategy upsert --key-columns id \
        --mapping mapping.json

On a cluster: ``spark-submit --py-files etl_framework_spark.zip -m ...``
with ``SPARK_GRAFT_MASTER=cluster``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from etl_framework_spark.pipeline import (
    CleanerTransformer,
    CsvExtractor,
    FileLoader,
    JsonExtractor,
    LakeLoader,
    LoadOptions,
    MappingTransformer,
    ParquetExtractor,
    Pipeline,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="etl_framework_spark",
        description="Extract, transform, and load data with Spark.",
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--source", help="Source path (csv/json/parquet).")
    src.add_argument(
        "--json-string",
        help="Inline JSON payload to process instead of a source file.",
    )
    p.add_argument(
        "--extractor",
        default=os.getenv("ETL_DEFAULT_EXTRACTOR", "csv"),
        choices=["csv", "json", "parquet"],
    )
    p.add_argument("--json-path", help="Dot path to the record array inside JSON.")
    p.add_argument(
        "--loader",
        default=os.getenv("ETL_DEFAULT_LOADER", "lake"),
        choices=["lake", "file", "sql"],
    )
    p.add_argument(
        "--jdbc-url", default=os.getenv("ETL_JDBC_URL"),
        help="JDBC url for --loader sql (driver jar must be on the classpath).",
    )
    p.add_argument("--target", required=True, help="Target table path or file path.")
    p.add_argument(
        "--format", default="parquet", choices=["parquet", "csv"],
        help="File format for --loader file.",
    )
    p.add_argument(
        "--strategy", default=None,
        choices=["fail", "replace", "append", "update", "upsert"],
    )
    p.add_argument(
        "--key-columns", default=None,
        help="Comma-separated key columns for update/upsert.",
    )
    p.add_argument("--n-buckets", type=int, default=None)
    p.add_argument("--mapping", help="JSON mapping file (cleaning + calculations).")
    p.add_argument(
        "--username", default=os.getenv("ETL_USERNAME", "admin"),
        help="Username for access control + audit.",
    )
    p.add_argument("--disable-security", action="store_true")
    p.add_argument("--audit-table", default=os.getenv("ETL_AUDIT_TABLE"))
    p.add_argument("--verbose", "-v", action="store_true")
    return p


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.json_string and args.extractor != "json":
        parser.error("--json-string requires --extractor json")
    if args.json_path and args.extractor != "json":
        parser.error("--json-path requires --extractor json")

    from etl_framework_spark.session import get_spark

    spark = get_spark(
        app_name="etl_framework_spark-cli",
        master=os.getenv("SPARK_GRAFT_MASTER"),
    )

    mapping_cfg: dict = {}
    if args.mapping:
        with open(args.mapping) as f:
            mapping_cfg = json.load(f)

    # 3-level precedence: CLI > mapping file > environment.
    cli_opts = {
        "strategy": args.strategy,
        "key_columns": [c.strip() for c in args.key_columns.split(",") if c.strip()]
        if args.key_columns
        else None,
        "n_buckets": args.n_buckets,
    }
    mapping_opts = dict(mapping_cfg.get("loading_strategy", {}))
    options = LoadOptions.resolve(
        cli=cli_opts, mapping=mapping_opts, env=LoadOptions.from_env()
    )

    pipe = Pipeline(
        spark,
        username=args.username,
        enable_security=not args.disable_security,
        audit_table=args.audit_table,
    )
    source = args.source
    if args.extractor == "csv":
        pipe.register_extractor("csv", CsvExtractor(infer=True))
    elif args.extractor == "json":
        if args.json_string:
            from etl_framework_spark.pipeline import JsonStringExtractor

            pipe.register_extractor("json", JsonStringExtractor(args.json_path))
            source = args.json_string
        else:
            pipe.register_extractor("json", JsonExtractor(flatten=True))
    else:
        pipe.register_extractor("parquet", ParquetExtractor())

    if mapping_cfg:
        pipe.add_transformer(
            CleanerTransformer(column_mapping=mapping_cfg.get("column_mapping", {}))
        )
        if mapping_cfg.get("calculations"):
            pipe.add_transformer(MappingTransformer(mapping_cfg))
    else:
        pipe.add_transformer(CleanerTransformer())
        if args.verbose:
            print("no mapping file: applying basic cleaning only", file=sys.stderr)

    if args.loader == "lake":
        pipe.register_loader("lake", LakeLoader(spark))
    elif args.loader == "sql":
        if not args.jdbc_url:
            parser.error("--loader sql requires --jdbc-url (or ETL_JDBC_URL)")
        from etl_framework_spark.sinks import JdbcLoader

        pipe.register_loader("sql", JdbcLoader(args.jdbc_url))
    else:
        pipe.register_loader("file", FileLoader(format=args.format))

    if args.verbose:
        print(
            f"strategy={options.strategy.value} keys={options.key_columns} "
            f"extractor={args.extractor} loader={args.loader}",
            file=sys.stderr,
        )

    df = pipe.run_with_options(
        args.extractor, source, args.loader, args.target, options
    )
    if args.verbose:
        print(f"loaded {args.target} with columns {df.columns}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
