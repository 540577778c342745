"""ETL pipeline orchestration — the engine's front door.

Spark-first re-expression of the reference's primary user surface
(reference:src/etl_framework/core/pipeline.py:75-246,436-467): named
extractor/loader registries, an ordered transformer chain, strategy-
driven loads, RBAC permission gates, and an audit trail.

What changes on Spark, by design:

- **Everything between extract and load is ONE lazy plan.** The
  reference materializes a pandas frame at every stage boundary; here
  extractors return DataFrames, transformers are plan-to-plan
  functions, and nothing executes until the loader's write action — so
  Catalyst optimizes ACROSS stage boundaries (a filter added by
  transformer 3 pushes down into extractor 1's parquet scan).
- **Row counts come from ``observe()``, not ``count()``.** The audit
  trail wants rows_processed; a separate count() would re-run the
  plan. ``DataFrame.observe`` attaches an accumulator-backed metric
  that the write action itself populates — zero extra passes at any
  scale.
- **Permission checks are driver-side gates** evaluated before any job
  is planned (per stage, not per row), matching the reference's
  semantics at zero distributed cost.

``LoadOptions.resolve`` implements the reference CLI's 3-level
precedence — CLI > mapping file > environment defaults
(reference:src/etl_framework/cli/main.py:473-505,
core/load_strategy.py:63-119).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from etl_framework_spark.operators.load_strategies import LoadStrategy, load
from etl_framework_spark.security import (
    AccessController,
    AuditLogger,
    Operation,
    SecurityConfig,
    validate_file_path,
    validate_identifier,
)


#: xlsx sink row cap (the format's practical limit; enforced in
#: FileLoader with a limit(cap+1) probe so driver memory stays bounded)
XLSX_MAX_ROWS = 1_000_000


def strategy_from_string(
    value: str | LoadStrategy | None, *, fallback: bool = False
) -> LoadStrategy:
    """Case-insensitive parse. An UNKNOWN string raises by default: the
    reference silently falls back to REPLACE
    (reference:src/etl_framework/core/load_strategy.py:27-38), but
    REPLACE is destructive — a typo'd ``"upsrt"`` would drop the target
    table — so the modern entry points (``Pipeline.run``, CLI,
    ``LoadOptions``) fail loudly instead. ``fallback=True`` restores the
    reference behavior and is used ONLY by ``Pipeline.run_legacy``.
    An empty/None value still means REPLACE (the reference default)."""
    if isinstance(value, LoadStrategy):
        return value
    if not value:
        return LoadStrategy.REPLACE
    try:
        return LoadStrategy(str(value).lower().strip())
    except ValueError:
        if fallback:
            return LoadStrategy.REPLACE
        valid = ", ".join(s.value for s in LoadStrategy)
        raise ValueError(
            f"unknown load strategy {value!r} (expected one of: {valid})"
        ) from None


@dataclass
class LoadOptions:
    """Loading configuration (reference:core/load_strategy.py:63-119).

    ``batch_size`` maps to the table's bucket count — the knob that
    bounds per-task write size here the way row batching bounded
    per-INSERT size in the reference.
    """

    strategy: LoadStrategy = LoadStrategy.REPLACE
    key_columns: list[str] = field(default_factory=list)
    n_buckets: int = 32
    # reference default (core/load_strategy.py:73): batches dedupe on the
    # key before load unless explicitly disabled
    drop_duplicates: bool = True
    extra_options: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        self.strategy = strategy_from_string(self.strategy)
        if self.strategy.requires_key_columns and not self.key_columns:
            raise ValueError(f"strategy {self.strategy.value} requires key_columns")
        for c in self.key_columns:
            if not validate_identifier(c):
                raise ValueError(f"invalid key column name: {c!r}")
        if not 0 < self.n_buckets <= 1_000_000:
            raise ValueError(f"n_buckets out of range: {self.n_buckets}")

    @classmethod
    def resolve(
        cls,
        cli: dict[str, Any] | None = None,
        mapping: dict[str, Any] | None = None,
        env: dict[str, Any] | None = None,
    ) -> "LoadOptions":
        """3-level precedence: CLI > mapping file > environment.

        Each source is a partial dict of LoadOptions fields; the first
        source that SETS a field (non-None) wins
        (reference:src/etl_framework/cli/main.py:473-505).
        """
        out: dict[str, Any] = {}
        for src in (env or {}), (mapping or {}), (cli or {}):
            for k, v in src.items():
                if v is not None:
                    out[k] = v
        known = {"strategy", "key_columns", "n_buckets", "drop_duplicates"}
        extra = {k: v for k, v in out.items() if k not in known}
        return cls(
            strategy=out.get("strategy", LoadStrategy.REPLACE),
            key_columns=list(out.get("key_columns") or []),
            n_buckets=int(out.get("n_buckets", 32)),
            drop_duplicates=bool(out.get("drop_duplicates", True)),
            extra_options=extra,
        )

    @classmethod
    def from_env(cls, environ: dict[str, str] | None = None) -> dict[str, Any]:
        """Partial options dict from ``ETL_*`` environment variables
        (the lowest-precedence source for ``resolve``)."""
        e = os.environ if environ is None else environ
        keys = e.get("ETL_KEY_COLUMNS")
        return {
            "strategy": e.get("ETL_LOAD_STRATEGY"),
            "key_columns": [k.strip() for k in keys.split(",") if k.strip()]
            if keys
            else None,
            "n_buckets": int(e["ETL_N_BUCKETS"]) if e.get("ETL_N_BUCKETS") else None,
            "drop_duplicates": {"true": True, "false": False}.get(
                e.get("ETL_DROP_DUPLICATES", "").lower()
            ),
        }


# ---------------------------------------------------------------------------
# component protocols (reference core/extractor.py, transformer.py, loader.py)
# ---------------------------------------------------------------------------


class Extractor:
    """Source -> DataFrame. Subclass or wrap a callable via FnExtractor.

    ``source_is_path`` tells the pipeline's security gate whether a
    string source should pass file-path validation (False for inline
    payloads like JSON strings)."""

    source_is_path = True

    def extract(self, spark: SparkSession, source: Any, **kwargs) -> DataFrame:
        raise NotImplementedError


class Transformer:
    """DataFrame -> DataFrame (lazy plan-to-plan)."""

    def transform(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError


class Loader:
    """DataFrame -> target under a LoadStrategy; returns committed
    version (or path) on success."""

    def load(
        self,
        df: DataFrame,
        target: Any,
        strategy: LoadStrategy = LoadStrategy.REPLACE,
        key_columns: Sequence[str] | None = None,
        **kwargs,
    ) -> Any:
        raise NotImplementedError


class FnExtractor(Extractor):
    def __init__(self, fn: Callable[..., DataFrame]):
        self.fn = fn

    def extract(self, spark: SparkSession, source: Any, **kwargs) -> DataFrame:
        return self.fn(spark, source, **kwargs)


class FnTransformer(Transformer):
    def __init__(self, fn: Callable[[DataFrame], DataFrame], name: str | None = None):
        self.fn = fn
        self.name = name or getattr(fn, "__name__", "FnTransformer")

    def transform(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


class CsvExtractor(Extractor):
    def __init__(self, schema=None, infer: bool = True, **options):
        self.schema, self.infer, self.options = schema, infer, options

    def extract(self, spark, source, **kwargs):
        from etl_framework_spark.sources.readers import read_csv

        return read_csv(
            spark, source, schema=self.schema, infer=self.infer,
            **{**self.options, **kwargs},
        )


class JsonExtractor(Extractor):
    def __init__(self, schema=None, flatten: bool = False, **options):
        self.schema, self.flatten, self.options = schema, flatten, options

    def extract(self, spark, source, **kwargs):
        from etl_framework_spark.sources.readers import flatten_json, read_json

        if self.schema is not None:
            df = read_json(
                spark, source, schema=self.schema, **{**self.options, **kwargs}
            )
        else:  # CLI convenience: infer (one extra pass, opt-in by omission)
            df = spark.read.options(**{**self.options, **kwargs}).json(source)
        return flatten_json(df) if self.flatten else df


class ParquetExtractor(Extractor):
    def __init__(self, schema=None):
        self.schema = schema

    def extract(self, spark, source, **kwargs):
        from etl_framework_spark.sources.readers import read_parquet

        return read_parquet(spark, source, schema=self.schema)


class DataFrameExtractor(Extractor):
    """In-memory source (reference S5): the source IS a DataFrame."""

    def extract(self, spark, source, **kwargs):
        if not isinstance(source, DataFrame):
            raise TypeError("DataFrameExtractor expects a DataFrame source")
        return source


class JsonStringExtractor(Extractor):
    """Inline JSON payload (reference CLI ``--json-string`` +
    ``--json-path``, reference:src/etl_framework/cli/main.py:148-187):
    the source is a JSON string; ``json_path`` dot-navigates to the
    record array; nested records flatten via ``pd.json_normalize``
    (driver-side — inline payloads are small by definition), then
    Arrow-convert to a distributed DataFrame."""

    source_is_path = False

    def __init__(self, json_path: str | None = None):
        self.json_path = json_path

    def extract(self, spark, source, **kwargs):
        import json as _json

        import pandas as pd

        data = _json.loads(source) if isinstance(source, str) else source
        for part in (self.json_path or "").split("."):
            if part:
                if not isinstance(data, dict) or part not in data:
                    raise ValueError(f"json path segment {part!r} not found")
                data = data[part]
        if isinstance(data, dict):
            data = [data]
        if not isinstance(data, list):
            raise ValueError("JSON source must resolve to an object or array")
        return spark.createDataFrame(pd.json_normalize(data, sep="_"))


class CleanerTransformer(Transformer):
    """Name standardization + optional rename + drop-empty-rows (the
    reference DataCleaner's default chain)."""

    def __init__(self, column_mapping: dict[str, str] | None = None, drop_empty: bool = True):
        self.column_mapping = column_mapping or {}
        self.drop_empty = drop_empty

    def transform(self, df: DataFrame) -> DataFrame:
        from etl_framework_spark.transforms.cleaner import (
            drop_empty_rows,
            rename_columns,
            standardize_column_names,
        )

        out = standardize_column_names(df)
        if self.column_mapping:
            out = rename_columns(out, self.column_mapping)
        if self.drop_empty:
            out = drop_empty_rows(out)
        return out


class MappingTransformer(Transformer):
    """JSON mapping config -> compiled Catalyst expressions
    (``transforms.calc_compiler.MappingProgram``)."""

    def __init__(self, config: dict | str):
        from etl_framework_spark.transforms.calc_compiler import MappingProgram

        self.program = MappingProgram.from_json(config)

    def transform(self, df: DataFrame) -> DataFrame:
        return self.program.apply(df)


class GroupedTransformer(Transformer):
    """Per-group imperative pandas logic (``applyInPandas``) — the
    extension point for custom transformers whose semantics are
    inherently per-group (see ``operators.grouped``)."""

    def __init__(self, keys: Sequence[str], fn, schema):
        self.keys, self.fn, self.schema = list(keys), fn, schema

    def transform(self, df: DataFrame) -> DataFrame:
        from etl_framework_spark.operators.grouped import grouped_apply

        return grouped_apply(df, self.keys, self.fn, self.schema)


class LakeLoader(Loader):
    """Load into a LakeTable under a strategy (the engine's table
    sink; replaces the reference SQLLoader)."""

    def __init__(self, spark: SparkSession, n_buckets: int = 32, drop_duplicates: bool = False):
        self.spark = spark
        self.n_buckets = n_buckets
        self.drop_duplicates = drop_duplicates

    def load(self, df, target, strategy=LoadStrategy.REPLACE, key_columns=None, **kw):
        table = load(
            self.spark,
            df,
            str(target),
            strategy=strategy,
            key_columns=key_columns,
            n_buckets=kw.get("n_buckets", self.n_buckets),
            drop_duplicates=kw.get("drop_duplicates", self.drop_duplicates),
        )
        return table.version


class FileLoader(Loader):
    """Parquet/CSV/feather/xlsx file sink (reference FileLoader,
    reference:src/etl_framework/plugins/loaders/file_loader.py:57-124,262-299).
    Strategy maps to write mode: FAIL->error, REPLACE->overwrite,
    APPEND->append; keyed strategies need a table, use LakeLoader.
    feather writes are distributed (one Arrow IPC file per partition);
    xlsx is driver-side (the format caps at ~10^6 rows)."""

    def __init__(self, format: str = "parquet", **options):
        self.format = format
        self.options = options

    def load(self, df, target, strategy=LoadStrategy.REPLACE, key_columns=None, **kw):
        import os

        strategy = strategy_from_string(strategy)
        if strategy in (LoadStrategy.UPDATE, LoadStrategy.UPSERT):
            raise ValueError("keyed strategies require a table sink (LakeLoader)")
        if self.format in ("feather", "xlsx"):
            if strategy is LoadStrategy.FAIL and os.path.exists(str(target)):
                raise FileExistsError(f"target exists and strategy is FAIL: {target}")
            if strategy is LoadStrategy.APPEND and self.format == "xlsx":
                raise ValueError("xlsx sink does not support APPEND")
            if self.format == "feather":
                from etl_framework_spark.sources.feather import write_feather

                if strategy is LoadStrategy.REPLACE and os.path.isdir(str(target)):
                    import shutil

                    shutil.rmtree(str(target))
                write_feather(df, str(target))
            else:
                from etl_framework_spark.sources.xlsx import write_xlsx

                # Enforced cap, not an assumption: the format tops out
                # around 2^20 rows and the sink is driver-side by
                # nature. limit(cap+1) bounds driver memory even when
                # the input is huge; the guard then fails loudly.
                cap = XLSX_MAX_ROWS
                pdf = df.limit(cap + 1).toPandas()
                if len(pdf) > cap:
                    raise ValueError(
                        f"xlsx sink caps at {cap:,} rows (driver-side "
                        "format); write parquet/csv/feather instead"
                    )
                write_xlsx(
                    str(target),
                    list(pdf.columns),
                    pdf.where(pdf.notna(), None).values.tolist(),
                )
            return str(target)
        mode = {
            LoadStrategy.FAIL: "error",
            LoadStrategy.REPLACE: "overwrite",
            LoadStrategy.APPEND: "append",
        }[strategy]
        writer = df.write.mode(mode).options(**{**self.options, **kw})
        if self.format == "csv":
            writer = writer.option("header", True)
        writer.format(self.format).save(str(target))
        return str(target)


# ---------------------------------------------------------------------------
# the pipeline
# ---------------------------------------------------------------------------


class Pipeline:
    """Named-component ETL orchestration with RBAC + audit
    (reference:src/etl_framework/core/pipeline.py:75-246)."""

    def __init__(
        self,
        spark: SparkSession,
        username: str = "admin",
        enable_security: bool = True,
        audit_log_file: str | None = None,
        audit_table: str | None = None,
        access_controller: AccessController | None = None,
        security_config: SecurityConfig | None = None,
    ):
        self.spark = spark
        self.username = username
        self.enable_security = enable_security
        self.extractors: dict[str, Extractor] = {}
        self.transformers: list[Transformer] = []
        self.loaders: dict[str, Loader] = {}
        if enable_security:
            self.access_controller = access_controller or AccessController()
            self.security_config = security_config or SecurityConfig.from_environment()
            self.audit_logger = AuditLogger(
                log_file=audit_log_file
                or os.getenv("ETL_AUDIT_LOG_FILE"),
                table_path=audit_table,
            )
        else:
            self.access_controller = None
            self.security_config = None
            self.audit_logger = None

    # ---------------------------------------------------------- registry
    def _validate_name(self, name: str, kind: str) -> None:
        if self.enable_security and not validate_identifier(name):
            raise ValueError(f"invalid {kind} name: {name!r}")

    def register_extractor(self, name: str, extractor: Extractor | Callable) -> None:
        self._validate_name(name, "extractor")
        self.extractors[name] = (
            extractor if isinstance(extractor, Extractor) else FnExtractor(extractor)
        )

    def add_transformer(self, transformer: Transformer | Callable) -> None:
        # duck-typed: anything with .transform(df) qualifies (e.g.
        # transforms.EnricherTransformer, defined outside this module)
        self.transformers.append(
            transformer
            if hasattr(transformer, "transform")
            else FnTransformer(transformer)
        )

    def register_loader(self, name: str, loader: Loader) -> None:
        self._validate_name(name, "loader")
        self.loaders[name] = loader

    # ------------------------------------------------------------- gates
    def _check_permission(self, op: Operation, resource: str | None = None) -> bool:
        if not self.enable_security or not self.access_controller:
            return True
        ok = self.access_controller.check_permission(self.username, op, resource)
        if not ok and self.audit_logger:
            self.audit_logger.log_permission_denied(self.username, op.value, resource)
        return ok

    # --------------------------------------------------------------- run
    def run(
        self,
        extractor_name: str,
        source: Any,
        loader_name: str,
        target: Any,
        strategy: LoadStrategy | str = LoadStrategy.REPLACE,
        key_columns: Sequence[str] | None = None,
        **loader_kwargs,
    ) -> DataFrame:
        """EXTRACT -> TRANSFORM* -> LOAD. Returns the final (lazy)
        DataFrame; the load action is what executes the plan."""
        strategy = strategy_from_string(strategy)
        pipeline_name = f"{extractor_name}_to_{loader_name}"

        if not self._check_permission(Operation.EXECUTE_PIPELINE, str(source)):
            if self.audit_logger:  # persist the denial before raising
                self.audit_logger.flush(self.spark)
            raise PermissionError(
                f"user {self.username!r} lacks permission to execute pipeline"
            )
        if extractor_name not in self.extractors:
            raise ValueError(f"extractor {extractor_name!r} not registered")
        if loader_name not in self.loaders:
            raise ValueError(f"loader {loader_name!r} not registered")
        if self.enable_security:
            if isinstance(source, str) and getattr(
                self.extractors[extractor_name], "source_is_path", True
            ):
                validate_file_path(source, "read")
            if isinstance(target, str):
                validate_file_path(target, "write")
            for c in key_columns or []:
                if not validate_identifier(c):
                    raise ValueError(f"invalid key column name: {c!r}")

        try:
            if self.audit_logger:
                self.audit_logger.log_data_access(
                    self.username, str(source), "extract"
                )
            df = self.extractors[extractor_name].extract(self.spark, source)

            for t in self.transformers:
                t_name = getattr(t, "name", None) or t.__class__.__name__
                if not self._check_permission(Operation.TRANSFORM, t_name):
                    # reference behavior: skip the denied transformer
                    # (audited by _check_permission), keep the pipeline
                    continue
                df = t.transform(df)

            if not self._check_permission(Operation.LOAD, str(target)):
                raise PermissionError(f"permission denied to load to {target}")

            # Auto-encrypt name-matched sensitive columns before load
            # (reference pipeline.py:189-235) — lazily, as part of THE
            # SAME plan, so encryption costs no extra pass either.
            if (
                self.enable_security
                and self.security_config
                and self.security_config.should_encrypt()
            ):
                from etl_framework_spark.transforms.crypto import (
                    detect_sensitive_columns,
                    encrypt_columns,
                )

                sensitive = detect_sensitive_columns(df)
                if sensitive:
                    df = encrypt_columns(
                        df,
                        sensitive,
                        self.security_config.encryption_key,
                        method=self.security_config.encryption_method,
                    )
                    if self.audit_logger:
                        self.audit_logger.log_event(
                            "data_modification",
                            self.username,
                            {"operation": "encryption", "columns": sensitive},
                        )

            # rows_processed via observe(): populated by the write action
            # itself — no second pass over the data.
            obs = Observation()
            df_obs = df.observe(obs, F.count(F.lit(1)).alias("rows"))
            result = self.loaders[loader_name].load(
                df_obs,
                target,
                strategy=strategy,
                key_columns=list(key_columns or []),
                **loader_kwargs,
            )
            metrics = obs.get  # blocks until the load's action completes
            rows = int(metrics.get("rows") or 0)

            if self.audit_logger:
                self.audit_logger.log_pipeline_execution(
                    user=self.username,
                    pipeline_name=pipeline_name,
                    source=str(source),
                    target=str(target),
                    rows_processed=rows,
                    success=True,
                )
                self.audit_logger.flush(self.spark)
            _ = result
            return df
        except Exception as e:
            if self.audit_logger:
                self.audit_logger.log_pipeline_execution(
                    user=self.username,
                    pipeline_name=pipeline_name,
                    source=str(source),
                    target=str(target),
                    rows_processed=0,
                    success=False,
                    error_message=str(e),
                )
                self.audit_logger.flush(self.spark)
            raise

    def run_with_options(
        self,
        extractor_name: str,
        source: Any,
        loader_name: str,
        target: Any,
        options: LoadOptions,
        **loader_kwargs,
    ) -> DataFrame:
        """Reference parity: run() driven by a LoadOptions object
        (reference:src/etl_framework/core/pipeline.py:436-467)."""
        return self.run(
            extractor_name,
            source,
            loader_name,
            target,
            strategy=options.strategy,
            key_columns=options.key_columns,
            n_buckets=options.n_buckets,
            drop_duplicates=options.drop_duplicates,
            **{**options.extra_options, **loader_kwargs},
        )

    def run_legacy(
        self,
        extractor_name,
        source,
        loader_name,
        target,
        strategy: str | LoadStrategy | None = None,
    ) -> DataFrame:
        """Reference-compatible entry point: an unknown strategy string
        silently falls back to REPLACE here (and only here)."""
        return self.run(
            extractor_name,
            source,
            loader_name,
            target,
            strategy=strategy_from_string(strategy, fallback=True),
        )

    def shutdown(self) -> None:
        if self.audit_logger:
            self.audit_logger.log_event(
                "system_shutdown", self.username, {"pipeline": "Pipeline"}
            )
            self.audit_logger.flush(self.spark)
