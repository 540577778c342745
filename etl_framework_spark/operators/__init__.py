"""Relational operators and keyed-load strategies."""

from etl_framework_spark.operators.load_strategies import (  # noqa: F401
    LoadStrategy,
    load,
)
