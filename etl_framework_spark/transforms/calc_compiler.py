"""JSON mapping program -> Catalyst Column expressions.

The reference interprets a JSON "mapping" config per run with ``pd.eval``
over pandas Series (reference:src/etl_framework/plugins/transformers/
secure_json_calculator.py:108-211) plus dict lookups (:240-267) and
constants (:167-168), gated by conditions (:269-288), applied as a
sequential per-calculation loop (:119-121).

Here the same config compiles ONCE (driver-side) to a list of
``(name, Column)`` pairs applied as a ``withColumn`` chain — Catalyst
collapses the chain into a single whole-stage-codegen projection, so a
50-calculation program costs one pass over the data and zero Python in
the executors.

Formula language: Spark SQL expressions, with a small translation for the
pandas idioms used by the reference's config corpus (SURVEY.md §2.8):
``//`` floor-div, ``&``/``|``/``~`` booleans, ``.isin([...])``,
``x.where(cond, other)`` conditional floor, ``col.map({...})`` via
lookup calcs, ``pd.to_datetime``, ``.dt.days/quarter``.

Validation mirrors the reference's grammar allowlist
(reference:src/etl_framework/security/input_validator.py:84-164): names
must be SQL identifiers; formulas are rejected if they contain statement
separators or obvious injection shapes. On a calculation that fails to
compile, a ``{name}_error`` column records the message and the program
continues (reference:secure_json_calculator.py:169-174,205-209).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_FORBIDDEN = re.compile(r"(;|--|/\*|\bdrop\b|\bdelete\b|\binsert\b|\bexec\b)", re.I)

MAX_CALCULATIONS = 100  # reference:src/etl_framework/plugins/transformers/mapping_loader.py:86-88


class CalcValidationError(ValueError):
    pass


def _validate_name(name: str) -> None:
    if not _IDENT.match(name or ""):
        raise CalcValidationError(f"invalid calculation name: {name!r}")


def _validate_formula(formula: str) -> None:
    if _FORBIDDEN.search(formula or ""):
        raise CalcValidationError(f"formula rejected by validator: {formula!r}")


def translate_pandas_formula(formula: str) -> str:
    """Translate the reference corpus' pandas-eval idioms to Spark SQL."""
    s = formula
    # x.where(cond, other)  ->  CASE WHEN cond THEN x ELSE other END
    m = re.match(r"^\s*(\w+)\.where\((.+),\s*([^,)]+)\)\s*$", s)
    if m:
        col, cond, other = m.groups()
        s = f"CASE WHEN {cond} THEN {col} ELSE {other} END"
    # col.isin([a, b]) -> col IN (a, b)
    s = re.sub(
        r"(\w+)\.isin\(\[([^\]]*)\]\)",
        lambda m: f"{m.group(1)} IN ({m.group(2)})",
        s,
    )
    # pd.to_datetime(col) -> to_timestamp(col)
    s = re.sub(r"pd\.to_datetime\(", "to_timestamp(", s)
    # pd.Timestamp.now() -> current_timestamp()
    s = re.sub(r"pd\.Timestamp\.now\(\)", "current_timestamp()", s)
    # (a - b).dt.days -> datediff(a, b)   (timestamp difference in days);
    # scanner handles nested parens like (current_timestamp() - ts).dt.days.
    s = _rewrite_dt_days(s)
    # col.dt.quarter -> quarter(col); col.dt.to_period('M') -> month bucket
    s = re.sub(r"(\w+)\.dt\.quarter", lambda m: f"quarter({m.group(1)})", s)
    s = re.sub(
        r"(\w+)\.dt\.to_period\(\s*['\"]M['\"]\s*\)",
        lambda m: f"date_format({m.group(1)}, 'yyyy-MM')",
        s,
    )
    # a // b -> FLOOR(a / b)
    s = re.sub(r"([\w.()]+)\s*//\s*([\w.()]+)", lambda m: f"FLOOR({m.group(1)} / {m.group(2)})", s)
    # booleans
    s = re.sub(r"&", " AND ", s)
    s = re.sub(r"\|", " OR ", s)
    s = re.sub(r"~\s*\(", " NOT (", s)
    # == is valid Spark SQL equality already; != too.
    return s


def _rewrite_dt_days(s: str) -> str:
    """Rewrite every balanced ``( X - Y ).dt.days`` to ``datediff(X, Y)``."""
    marker = ").dt.days"
    while marker in s:
        end = s.index(marker)
        depth = 1
        i = end - 1
        while i >= 0 and depth > 0:
            if s[i] == ")":
                depth += 1
            elif s[i] == "(":
                depth -= 1
            i -= 1
        start = i + 1
        inner = s[start + 1 : end]
        # split at the top-level minus
        depth = 0
        split = -1
        for j, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "-" and depth == 0:
                split = j
                break
        if split < 0:
            break  # not a subtraction; leave as-is
        a, b = inner[:split].strip(), inner[split + 1 :].strip()
        s = s[:start] + f"datediff({a}, {b})" + s[end + len(marker) :]
    return s


@dataclass
class Calculation:
    name: str
    kind: str  # expr | pandas_formula | lookup | value | bin
    spec: dict[str, Any]
    condition: str | None = None


@dataclass
class MappingProgram:
    """Compiled form of a JSON mapping config."""

    column_mapping: dict[str, str] = field(default_factory=dict)
    business_rules: dict[str, Any] = field(default_factory=dict)
    calculations: list[Calculation] = field(default_factory=list)
    loading_strategy: dict[str, Any] = field(default_factory=dict)

    # -------------------------------------------------------------- parse
    @classmethod
    def from_json(cls, config: dict[str, Any] | str) -> "MappingProgram":
        if isinstance(config, str):
            with open(config) as f:
                config = json.load(f)
        calcs_raw = config.get("calculations", [])
        if len(calcs_raw) > MAX_CALCULATIONS:
            raise CalcValidationError(
                f"too many calculations: {len(calcs_raw)} > {MAX_CALCULATIONS}"
            )
        calcs = []
        for c in calcs_raw:
            name = c.get("name", "")
            _validate_name(name)
            if "value" in c:
                kind = "value"
            elif "lookup" in c or c.get("type") == "lookup":
                kind = "lookup"
            elif "bins" in c:
                kind = "bin"
            elif c.get("dialect") == "pandas" or c.get("type") == "pandas_formula":
                kind = "pandas_formula"
                _validate_formula(c.get("formula", ""))
            else:
                kind = "expr"
                _validate_formula(c.get("formula", ""))
            calcs.append(
                Calculation(name=name, kind=kind, spec=c, condition=c.get("condition"))
            )
        return cls(
            column_mapping=config.get("column_mapping", {}),
            business_rules=config.get("business_rules", {}),
            calculations=calcs,
            loading_strategy=config.get("loading_strategy", {}),
        )

    # ------------------------------------------------------------ compile
    def _substitute_rules(self, formula: str) -> str:
        """Inline scalar business rules as SQL literals (constant folding
        happens in Catalyst)."""
        out = formula
        for k, v in self.business_rules.items():
            if isinstance(v, (int, float)):
                out = re.sub(rf"\b{re.escape(k)}\b", repr(v), out)
            elif isinstance(v, str):
                out = re.sub(rf"\b{re.escape(k)}\b", f"'{v}'", out)
        return out

    def _compile_one(self, calc: Calculation, columns: list[str]) -> Column:
        spec = calc.spec
        if calc.kind == "value":
            return F.lit(spec["value"])
        if calc.kind == "lookup":
            # dict -> inline literal map: map[col]. Broadcast-join shaped
            # for big dicts; inline map for config-sized ones (always tiny:
            # reference:demo/config/roller_door_mapping.json:13-22).
            rule = spec.get("lookup") or spec.get("rule")
            mapping = self.business_rules.get(rule, rule if isinstance(rule, dict) else {})
            src = spec.get("source_column") or spec.get("source")
            pairs: list[Column] = []
            for k, v in mapping.items():
                pairs.extend([F.lit(k), F.lit(v)])
            m = F.create_map(*pairs) if pairs else F.create_map()
            col = m[F.col(src)]
            if "default" in spec:
                col = F.coalesce(col, F.lit(spec["default"]))
            return col
        if calc.kind == "bin":
            # pd.cut(col, bins, labels) -> chained WHEN (SURVEY.md §2.8)
            src = spec.get("source_column") or spec.get("source")
            bins = spec["bins"]
            labels = spec["labels"]
            col = F.col(src)
            expr = None
            for hi, label in zip(bins[1:], labels):
                cond = col <= F.lit(hi) if hi is not None else F.lit(True)
                expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
            return expr.otherwise(F.lit(labels[-1]))
        formula = spec["formula"]
        if calc.kind == "pandas_formula":
            formula = translate_pandas_formula(formula)
        formula = self._substitute_rules(formula)
        return F.expr(formula)

    def _condition_allows(self, condition: str | None, df: DataFrame) -> bool:
        """Schema-level condition gate (reference:src/etl_framework/plugins/
        transformers/secure_json_calculator.py:269-288). ``has:``/
        ``not:has:`` resolve against the schema at compile time; ``eq:``
        becomes a row-level guard handled by the caller."""
        if not condition:
            return True
        if condition.startswith("not:has:"):
            return condition[len("not:has:") :] not in df.columns
        if condition.startswith("has:"):
            return condition[len("has:") :] in df.columns
        return True  # eq: handled row-level in apply()

    def apply(self, df: DataFrame) -> DataFrame:
        """Renames + ordered calculation chain. One Catalyst projection."""
        df = _rename_ci(df, self.column_mapping)
        for calc in self.calculations:
            if not self._condition_allows(calc.condition, df):
                continue
            try:
                col = self._compile_one(calc, df.columns)
                if calc.condition and calc.condition.startswith("eq:"):
                    _, c, v = calc.condition.split(":", 2)
                    col = F.when(F.col(c) == F.lit(v), col)
                df = df.withColumn(calc.name, col)
            except CalcValidationError:
                raise
            except Exception as e:  # analysis error -> error column, continue
                df = df.withColumn(f"{calc.name}_error", F.lit(str(e)[:200]))
        return df


def _rename_ci(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename with case-insensitive fallback (reference:src/etl_framework/
    plugins/transformers/mapping_loader.py:136-192): resolved once against
    the schema — pure metadata op."""
    if not mapping:
        return df
    lower = {c.lower(): c for c in df.columns}
    resolved = {}
    for src, dst in mapping.items():
        if src in df.columns:
            resolved[src] = dst
        elif src.lower() in lower:
            resolved[lower[src.lower()]] = dst
    return df.withColumnsRenamed(resolved)


def compile_calculations(config: dict[str, Any] | str, df: DataFrame) -> DataFrame:
    """One-shot convenience: parse + apply."""
    return MappingProgram.from_json(config).apply(df)
