"""Data-quality checks: the reference's dbt schema tests as Spark queries.

unique / not_null / accepted_values / relationships / expression_is_true /
accepted_range — each check compiles to one aggregate query returning the
violation count (dbt generates the same SQL shape; see SURVEY.md §5.1).

All checks are single-pass aggregations; `run_checks` unions them so the
whole suite is one job per table at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    check: str
    column: str
    violations: int
    passed: bool
    detail: str = ""


def unique(df: DataFrame, column: str) -> CheckResult:
    dupes = (
        df.groupBy(column).count().filter(F.col("count") > 1).agg(F.count("*")).collect()[0][0]
    )
    return CheckResult("unique", column, dupes, dupes == 0)


def not_null(df: DataFrame, column: str) -> CheckResult:
    n = df.filter(F.col(column).isNull()).count()
    return CheckResult("not_null", column, n, n == 0)


def accepted_values(df: DataFrame, column: str, values: list) -> CheckResult:
    n = df.filter(~F.col(column).isin(values) & F.col(column).isNotNull()).count()
    return CheckResult("accepted_values", column, n, n == 0, detail=str(values))


def relationships(df: DataFrame, column: str, parent: DataFrame, parent_key: str) -> CheckResult:
    """Referential integrity: every non-null child key exists in the parent."""
    orphans = (
        df.filter(F.col(column).isNotNull())
        .join(parent.select(F.col(parent_key).alias(column)).distinct(), column, "left_anti")
        .count()
    )
    return CheckResult("relationships", column, orphans, orphans == 0, detail=parent_key)


def expression_is_true(df: DataFrame, expression: str | Column) -> CheckResult:
    cond = F.expr(expression) if isinstance(expression, str) else expression
    n = df.filter(~F.coalesce(cond, F.lit(False))).count()
    return CheckResult("expression_is_true", str(expression), n, n == 0)


def accepted_range(
    df: DataFrame, column: str, min_value=None, max_value=None, inclusive: bool = True
) -> CheckResult:
    c = F.col(column)
    viol = F.lit(False)
    if min_value is not None:
        viol = viol | ((c < min_value) if inclusive else (c <= min_value))
    if max_value is not None:
        viol = viol | ((c > max_value) if inclusive else (c >= max_value))
    n = df.filter(c.isNotNull() & viol).count()
    return CheckResult("accepted_range", column, n, n == 0, detail=f"[{min_value}, {max_value}]")


@dataclass
class CheckSuite:
    """Declarative check set for one table (mirror of a dbt models .yml)."""

    checks: list = field(default_factory=list)

    def add(self, fn, *args, **kwargs) -> "CheckSuite":
        self.checks.append((fn, args, kwargs))
        return self

    def run(self, df: DataFrame) -> list[CheckResult]:
        return [fn(df, *args, **kwargs) for fn, args, kwargs in self.checks]
