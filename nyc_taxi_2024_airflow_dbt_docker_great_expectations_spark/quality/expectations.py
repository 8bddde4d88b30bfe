"""Great-Expectations-style validation, single-pass (reference section 2.9b).

The reference builds GX suites per layer and runs them post-hoc as pipeline
gates (``dags/validation_utils.py:15-127``), where each expectation becomes
its own SQL query against Postgres.  This engine compiles *all* of a suite's
value expectations into **one** ``agg()`` over the table — one scan at 100 TB
instead of one per expectation — and evaluates schema/row-count expectations
from metadata/the same pass.

GX semantics preserved (``dags/validation_utils.py:72-84``):

- ``mostly=m`` passes iff the violating fraction of **non-null** values is
  <= 1-m (NULLs are not violations for Between/InSet; NotNull counts NULLs
  over all rows).
- Failures raise ``ValidationError`` whose message lists each failed
  expectation with its ``unexpected_percent``, like the reference's
  ``ValueError`` report.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Expectation:
    kind: str                      # not_null | between | in_set | row_count_between | column_exists
    column: str | None = None
    min_value: float | None = None
    max_value: float | None = None
    value_set: tuple = ()
    mostly: float = 1.0

    def describe(self) -> str:
        bits = [self.kind]
        if self.column:
            bits.append(self.column)
        if self.min_value is not None or self.max_value is not None:
            bits.append(f"[{self.min_value}, {self.max_value}]")
        if self.value_set:
            bits.append(f"in {sorted(self.value_set)}")
        if self.mostly < 1.0:
            bits.append(f"mostly={self.mostly}")
        return " ".join(str(b) for b in bits)


def expect_column_values_to_not_be_null(column: str, mostly: float = 1.0) -> Expectation:
    return Expectation("not_null", column=column, mostly=mostly)


def expect_column_values_to_be_between(
    column: str, min_value: float | None = None, max_value: float | None = None,
    mostly: float = 1.0,
) -> Expectation:
    return Expectation("between", column=column, min_value=min_value,
                       max_value=max_value, mostly=mostly)


def expect_column_values_to_be_in_set(column: str, value_set, mostly: float = 1.0) -> Expectation:
    return Expectation("in_set", column=column, value_set=tuple(value_set), mostly=mostly)


def expect_table_row_count_to_be_between(
    min_value: float | None = None, max_value: float | None = None
) -> Expectation:
    return Expectation("row_count_between", min_value=min_value, max_value=max_value)


def expect_column_to_exist(column: str) -> Expectation:
    return Expectation("column_exists", column=column)


@dataclass
class ExpectationResult:
    expectation: Expectation
    success: bool
    element_count: int = 0
    unexpected_count: int = 0
    unexpected_percent: float = 0.0

    def describe(self) -> str:
        status = "PASS" if self.success else "FAIL"
        return (f"{status} {self.expectation.describe()} "
                f"(unexpected {self.unexpected_count}/{self.element_count} "
                f"= {self.unexpected_percent:.3f}%)")


class ValidationError(ValueError):
    """Raised when a suite fails; carries per-expectation results
    (mirrors reference dags/validation_utils.py:72-84)."""

    def __init__(self, table: str, results: list[ExpectationResult]):
        self.results = results
        failed = [r.describe() for r in results if not r.success]
        super().__init__(
            f"validation failed for {table}: " + "; ".join(failed)
        )


def _violation_condition(e: Expectation) -> Column:
    """Boolean column: non-null value violates the expectation."""
    c = F.col(e.column)
    if e.kind == "between":
        cond = F.lit(False)
        if e.min_value is not None:
            cond = cond | (c < F.lit(e.min_value))
        if e.max_value is not None:
            cond = cond | (c > F.lit(e.max_value))
        return cond
    if e.kind == "in_set":
        return ~c.isin(*e.value_set)
    raise ValueError(f"no violation condition for kind {e.kind!r}")


def run_suite(df: DataFrame, suite: list[Expectation], table: str = "table",
              raise_on_failure: bool = True) -> list[ExpectationResult]:
    """Evaluate a whole suite in one aggregation pass + metadata checks."""
    results: list[ExpectationResult] = []

    value_exps = [e for e in suite if e.kind in ("not_null", "between", "in_set")]
    needs_count = any(e.kind == "row_count_between" for e in suite) or value_exps

    # --- metadata-only expectations (no scan) ---
    for e in suite:
        if e.kind == "column_exists":
            results.append(ExpectationResult(e, success=e.column in df.columns))

    # --- one aggregation pass for everything else ---
    if needs_count:
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for i, e in enumerate(value_exps):
            if e.kind == "not_null":
                aggs.append(
                    F.sum(F.when(F.col(e.column).isNull(), 1).otherwise(0)).alias(f"u{i}")
                )
                aggs.append(F.count(F.lit(1)).alias(f"n{i}"))  # basis: all rows
            else:
                cond = _violation_condition(e)
                aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"u{i}"))
                aggs.append(F.count(F.col(e.column)).alias(f"n{i}"))  # basis: non-null
        row = df.agg(*aggs).first()
        total = row["__rows"]

        for e in suite:
            if e.kind == "row_count_between":
                ok = (e.min_value is None or total >= e.min_value) and (
                    e.max_value is None or total <= e.max_value
                )
                results.append(ExpectationResult(e, ok, element_count=total))

        for i, e in enumerate(value_exps):
            n = row[f"n{i}"] or 0
            u = row[f"u{i}"] or 0
            pct = (u / n * 100.0) if n else 0.0
            ok = (u / n <= 1.0 - e.mostly + 1e-12) if n else True
            results.append(
                ExpectationResult(e, ok, element_count=n, unexpected_count=u,
                                  unexpected_percent=pct)
            )

    if raise_on_failure and any(not r.success for r in results):
        raise ValidationError(table, results)
    return results
