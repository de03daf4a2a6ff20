"""Deterministic (engine-reproducible) aggregation helpers.

Floating-point SUM/AVG over a shuffled dataset is not associative, so
two engines (or two runs on different partitionings) produce answers
that differ in the last ulps. The reference engine is single-threaded
per aggregation and never faces this; a distributed engine must make
determinism a design property, not an accident.

Strategy: quantize each value to a fixed decimal scale, aggregate in
exact decimal arithmetic (order-independent), and convert the exact
decimal result to double at the end. The result is bit-identical
across partitionings, engines (Spark vs DuckDB oracle), and cluster
sizes — which is also exactly what you want for a 100 TB pipeline
whose nightly output feeds a diff-based regression gate.

Derived statistics (variance, correlation, t-stats) are computed from
these exact sums with a *shared formula string* evaluated by both
engines, so the double arithmetic tree is identical too.

Reference parity: sum/mean/std/var surface of
/root/reference/src/dataframe/groupby.rs:327-397 and
src/optimized/direct_aggregations.rs:30-140.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

__all__ = [
    "dsum",
    "davg",
    "sql_dsum",
    "sql_davg",
    "VAR_FORMULA",
    "STD_FORMULA",
    "CORR_FORMULA",
]

# Precision 32 leaves >= 14 integral digits headroom over any test sum
# while staying under Spark's decimal-38 cap after sum widening.
_PRECISION = 32


def _c(col: Column | str) -> Column:
    return col if isinstance(col, Column) else F.col(col)


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM: round→decimal→exact sum→double."""
    return (
        F.sum(F.round(_c(col), scale).cast(DecimalType(_PRECISION, scale)))
        .cast("double")
    )


def davg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent mean: exact decimal sum / non-null count."""
    c = _c(col)
    return dsum(c, scale) / F.count(c)


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB/ANSI mirror of :func:`dsum` (same quantization)."""
    return (
        f"CAST(SUM(CAST(ROUND({expr}, {scale}) AS DECIMAL({_PRECISION}, {scale}))) AS DOUBLE)"
    )


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"


# Shared formula templates, evaluated via F.expr on the Spark side and
# inlined into the oracle SQL on the DuckDB side. Placeholders: n, sx,
# sy, sxx, syy, sxy are column names holding exact sufficient stats.
VAR_FORMULA = "CASE WHEN {n} > 1 THEN ({sxx} - {sx} * {sx} / {n}) / ({n} - 1) ELSE NULL END"
STD_FORMULA = "SQRT(" + VAR_FORMULA + ")"
CORR_FORMULA = (
    "CASE WHEN {n} > 1 THEN "
    "({n} * {sxy} - {sx} * {sy}) / "
    "(SQRT({n} * {sxx} - {sx} * {sx}) * SQRT({n} * {syy} - {sy} * {sy})) "
    "ELSE NULL END"
)
