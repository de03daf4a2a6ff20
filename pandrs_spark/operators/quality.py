"""Declarative data-quality constraints (Deequ / dbt-test style).

A constraint suite compiles to ONE aggregate pass over the table —
every check is an expression (count of violating rows), so auditing
100 TB costs one scan regardless of how many constraints run. The
long-format report (check_name, violations, passed) is the CI gate
artifact: fail the pipeline when any ``passed`` is false.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["not_null", "unique", "accepted_values", "in_range", "satisfies", "check_constraints"]


def not_null(col: str) -> tuple[str, Column]:
    """Violations = rows where ``col`` IS NULL."""
    return (f"not_null({col})", F.count(F.when(F.col(col).isNull(), 1)))


def unique(*cols: str) -> tuple[str, Column]:
    """Violations = duplicate rows beyond the first per key
    (count − distinct count; exact). Nulls are encoded positionally
    (coalesce to a sentinel per column) so ('a', NULL) and (NULL, 'a')
    serialize to DIFFERENT keys — concat_ws alone would silently skip
    the null element and conflate them."""
    key = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols],
    )
    return (
        f"unique({', '.join(cols)})",
        F.count(F.lit(1)) - F.countDistinct(key),
    )


def accepted_values(col: str, values: Sequence) -> tuple[str, Column]:
    """Violations = non-null values outside the accepted set."""
    return (
        f"accepted_values({col})",
        F.count(
            F.when(
                F.col(col).isNotNull() & ~F.col(col).isin(list(values)), 1
            )
        ),
    )


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """Violations = non-null values outside [lo, hi]."""
    return (
        f"in_range({col})",
        F.count(
            F.when(
                F.col(col).isNotNull()
                & ((F.col(col) < lo) | (F.col(col) > hi)),
                1,
            )
        ),
    )


def satisfies(name: str, predicate: Column) -> tuple[str, Column]:
    """Violations = rows where the custom predicate is NOT true."""
    return (name, F.count(F.when(~predicate, 1)))


def check_constraints(
    df: DataFrame, constraints: Sequence[tuple[str, Column]]
) -> DataFrame:
    """Evaluate a constraint suite in one aggregate pass. Returns the
    long-format report (check_name, violations, passed) ordered by
    constraint name."""
    aggs = [
        expr.cast("long").alias(f"__c{i}__")
        for i, (_, expr) in enumerate(constraints)
    ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', `__c{i}__`" for i, (name, _) in enumerate(constraints)
    )
    return (
        wide.selectExpr(
            f"stack({len(constraints)}, {stack_args})"
            " as (check_name, violations)"
        )
        .withColumn("passed", F.col("violations") == 0)
        .orderBy("check_name")
    )
