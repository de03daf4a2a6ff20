"""Column profiling — the data-quality report primitive (per-column
null rate / cardinality / range in ONE pass over the table).

One ``agg`` computes every statistic for every column simultaneously
(a single partial+final aggregate — profiling 100 TB costs one scan,
not one scan per column), then a ``stack`` unpivot reshapes the
1-row-wide result into the long (column, stat...) report. Exact
COUNT(DISTINCT c) per column is the oracle-matched baseline; at scale
swap ``exact_distinct=False`` for ``approx_count_distinct`` — same
plan shape minus the distinct expand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "key_skew"]


def profile_columns(
    df: DataFrame, cols, exact_distinct: bool = True
) -> DataFrame:
    """Long-format profile: one row per column with
    (column, n_rows, n_nulls, n_distinct, min_value, max_value) —
    min/max cast to string so heterogeneous column types share one
    report schema."""
    cols = list(cols)
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}__"))
        aggs.append(
            (
                F.countDistinct(F.col(c))
                if exact_distinct
                else F.approx_count_distinct(F.col(c))
            ).alias(f"__nd_{c}__")
        )
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}__"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}__"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__nulls_{c}__`, `__nd_{c}__`, `__min_{c}__`, `__max_{c}__`"
        for c in cols
    )
    return wide.selectExpr(
        "`__n__` as n_rows",
        f"stack({len(cols)}, {stack_args})"
        " as (column, n_nulls, n_distinct, min_value, max_value)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def key_skew(df: DataFrame, key_col: str) -> DataFrame:
    """Join/shuffle-key skew diagnostic: distribution statistics of
    per-key row counts (the thing that decides whether a shuffle on
    this key stalls on one straggler task at 100 TB). Returns one row:
    (key_col, n_rows, n_keys, max_cnt, avg_cnt, p99_cnt, skew_ratio) —
    skew_ratio = max/avg; ratios over ~10 call for salting
    (operators/joins.py:salted skew join) or AQE skew handling.
    Two aggregates: per-key counts, then count-distribution stats.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__cnt__"))
    return counts.agg(
        F.lit(key_col).alias("key_col"),
        F.sum("__cnt__").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__cnt__").alias("max_cnt"),
        F.round(F.sum("__cnt__") / F.count(F.lit(1)), 6).alias("avg_cnt"),
        F.round(F.percentile("__cnt__", F.lit(0.99)), 6).alias("p99_cnt"),
        F.round(
            F.max("__cnt__") / (F.sum("__cnt__") / F.count(F.lit(1))), 6
        ).alias("skew_ratio"),
    )
