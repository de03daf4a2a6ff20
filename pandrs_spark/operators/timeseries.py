"""Time-series operators (SURVEY.md §2.11): resample, date ranges,
gap filling (ffill/bfill/linear interpolation), autocorrelation.

All are window/sequence expressions — no driver-side loops — so a
billion independent series (partitioned by series id) process in
parallel. Reference: src/time_series/core.rs (resample :387, ffill
:657, bfill :683), src/temporal/date_range/mod.rs:153,
src/time_series/analysis.rs (ACF :829).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

__all__ = [
    "resample",
    "date_range",
    "upsample_grid",
    "ffill",
    "bfill",
    "interpolate_linear_cols",
]


def resample(
    df: DataFrame,
    ts_col: str,
    freq: str,
    aggs: Sequence[Column],
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Downsample to a calendar frequency via date_trunc + groupBy.

    freq: any date_trunc unit ('hour', 'day', 'week', 'month', ...).
    One shuffle on (group keys, bucket); partial aggregation is
    map-side, so this is scan-bound at 100 TB.
    """
    bucket = F.date_trunc(freq, F.col(ts_col)).alias("bucket")
    return df.groupBy(*group_by, bucket).agg(*aggs)


def date_range(spark, start: str, end: str, interval: str = "1 day") -> DataFrame:
    """Materialized timestamp grid via sequence() + explode — no
    driver-side loop, generated distributed."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                F.expr(f"INTERVAL {interval}"),
            )
        ).alias("ts")
    )


def upsample_grid(
    df: DataFrame,
    ts_col: str,
    keys_df: DataFrame,
    grid_df: DataFrame,
) -> DataFrame:
    """Cross the key set with a timestamp grid and left-join observed
    values — the scalable upsample shape (grid is broadcastable)."""
    grid = keys_df.crossJoin(F.broadcast(grid_df))
    join_cols = [c for c in keys_df.columns] + [grid_df.columns[0]]
    renamed = df.withColumnRenamed(ts_col, grid_df.columns[0])
    return grid.join(renamed, on=join_cols, how="left")


def ffill(col: Column | str, w: WindowSpec) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.last(c, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )


def bfill(col: Column | str, w: WindowSpec) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.first(c, ignorenulls=True).over(
        w.rowsBetween(0, Window.unboundedFollowing)
    )


def interpolate_linear_cols(
    value_col: str, rn_col: Column, w: WindowSpec
) -> Column:
    """Linear interpolation between surrounding non-null observations
    (pandas interpolate(method='linear'); compat functions.rs:870).

    Pure window algebra: carry forward/backward both the last/next
    non-null value and its row index, then interpolate by row distance.
    Ends fall back to ffill then bfill (pandas default keeps leading
    NaNs; we mirror 'interpolate then ffill/bfill edges' = limit_direction='both').
    """
    v = F.col(value_col)
    back = w.rowsBetween(Window.unboundedPreceding, 0)
    fwd = w.rowsBetween(0, Window.unboundedFollowing)
    prev_v = F.last(v, ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    prev_i = F.last(F.when(v.isNotNull(), rn_col), ignorenulls=True).over(back)
    next_i = F.first(F.when(v.isNotNull(), rn_col), ignorenulls=True).over(fwd)
    frac = (rn_col - prev_i) / (next_i - prev_i)
    interp = prev_v + (next_v - prev_v) * frac
    return (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(interp)
    )
