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

from pandrs_spark.operators.util import fan_out_groups

__all__ = [
    "nelson_aalen",
    "resample",
    "date_range",
    "upsample_grid",
    "ffill",
    "bfill",
    "interpolate_linear_cols",
    "seasonal_decompose_additive",
    "ses_fitted",
    "holt_forecast",
    "holt_damped_forecast",
    "periodogram",
    "ar2_fit",
    "linear_trend",
    "moving_average_forecast",
    "split_mean_changepoints",
    "ts_feature_matrix",
    "bocpd_changepoints",
    "clamped_cumsum",
    "croston_forecast",
    "tsb_forecast",
    "sbc_demand_classification",
    "logrank_test",
    "reorder_policy_sim",
]


def clamped_cumsum(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str],
    lower: float = 0.0,
    scale: int = 2,
    out_col: str = "balance",
    final_only: bool = False,
) -> DataFrame:
    """Running total clamped at ``lower`` after every step — the
    inventory/credit-balance recurrence b_t = max(lower, b_{t-1} + x_t),
    b_0 = lower.

    The clamp LOOKS non-associative (and a naive port would fold it
    row-by-row in Python), but the CUSUM identity linearizes it:
    with c_t = b_t - lower, c_t = max(0, c_{t-1} + x_t), whose closed
    form is c_t = S_t - min(0, min_{j<=t} S_j) over prefix sums S. So
    the whole thing is two window aggregates (running sum + running
    min) over one sort — pure JVM window algebra, no Python in the
    path, ~10x faster than the applyInPandas fold at sf0.1 and
    shuffle-equivalent to any other per-key window at 100 TB.

    Values are quantized to scaled BIGINT so the arithmetic is
    integer-exact and engine-reproducible — the q268 oracle replays
    the ORIGINAL recurrence with DuckDB list_reduce and hash-matches,
    which doubles as a proof of the identity.

    ``final_only=True`` returns one row per key (partition_by...,
    out_col) — the balance-snapshot shape; otherwise the full frame
    gains the per-row running balance.
    """
    order_cols = [F.col(c) for c in order_by]
    keys = list(partition_by)
    m = 10**scale
    lo = int(round(lower * m))
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    from pandrs_spark.functions.deterministic import quantize

    q = quantize(df[value_col], scale)
    with_s = df.withColumn("__s__", F.sum(q).over(w))
    with_bal = with_s.withColumn(
        "__balq__",
        F.lit(lo)
        + F.col("__s__")
        - F.least(F.lit(0).cast("long"), F.min("__s__").over(w)),
    )
    if final_only:
        ordkey = F.struct(*[F.col(c) for c in order_by])
        return with_bal.groupBy(*keys).agg(
            (F.max_by("__balq__", ordkey) / float(m)).alias(out_col)
        )
    return with_bal.withColumn(out_col, F.col("__balq__") / float(m)).drop(
        "__s__", "__balq__"
    )


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
    value_col: str, rn_col: Column, w: WindowSpec, method: str = "linear"
) -> Column:
    """Interpolation between surrounding non-null observations (pandas
    interpolate; compat functions.rs:870 exposes the method enum).

    Pure window algebra: carry forward/backward both the last/next
    non-null value and its row index, then combine per ``method``:
    'linear' (by row distance), 'nearest' (closer neighbor, ties to the
    previous like pandas), 'pad'/'ffill' (previous value), 'bfill'
    (next value), 'zero' (zero-order hold — previous value inside gaps,
    like scipy's kind='zero'). Ends fall back to the available neighbor
    (limit_direction='both').
    """
    v = F.col(value_col)
    back = w.rowsBetween(Window.unboundedPreceding, 0)
    fwd = w.rowsBetween(0, Window.unboundedFollowing)
    prev_v = F.last(v, ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    prev_i = F.last(F.when(v.isNotNull(), rn_col), ignorenulls=True).over(back)
    next_i = F.first(F.when(v.isNotNull(), rn_col), ignorenulls=True).over(fwd)
    if method == "linear":
        frac = (rn_col - prev_i) / (next_i - prev_i)
        interior = prev_v + (next_v - prev_v) * frac
    elif method == "nearest":
        interior = F.when(
            (rn_col - prev_i) <= (next_i - rn_col), prev_v
        ).otherwise(next_v)
    elif method in ("pad", "ffill", "zero"):
        interior = prev_v
    elif method in ("bfill", "backfill"):
        interior = next_v
    else:
        raise ValueError(f"interpolate: unknown method {method!r}")
    return (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(interior)
    )


def seasonal_decompose_additive(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    period: int,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Additive seasonal decomposition (src/time_series/decomposition.rs:91):
    value = trend + seasonal + resid.

    Pure expressions — trend is a centered length-``period`` rolling
    mean; seasonal is the phase-mean of the detrended series, centered
    to sum ~0; resid is the leftover. Each step is a window/groupBy over
    the (already small) series table, so a million independent series
    (``partition_by`` = series id) decompose in parallel with no UDF.
    Phase means use quantized sums so the result is engine-deterministic.
    """
    return _seasonal_decompose(df, ts_col, value_col, period, partition_by, "additive")


def seasonal_decompose_multiplicative(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    period: int,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Multiplicative decomposition (decomposition.rs:91, model variant):
    value = trend * seasonal * resid. Seasonal indices are phase means
    of the value/trend ratio, normalized so their mean is 1."""
    return _seasonal_decompose(
        df, ts_col, value_col, period, partition_by, "multiplicative"
    )


def _seasonal_decompose(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    period: int,
    partition_by: Sequence[str],
    model: str,
) -> DataFrame:
    from pandrs_spark.functions.deterministic import davg, dsum_over

    keys = list(partition_by)
    half = period // 2
    w_ord = Window.partitionBy(*keys).orderBy(ts_col)
    w_center = w_ord.rowsBetween(-half, period - 1 - half)
    # Quantized window sum: sliding-frame float aggregation differs
    # between engines (add/retract vs recompute); integer sums don't.
    out = df.withColumn("__n_win__", F.count(value_col).over(w_center)).withColumn(
        "trend",
        F.when(
            F.col("__n_win__") == period,
            dsum_over(value_col, w_center, 4) / period,
        ),
    )
    detr = (
        F.col(value_col) - F.col("trend")
        if model == "additive"
        else F.col(value_col) / F.col("trend")
    )
    out = out.withColumn(
        "__phase__", (F.row_number().over(w_ord) - 1) % period
    ).withColumn("__detr__", detr)
    phase_means = out.groupBy(*keys, "__phase__").agg(
        davg("__detr__", 6).alias("__phase_mean__")
    )
    grand = phase_means.groupBy(*keys).agg(
        davg("__phase_mean__", 6).alias("__grand__")
    )
    out = out.join(phase_means, keys + ["__phase__"]).join(
        grand, keys if keys else None, "cross" if not keys else "inner"
    )
    if model == "additive":
        seasonal = F.col("__phase_mean__") - F.col("__grand__")
        resid = F.col(value_col) - F.col("trend") - F.col("seasonal")
    else:
        seasonal = F.col("__phase_mean__") / F.col("__grand__")
        resid = F.col(value_col) / (F.col("trend") * F.col("seasonal"))
    return (
        out.withColumn("seasonal", seasonal)
        .withColumn("resid", resid)
        .drop("__n_win__", "__detr__", "__phase_mean__", "__grand__")
        .withColumnRenamed("__phase__", "phase")
    )


def ses_fitted(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str],
    alpha: float,
    out_col: str = "ses",
) -> DataFrame:
    """Simple exponential smoothing fitted values
    (src/time_series/forecasting.rs:437): s_t = α·x_t + (1−α)·s_{t−1},
    s_1 = x_1 — the same fitted values as pandas ``ewm(alpha,
    adjust=False).mean()``. Recursive ⇒ applyInPandas per series
    (groups scale horizontally).

    Round 11: the recursion is an EXPLICIT float fold —
    ``s = alpha*x + (1.0 - alpha)*s`` — rather than pandas ewm, so the
    DuckDB oracle's ``list_reduce`` lambda with the identical
    expression tree reproduces every intermediate bit (pandas ewm's
    internal weighted-average formulation drifted ~1e-6 from the
    closed-form oracle at sf0.1 revenue magnitudes ~5e8, where double
    ulps at the 6-decimal rounding edge are visible)."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} double"
    order_cols = list(order_by)

    def _ses(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype=float)
        out = []
        s = None
        for x in vals:
            s = float(x) if s is None else alpha * float(x) + (1.0 - alpha) * s
            out.append(s)
        pdf[out_col] = out
        return pdf

    return fan_out_groups(df, *partition_by).groupBy(*partition_by).applyInPandas(_ses, schema=schema)


def holt_forecast(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str],
    alpha: float,
    beta: float,
    horizon: int = 1,
    out_col: str = "holt_fc",
) -> DataFrame:
    """Holt's linear trend forecast (src/time_series/forecasting.rs:453):
    level l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1}); trend b_t =
    β(l_t−l_{t−1}) + (1−β)b_{t−1}; forecast x̂_{t+h} = l_t + h·b_t.
    Returns the input plus the h-step-ahead forecast made at each row."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} double"
    order_cols = list(order_by)

    def _holt(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        vals = pdf[value_col].to_numpy(dtype=float)
        fc = [float("nan")] * len(vals)
        if len(vals) >= 2:
            level, trend = vals[0], vals[1] - vals[0]
            fc[0] = level + horizon * trend
            for t in range(1, len(vals)):
                prev_level = level
                level = alpha * vals[t] + (1 - alpha) * (level + trend)
                trend = beta * (level - prev_level) + (1 - beta) * trend
                fc[t] = level + horizon * trend
        pdf[out_col] = fc
        return pdf

    return fan_out_groups(df, *partition_by).groupBy(*partition_by).applyInPandas(_holt, schema=schema)


def holt_winters_forecast(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str],
    alpha: float,
    beta: float,
    gamma: float,
    period: int,
    horizon: int = 1,
    out_col: str = "hw_fc",
    seasonal: str = "add",
) -> DataFrame:
    """Holt-Winters (triple exponential smoothing,
    src/time_series/forecasting.rs:469): level, trend and a length-
    ``period`` seasonal cycle updated recursively; forecast at each row
    is x̂_{t+h} = l_t + h·b_t + s_{t+h−period} (``seasonal="add"``) or
    (l_t + h·b_t)·s_{t+h−period} (``seasonal="mul"``, for series whose
    seasonal swing scales with the level — requires positive values).
    Initialization mirrors the textbook scheme: level = mean of the
    first cycle, trend = mean first-cycle-to-second-cycle step,
    seasonals = first-cycle deviations from (ratios to) its mean.
    Recursive ⇒ applyInPandas per series; each series must fit one
    worker, series count scales horizontally.
    """
    if seasonal not in ("add", "mul"):
        raise ValueError(f"seasonal must be 'add' or 'mul', got {seasonal!r}")
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} double"
    order_cols = list(order_by)

    def _hw(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype=float)
        n = len(x)
        fc = [float("nan")] * n
        if n >= 2 * period:
            level = x[:period].mean()
            trend = (x[period : 2 * period].mean() - x[:period].mean()) / period
            if seasonal == "add":
                season = list(x[:period] - x[:period].mean())
            else:
                season = list(x[:period] / x[:period].mean())
            for t in range(n):
                s_idx = t % period
                if t >= period:
                    prev_level = level
                    if seasonal == "add":
                        level = alpha * (x[t] - season[s_idx]) + (1 - alpha) * (level + trend)
                    else:
                        level = alpha * (x[t] / season[s_idx]) + (1 - alpha) * (level + trend)
                    trend = beta * (level - prev_level) + (1 - beta) * trend
                    if seasonal == "add":
                        season[s_idx] = gamma * (x[t] - level) + (1 - gamma) * season[s_idx]
                    else:
                        season[s_idx] = gamma * (x[t] / level) + (1 - gamma) * season[s_idx]
                if seasonal == "add":
                    fc[t] = level + horizon * trend + season[(t + horizon) % period]
                else:
                    fc[t] = (level + horizon * trend) * season[(t + horizon) % period]
        pdf[out_col] = fc
        return pdf

    return fan_out_groups(df, *partition_by).groupBy(*partition_by).applyInPandas(_hw, schema=schema)


def arima_forecast(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str],
    p: int = 1,
    d: int = 1,
    q: int = 1,
    ar: Sequence[float] | None = None,
    ma: Sequence[float] | None = None,
) -> DataFrame:
    """ARIMA(p,d,q) with MA terms, reference-faithful
    (src/time_series/forecasting.rs:788): the reference's "simplified"
    ARIMA uses FIXED coefficients (AR φ_j = 0.5, MA θ_j = 0.3 unless
    supplied), differences d times, then runs the innovations
    recursion over the differenced series::

        fitted_i = Σ_{j<p, i>j} φ_{j+1}·y_{i−1−j}
                 + Σ_{j<q, i>j} θ_{j+1}·e_{i−1−j}
        e_i      = y_i − fitted_i

    (missing early lags contribute 0 — equivalently a zero-initialized
    fixed-length state, which is what the DuckDB ``list_reduce`` oracle
    folds). The one-step forecast on the differenced scale is the same
    expression at i = n, integrated back through the d last values of
    each differencing level.

    The recursion is sequential per series BY DEFINITION, so the
    distributed shape is ``applyInPandas`` per series: each series must
    fit one worker; series count scales horizontally (same stance as
    holt_forecast/BOCPD above).

    Returns the rows that survive differencing (i ≥ d) with columns:
    partition cols, order cols, ``value_col``, dy, fitted, resid, and
    the constant-per-series next_fc (one-step forecast on the ORIGINAL
    scale).
    """
    ar_coef = list(ar) if ar is not None else [0.5] * p
    ma_coef = list(ma) if ma is not None else [0.3] * q
    if len(ar_coef) != p or len(ma_coef) != q:
        raise ValueError("len(ar) must equal p and len(ma) must equal q")
    keep = [*partition_by, *order_by, value_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in keep
    )
    schema += ", dy double, fitted double, resid double, next_fc double"
    order_cols = list(order_by)

    def _arima(pdf):
        import numpy as np

        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype=float)
        # difference d times, remembering the last value at each level
        # for the final integration step
        last_at_level = []
        y = x
        for _ in range(d):
            last_at_level.append(y[-1] if len(y) else float("nan"))
            y = np.diff(y)
        n = len(y)
        fitted = np.zeros(n)
        resid = np.zeros(n)
        for i in range(n):
            f = 0.0
            for j in range(p):
                if i > j:
                    f += ar_coef[j] * y[i - 1 - j]
            for j in range(q):
                if i > j:
                    f += ma_coef[j] * resid[i - 1 - j]
            fitted[i] = f
            resid[i] = y[i] - f
        # one-step ahead on the differenced scale
        fc = 0.0
        for j in range(p):
            if n - 1 - j >= 0:
                fc += ar_coef[j] * y[n - 1 - j]
        for j in range(q):
            if n - 1 - j >= 0:
                fc += ma_coef[j] * resid[n - 1 - j]
        # integrate back through the differencing chain
        for last in reversed(last_at_level):
            fc = last + fc
        out = pdf.iloc[d:].copy() if d else pdf.copy()
        out = out[[c for c in pdf.columns if c in keep]]
        out["dy"] = y
        out["fitted"] = fitted
        out["resid"] = resid
        out["next_fc"] = fc
        return out

    return fan_out_groups(df, *partition_by).groupBy(*partition_by).applyInPandas(_arima, schema=schema)


def periodogram(
    series: DataFrame,
    ts_col: str,
    value_col: str,
    periods: Sequence[int],
) -> DataFrame:
    """Seasonality detection via a discrete periodogram at candidate
    periods (src/time_series/analysis.rs:310 seasonality detection).

    For each candidate period p the spectral power is

        power(p) = [Σ_t c_t·cos(2πt/p)]² + [Σ_t c_t·sin(2πt/p)]²) / n

    with c_t the mean-centered series indexed by dense position t.
    One window pass assigns positions, a broadcast cross join fans the
    series out to the (tiny) period list, and one aggregation per
    period computes the sums — a single shuffle keyed on period, scale-
    independent of series length. Sums quantize to scaled BIGINT
    (functions/deterministic) so power is engine-reproducible.
    """
    from pandrs_spark.functions.deterministic import dsum, quantize

    spark = series.sparkSession
    n_mean = series.agg(
        F.count(F.lit(1)).alias("n"), dsum(value_col).alias("s")
    )
    pos = series.select(
        (F.row_number().over(Window.orderBy(ts_col)) - 1).alias("t"),
        F.col(value_col).alias("x"),
    )
    plist = spark.createDataFrame([(int(p),) for p in periods], "period int")
    two_pi = 6.283185307179586  # 2*pi, same literal in the SQL oracle
    fanned = (
        pos.crossJoin(F.broadcast(n_mean))
        .crossJoin(F.broadcast(plist))
        .select(
            "period",
            "n",
            (
                (F.col("x") - F.col("s") / F.col("n"))
                * F.cos(F.lit(two_pi) * F.col("t") / F.col("period"))
            ).alias("xc"),
            (
                (F.col("x") - F.col("s") / F.col("n"))
                * F.sin(F.lit(two_pi) * F.col("t") / F.col("period"))
            ).alias("xs"),
        )
    )
    return (
        fanned.groupBy("period")
        .agg(
            (F.sum(quantize("xc", 0)).cast("double")).alias("sc"),
            (F.sum(quantize("xs", 0)).cast("double")).alias("ss"),
            F.first("n").alias("n"),
        )
        .select(
            "period",
            ((F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")) / F.col("n")).alias(
                "power"
            ),
        )
    )


def ar2_fit(series: DataFrame, ts_col: str, value_col: str) -> DataFrame:
    """AR(2) fit on the mean-centered series by least squares — the
    expression-tier counterpart of the reference's ARIMA fit
    (src/time_series/forecasting.rs:788; AR coefficients via the
    normal equations, no intercept after centering):

        [s11 s12][φ1]   [r1]
        [s12 s22][φ2] = [r2]

    Sufficient statistics (Σy·y₁, Σy·y₂, Σy₁², Σy₂², Σy₁y₂) come from
    one lag-window pass + one exact quantized aggregation, so the fit
    is a constant-size reduction no matter the series length; the 2×2
    solve happens in the projection. Returns one row: n_obs, phi1,
    phi2, rss, next_forecast (one-step-ahead).
    """
    from pandrs_spark.functions.deterministic import dsum, quantize

    n_mean = series.agg(
        F.count(F.lit(1)).alias("n"), dsum(value_col).alias("s")
    )
    w = Window.orderBy(ts_col)
    centered = (
        series.crossJoin(F.broadcast(n_mean))
        .select(
            (F.col(value_col) - F.col("s") / F.col("n")).alias("y"),
            F.lag(F.col(value_col), 1).over(w).alias("x1"),
            F.lag(F.col(value_col), 2).over(w).alias("x2"),
            (F.col("s") / F.col("n")).alias("mu"),
            F.row_number().over(Window.orderBy(F.desc(ts_col))).alias("rn_desc"),
        )
        .withColumn("y1", F.col("x1") - F.col("mu"))
        .withColumn("y2", F.col("x2") - F.col("mu"))
    )
    obs = centered.filter(F.col("x2").isNotNull())
    stats = obs.agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(quantize(F.col("y") * F.col("y1"), 0)).cast("double").alias("r1"),
        F.sum(quantize(F.col("y") * F.col("y2"), 0)).cast("double").alias("r2"),
        F.sum(quantize(F.col("y1") * F.col("y1"), 0)).cast("double").alias("s11"),
        F.sum(quantize(F.col("y2") * F.col("y2"), 0)).cast("double").alias("s22"),
        F.sum(quantize(F.col("y1") * F.col("y2"), 0)).cast("double").alias("s12"),
        F.sum(quantize(F.col("y") * F.col("y"), 0)).cast("double").alias("syy"),
    )
    # last two centered values feed the one-step forecast
    tail = (
        centered.filter(F.col("rn_desc") <= 2)
        .groupBy()
        .agg(
            F.max(F.when(F.col("rn_desc") == 1, F.col("y"))).alias("ylast"),
            F.max(F.when(F.col("rn_desc") == 2, F.col("y"))).alias("yprev"),
            F.max("mu").alias("mu"),
        )
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    phi1 = (F.col("r1") * F.col("s22") - F.col("r2") * F.col("s12")) / det
    phi2 = (F.col("r2") * F.col("s11") - F.col("r1") * F.col("s12")) / det
    return stats.crossJoin(F.broadcast(tail)).select(
        "n_obs",
        phi1.alias("phi1"),
        phi2.alias("phi2"),
        (F.col("syy") - phi1 * F.col("r1") - phi2 * F.col("r2")).alias("rss"),
        (F.col("mu") + phi1 * F.col("ylast") + phi2 * F.col("yprev")).alias(
            "next_forecast"
        ),
    )


TREND_FORMULAS = {
    "slope": "(n * sty - st * sy) / (n * stt - st * st)",
    "intercept": "(sy - (n * sty - st * sy) / (n * stt - st * st) * st) / n",
    "r2": "((n * sty - st * sy) * (n * sty - st * sy)) / "
    "((n * stt - st * st) * (n * syy - sy * sy))",
}
TREND_FORMULAS["forecast_next"] = (
    f"({TREND_FORMULAS['intercept']}) + ({TREND_FORMULAS['slope']}) * n"
)


def linear_trend(
    series: DataFrame, ts_col: str, value_col: str, scale: int = 6
) -> DataFrame:
    """Linear trend fit over an ordered series (src/time_series/
    analysis.rs:108; linear-trend forecast forecasting.rs:241): OLS of
    value on the 0-based time index t, trend strength as R², and the
    one-step-ahead forecast intercept + slope·n.

    Shape for scale: the input is already an *aggregated* series (one
    row per bucket), so the ordered row_number window runs over bucket
    cardinality, not raw rows; the five sufficient sums are quantized
    (deterministic.py) and the closed-form fit is a fixed double formula
    over them, shared with the oracle. Returns 1 row:
    n, slope, intercept, r2, forecast_next."""
    w = Window.orderBy(ts_col)
    idx = series.select(
        (F.row_number().over(w) - 1).cast("double").alias("t"),
        F.col(value_col).cast("double").alias("y"),
    )
    q = lambda c, s: (F.signum(c) * F.floor(F.abs(c) * float(10**s) + F.lit(0.5))).cast("bigint")  # noqa: E731
    sums = idx.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("t").alias("st"),
        (F.sum(q(F.col("y"), scale)) / float(10**scale)).alias("sy"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        (F.sum(q(F.col("y") * F.col("y"), scale)) / float(10**scale)).alias("syy"),
        (F.sum(q(F.col("t") * F.col("y"), scale)) / float(10**scale)).alias("sty"),
    )
    return sums.selectExpr(
        "CAST(n AS BIGINT) AS n",
        f"{TREND_FORMULAS['slope']} AS slope",
        f"{TREND_FORMULAS['intercept']} AS intercept",
        f"{TREND_FORMULAS['r2']} AS r2",
        f"{TREND_FORMULAS['forecast_next']} AS forecast_next",
    )


def moving_average_forecast(
    series: DataFrame, ts_col: str, value_col: str, k: int = 3
) -> DataFrame:
    """Moving-average forecast (src/time_series/forecasting.rs:82): the
    next value is the mean of the last ``k`` observations. One ordered
    top-k over the bucketed series. Returns 1 row: k_used, forecast."""
    last_k = series.orderBy(F.col(ts_col).desc()).limit(k)
    return last_k.agg(
        F.count("*").alias("k_used"),
        F.avg(F.col(value_col)).alias("forecast"),
    )


def split_mean_changepoints(
    series: DataFrame,
    ts_col: str,
    value_col: str,
    prior_scale: float = 0.01,
    scale: int = 6,
) -> DataFrame:
    """Change-point scores à la the reference's "Bayesian" detector
    (src/time_series/analysis.rs:1035): at every split index
    i ∈ [2, n−2), score = |mean(values[..i]) − mean(values[i..])|, a
    change point where score > 10·prior_scale, significance =
    score / threshold.

    One ordered cumulative-sum window over the (already bucketed)
    series: prefix sums give both means at every split simultaneously —
    O(n) total, vs the reference's O(n²) re-summing loop. Values are
    quantized (deterministic.py) so prefix sums are exact integers.
    Returns (idx, ts, score, is_change, significance) for valid splits.
    """
    w = Window.orderBy(ts_col)
    q = (F.signum(F.col(value_col)) * F.floor(
        F.abs(F.col(value_col)) * float(10**scale) + F.lit(0.5)
    )).cast("bigint")
    cum = series.select(
        F.col(ts_col).alias("ts"),
        F.row_number().over(w).alias("rn"),
        F.sum(q).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum(q).over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).alias("tot"),
        F.count(F.lit(1)).over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).alias("n"),
    )
    thr = 10.0 * prior_scale
    m = float(10**scale)
    # split index i = rn (1-based row is the first of the "after" side
    # when we split before it): before = rows 1..i, after = i+1..n ⇒
    # the reference's i (0-based count of "before" rows) equals rn here.
    scored = cum.filter((F.col("rn") >= 2) & (F.col("rn") < F.col("n") - 2)).select(
        F.col("rn").alias("idx"),
        "ts",
        (
            F.abs(
                (F.col("cum") / m) / F.col("rn")
                - ((F.col("tot") - F.col("cum")) / m) / (F.col("n") - F.col("rn"))
            )
        ).alias("score"),
    )
    return scored.select(
        "idx",
        "ts",
        "score",
        (F.col("score") > thr).alias("is_change"),
        F.when(F.col("score") > thr, F.col("score") / thr).alias("significance"),
    )


def ts_feature_matrix(
    df,
    series_col: str,
    ts_col: str,
    value_col: str,
    lags=(1, 7),
    window: int = 7,
):
    """Per-series ML feature extraction (src/time_series/features.rs,
    1,307 LoC in the reference): lag features, first difference,
    percent change, and rolling mean/std/min/max — all from ONE window
    partitioning (partitionBy series, orderBy ts), so the whole matrix
    costs a single shuffle + per-partition sort at any scale. Rolling
    mean/std use dsum_over quantized sums so results are
    order-independent and oracle-exact.
    """
    from pandrs_spark.functions.deterministic import dsum_over

    w = Window.partitionBy(series_col).orderBy(ts_col)
    wr = w.rowsBetween(-(window - 1), 0)
    v = F.col(value_col)
    out = df
    for k in lags:
        out = out.withColumn(f"lag_{k}", F.lag(v, k).over(w))
    prev = F.lag(v, 1).over(w)
    # pct-change is NULL when the previous value is 0 (ANSI Spark
    # raises DIVIDE_BY_ZERO otherwise — first hit at sf0.1, where a
    # purchase stream contains a 0 value; NULL matches SQL division
    # semantics, so the DuckDB oracle mirrors for free)
    out = out.withColumn("diff_1", v - prev).withColumn(
        "pct_change_1", F.when(prev != 0, (v - prev) / prev)
    )
    n = F.count(value_col).over(wr)
    s = dsum_over(value_col, wr, 4)
    ss = dsum_over(v * v, wr, 2)
    var = (ss - s * s / n) / (n - 1)
    return (
        out.withColumn("roll_n", n)
        .withColumn("roll_mean", s / n)
        .withColumn(
            "roll_std",
            F.when(n > 1, F.sqrt(F.greatest(var, F.lit(0.0)))),
        )
        .withColumn("roll_min", F.min(v).over(wr))
        .withColumn("roll_max", F.max(v).over(wr))
    )


def bocpd_changepoints(
    df,
    series_col: str,
    ts_col: str,
    value_col: str,
    hazard: float = 1.0 / 50.0,
    max_run: int = 200,
):
    """Bayesian online change-point detection (Adams & MacKay 2007;
    reference analysis.rs:1035 "Bayesian" change-point). Student-t
    predictive under a Normal-Gamma conjugate prior; the run-length
    posterior is carried forward per observation and truncated at
    ``max_run`` so the per-row cost is bounded.

    Strictly sequential per series ⇒ ``applyInPandas`` partitioned by
    series id: each group is one bounded recursion, series scale
    horizontally across executors, and nothing is collected to the
    driver. Deterministic: fixed-order float recursion, no sampling.

    Returns one row per observation: (series, ts, value, p_change =
    posterior mass on run length 0, map_run = argmax run length).
    """
    import numpy as np

    out_schema = (
        f"{series_col} long, {ts_col} timestamp, value double, "
        "p_change double, map_run int"
    )

    def _bocpd(pdf):
        from math import lgamma

        import pandas as pd

        lg = np.vectorize(lgamma)
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=float)
        n = len(x)
        # Normal-Gamma prior
        mu0, kappa0, alpha0, beta0 = 0.0, 1.0, 1.0, 1.0
        R = np.zeros(max_run + 1)
        R[0] = 1.0
        mu = np.array([mu0])
        kappa = np.array([kappa0])
        alpha = np.array([alpha0])
        beta = np.array([beta0])
        p_change = np.zeros(n)
        map_run = np.zeros(n, dtype=int)
        for t in range(n):
            k = len(mu)
            # Student-t predictive for each active run length
            df_t = 2.0 * alpha
            scale2 = beta * (kappa + 1.0) / (alpha * kappa)
            z2 = (x[t] - mu) ** 2 / scale2
            logpred = (
                lg(alpha + 0.5)
                - lg(alpha)
                - 0.5 * np.log(np.pi * df_t * scale2 / 2.0 * 2.0)
                - (alpha + 0.5) * np.log1p(z2 / df_t)
            )
            pred = np.exp(logpred)
            growth = R[:k] * pred * (1.0 - hazard)
            cp = float(np.sum(R[:k] * pred * hazard))
            newR = np.zeros(min(k + 1, max_run + 1))
            newR[0] = cp
            upto = min(k, max_run)
            newR[1 : upto + 1] = growth[:upto]
            s = newR.sum()
            newR = newR / s if s > 0 else newR
            R = np.zeros(max_run + 1)
            R[: len(newR)] = newR
            p_change[t] = R[0]
            map_run[t] = int(np.argmax(R[: len(newR)]))
            # posterior updates, truncated to max_run entries
            mu_new = np.concatenate(
                ([mu0], (kappa * mu + x[t]) / (kappa + 1.0))
            )[: max_run + 1]
            kappa_new = np.concatenate(([kappa0], kappa + 1.0))[: max_run + 1]
            alpha_new = np.concatenate(([alpha0], alpha + 0.5))[: max_run + 1]
            beta_new = np.concatenate(
                ([beta0], beta + kappa * (x[t] - mu) ** 2 / (2.0 * (kappa + 1.0)))
            )[: max_run + 1]
            mu, kappa, alpha, beta = mu_new, kappa_new, alpha_new, beta_new
        return pd.DataFrame(
            {
                series_col: pdf[series_col].to_numpy(),
                ts_col: pdf[ts_col].to_numpy(),
                "value": x,
                "p_change": np.round(p_change, 9),
                "map_run": map_run,
            }
        )

    from pandrs_spark.operators.util import fan_out_groups

    # CPU-dense grouped recursion: pre-partition by the series key with
    # an explicit count so AQE's byte-sized coalescing can't collapse
    # all series onto one task (round 11, measured 7 s single-task)
    return fan_out_groups(df, series_col).groupBy(series_col).applyInPandas(
        _bocpd, schema=out_schema
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator (survival surface
    of src/stats/mod.rs). ``duration_col``: non-negative time to event
    or censoring; ``event_col``: 1 = event observed, 0 = right-censored.

    Distributed shape: one groupBy(duration) shuffle collapses subjects
    to per-time (deaths d, censored c) counts; the at-risk series n_t
    and the survival product exp(Σ ln(1 − d/n)) run in prefix windows
    over the DISTINCT duration table — bounded by the time domain's
    resolution (days/weeks), not subject count, the same contract as
    the calendar-bounded whitelist in tests/test_plans.py. The ln term
    is guarded at d = n (survival hits exact 0) because engines differ on
    ln(0); the when-fence zeroes every later row too. Returns rows
    only at event times: (duration, n_risk, n_events, survival).
    """
    grp = df.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.col(event_col)).alias("d"),
        F.sum(1 - F.col(event_col)).alias("c"),
    )
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    w_prior = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    km = (
        grp.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_total")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prior), F.lit(0)),
        )
        .withColumn(
            "survival",
            F.when(
                F.sum(
                    F.when(F.col("d") * 1.0 >= F.col("n_risk"), 1).otherwise(0)
                ).over(w_run)
                > 0,
                F.lit(0.0),
            ).otherwise(
                F.exp(
                    F.sum(
                        F.log(
                            F.when(
                                F.col("d") * 1.0 < F.col("n_risk"),
                                1 - F.col("d") * 1.0 / F.col("n_risk"),
                            ).otherwise(F.lit(1.0))
                        )
                    ).over(w_run)
                )
            ),
        )
    )
    return km.filter(F.col("d") > 0).select(
        F.col("t").cast("long").alias("duration"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        "survival",
    )


def croston_forecast(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str],
    alpha: float = 0.3,
) -> DataFrame:
    """Croston's method for intermittent demand (behavioral spec:
    src/time_series/forecasting.rs:437 family — the reference ships the
    SES recursion this method composes; Croston 1972 / Syntetos-Boylan
    2005 define the composition). Per series, fold over the complete
    (gap-filled, zeros included) demand sequence:

    - first non-zero demand x at elapsed-period count q initialises
      size ``z = x`` and interval ``p = q``;
    - each later non-zero demand updates ``z = a*x + (1-a)*z`` and
      ``p = a*q + (1-a)*p`` where q is the number of periods since the
      previous demand, then resets q; zero periods only grow q.

    Forecast per period = z/p; the SBA variant multiplies by
    ``(1 - a/2)`` to correct Croston's inversion bias.

    One row out per series: the final state. The fold is a per-series
    ``applyInPandas`` — series are independent, so a billion series
    scale horizontally; each series' history is bounded by the calendar
    spine, not the data volume.
    """
    order_cols = list(order_by)
    part_cols = list(partition_by)
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in part_cols
    )
    schema = (
        key_fields + ", n_periods long, n_nonzero long, "
        "croston_size double, croston_interval double, "
        "croston_fc double, sba_fc double"
    )

    def _croston(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_cols, kind="mergesort")
        xs = pdf[value_col].to_numpy(dtype=float)
        z = p = None
        q = 1.0
        n_nonzero = 0
        for x in xs:
            if x > 0:
                n_nonzero += 1
                if z is None:
                    z, p = float(x), q
                else:
                    z = alpha * x + (1 - alpha) * z
                    p = alpha * q + (1 - alpha) * p
                q = 1.0
            else:
                q += 1.0
        row = {c: [pdf[c].iloc[0]] for c in part_cols}
        row.update(
            {
                "n_periods": [len(xs)],
                "n_nonzero": [n_nonzero],
                "croston_size": [z],
                "croston_interval": [p],
                "croston_fc": [None if z is None else z / p],
                "sba_fc": [None if z is None else (1 - alpha / 2) * z / p],
            }
        )
        return pd.DataFrame(row)

    return fan_out_groups(df, *part_cols).groupBy(*part_cols).applyInPandas(_croston, schema=schema)


def sbc_demand_classification(
    df: DataFrame,
    value_col: str,
    partition_by: Sequence[str],
    n_periods_col: str = "n_periods",
    adi_cut: float = 1.32,
    cv2_cut: float = 0.49,
) -> DataFrame:
    """Syntetos-Boylan-Croston demand-pattern quadrants over a
    gap-filled series (zeros included): ADI = periods per non-zero
    demand, CV² = squared coefficient of variation of the NON-ZERO
    demand sizes (sample std). smooth / intermittent / erratic / lumpy
    by the published 1.32 / 0.49 cutoffs. Pure grouped aggregation —
    one shuffle on the series key. Moments come from quantized exact
    long sums (functions/deterministic.py) so the result is
    partition-order invariant."""
    from pandrs_spark.functions.deterministic import dsum

    x = F.col(value_col).cast("double")
    nz = F.when(x > 0, x)
    agg = df.groupBy(*partition_by).agg(
        F.count(F.lit(1)).alias(n_periods_col),
        F.count(nz).alias("n_nonzero"),
        dsum(nz, 6).alias("__sx__"),
        dsum(nz * nz, 6).alias("__sxx__"),
    )
    n = F.col("n_nonzero").cast("double")
    mean = F.col("__sx__") / n
    var = F.when(
        F.col("n_nonzero") > 1,
        (F.col("__sxx__") - n * mean * mean) / (n - 1),
    )
    agg = agg.withColumn("__mean_nz__", mean).withColumn("__var_nz__", var)
    adi = F.col(n_periods_col) / F.col("n_nonzero")
    cv2 = F.col("__var_nz__") / (F.col("__mean_nz__") * F.col("__mean_nz__"))
    return (
        agg.withColumn("adi", adi)
        .withColumn("cv2", cv2)
        .withColumn(
            "demand_class",
            F.when((F.col("adi") < adi_cut) & (F.col("cv2") < cv2_cut), "smooth")
            .when((F.col("adi") >= adi_cut) & (F.col("cv2") < cv2_cut), "intermittent")
            .when((F.col("adi") < adi_cut) & (F.col("cv2") >= cv2_cut), "erratic")
            .otherwise("lumpy"),
        )
        .drop("__mean_nz__", "__var_nz__")
    )


def tsb_forecast(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str],
    alpha: float = 0.3,
    beta: float = 0.1,
) -> DataFrame:
    """Teunter-Syntetos-Babai intermittent-demand forecast (TSB 2011;
    composes the reference's SES recursion like :func:`croston_forecast`).
    Unlike Croston, the demand PROBABILITY updates EVERY period — so the
    forecast decays toward zero through dead periods, handling
    obsolescence Croston structurally cannot:

        p_t = b*1{x_t>0} + (1-b)*p_{t-1}      (every period)
        z_t = a*x_t + (1-a)*z_{t-1}           (demand periods only)
        forecast_t = p_t * z_t

    Initialisation at the first demand x at period i: z = x,
    p = 1/i; earlier periods carry no state. One row out per series
    (final state); per-series applyInPandas fold, horizontally
    scalable exactly like Croston."""
    order_cols = list(order_by)
    part_cols = list(partition_by)
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in part_cols
    )
    schema = (
        key_fields + ", n_periods long, n_nonzero long, "
        "tsb_prob double, tsb_size double, tsb_fc double"
    )

    def _tsb(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_cols, kind="mergesort")
        xs = pdf[value_col].to_numpy(dtype=float)
        z = p = None
        i = 0.0
        n_nonzero = 0
        for x in xs:
            i += 1.0
            if z is None:
                if x > 0:
                    n_nonzero += 1
                    z, p = float(x), 1.0 / i
            else:
                if x > 0:
                    n_nonzero += 1
                    p = beta * 1.0 + (1.0 - beta) * p
                    z = alpha * x + (1.0 - alpha) * z
                else:
                    p = beta * 0.0 + (1.0 - beta) * p
        row = {c: [pdf[c].iloc[0]] for c in part_cols}
        row.update(
            {
                "n_periods": [len(xs)],
                "n_nonzero": [n_nonzero],
                "tsb_prob": [p],
                "tsb_size": [z],
                "tsb_fc": [None if z is None else p * z],
            }
        )
        return pd.DataFrame(row)

    return fan_out_groups(df, *part_cols).groupBy(*part_cols).applyInPandas(_tsb, schema=schema)


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
) -> DataFrame:
    """Two-sample log-rank test (Mantel-Cox; survival tier beside
    :func:`kaplan_meier`, behavioral spec src/stats/hypothesis.rs
    family): at each distinct event time the observed group-1 events
    are compared with the hypergeometric expectation given the risk
    sets; O−E sums to the test statistic, V to its variance, and
    chi2 = (O−E)²/V is 1-df chi-square under H0 (equal hazards).

    ``group_col`` must be 0/1; ``event_col`` 1 = event, 0 = censored.
    One row out: (n1, n0, o1, e1, v, chi2). ``chi2`` is NULL when
    v = 0 (degenerate risk sets or an empty arm — the test carries no
    information), never Infinity/NaN.

    Scale: one groupBy(duration) shuffle; the risk-set cumulative runs
    over DISTINCT durations (bounded by the observation calendar, not
    data volume — the q334 whitelist argument); expectation/variance
    terms are summed as quantized exact longs, so the statistic is
    partition-order invariant.
    """
    from pandrs_spark.functions.deterministic import quantize

    g = F.col(group_col)
    e = F.col(event_col)
    grp = df.groupBy(duration_col).agg(
        F.sum(F.when((g == 1) & (e == 1), 1).otherwise(0)).alias("d1"),
        F.sum(F.when((g == 0) & (e == 1), 1).otherwise(0)).alias("d0"),
        F.sum(F.when(g == 1, 1).otherwise(0)).alias("a1"),
        F.sum(F.when(g == 0, 1).otherwise(0)).alias("a0"),
    )
    tot = df.agg(
        F.sum(F.when(g == 1, 1).otherwise(0)).cast("long").alias("n1_total"),
        F.sum(F.when(g == 0, 1).otherwise(0)).cast("long").alias("n0_total"),
    )
    w_prev = (
        Window.orderBy(duration_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risked = grp.crossJoin(F.broadcast(tot)).select(
        "*",
        (
            F.col("n1_total")
            - F.coalesce(F.sum(F.col("a1")).over(w_prev), F.lit(0))
        ).alias("n1"),
        (
            F.col("n0_total")
            - F.coalesce(F.sum(F.col("a0")).over(w_prev), F.lit(0))
        ).alias("n0"),
    )
    dt = (F.col("d1") + F.col("d0")).cast("double")
    nt = (F.col("n1") + F.col("n0")).cast("double")
    n1d = F.col("n1").cast("double")
    e1_term = dt * n1d / nt
    v_term = F.when(
        nt > 1,
        dt
        * (n1d / nt)
        * (1 - n1d / nt)
        * (nt - dt)
        / (nt - 1),
    ).otherwise(F.lit(0.0))
    terms = risked.filter(F.col("d1") + F.col("d0") > 0)
    out = terms.agg(
        F.min("n1_total").alias("n1"),
        F.min("n0_total").alias("n0"),
        F.sum("d1").cast("long").alias("o1"),
        (F.sum(quantize(e1_term, 9)).cast("double") / 1e9).alias("e1"),
        (F.sum(quantize(v_term, 9)).cast("double") / 1e9).alias("v"),
    )
    # v = 0 (every distinct event time has n1+n0 <= 1, or one arm is
    # empty) means the test carries no information: chi2 is NULL by
    # contract rather than Infinity/NaN from a raw divide.
    return out.withColumn(
        "chi2",
        F.when(
            F.col("v") > 0,
            (F.col("o1") - F.col("e1"))
            * (F.col("o1") - F.col("e1"))
            / F.col("v"),
        ),
    )


def reorder_policy_sim(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str],
    reorder_point: float,
    order_up_to: float,
) -> DataFrame:
    """(s, S) inventory replenishment simulation per series (ops tier
    beside :func:`clamped_cumsum`; the reorder-policy fold is the
    state machine behind safety-stock planning). Starting full at S,
    each period serves what it can, counts a stockout when demand
    exceeds on-hand, and reorders up to S whenever the post-demand
    position falls below s (zero lead time — the textbook base case):

        served    = min(x, on_hand)
        on_hand  := max(on_hand - x, 0)
        stockout += 1{x > on_hand_before}
        if on_hand < s: orders += 1; on_hand := S

    One row per series: (n_periods, n_stockouts, n_orders,
    final_on_hand, fill_rate = 1 - stockouts/periods). Per-series
    applyInPandas fold — horizontally scalable like Croston/TSB."""
    order_cols = list(order_by)
    part_cols = list(partition_by)
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in part_cols
    )
    schema = (
        key_fields + ", n_periods long, n_stockouts long, n_orders long, "
        "final_on_hand double, fill_rate double"
    )
    s_pt, s_up = float(reorder_point), float(order_up_to)

    def _sim(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_cols, kind="mergesort")
        xs = pdf[value_col].to_numpy(dtype=float)
        oh, orders, so = s_up, 0, 0
        for x in xs:
            if x > oh:
                so += 1
            oh = max(oh - x, 0.0)
            if oh < s_pt:
                orders += 1
                oh = s_up
        row = {c: [pdf[c].iloc[0]] for c in part_cols}
        row.update(
            {
                "n_periods": [len(xs)],
                "n_stockouts": [so],
                "n_orders": [orders],
                "final_on_hand": [oh],
                "fill_rate": [1.0 - so / len(xs) if len(xs) else None],
            }
        )
        return pd.DataFrame(row)

    return fan_out_groups(df, *part_cols).groupBy(*part_cols).applyInPandas(_sim, schema=schema)


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator — the integrated-hazard
    twin of :func:`kaplan_meier` (survival surface of
    src/stats/mod.rs): H(t) = Σ_{t_i ≤ t} d_i/n_i with the Aalen
    variance Σ d_i/n_i². Identical distributed shape to KM: one
    groupBy(duration) shuffle to (d, c) counts, then prefix windows
    over the DISTINCT duration table (bounded by the calendar, not the
    subject count). Returns rows at event times:
    (duration, n_risk, n_events, cum_hazard, hazard_var).
    """
    grp = df.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.col(event_col)).alias("d"),
        F.sum(1 - F.col(event_col)).alias("c"),
    )
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    w_prior = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    na = (
        grp.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_total")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prior), F.lit(0)),
        )
        .withColumn(
            "cum_hazard",
            F.sum(F.col("d") * 1.0 / F.col("n_risk")).over(w_run),
        )
        .withColumn(
            "hazard_var",
            F.sum(
                F.col("d") * 1.0 / (F.col("n_risk") * F.col("n_risk"))
            ).over(w_run),
        )
    )
    return na.filter(F.col("d") > 0).select(
        F.col("t").alias("duration"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        "cum_hazard",
        "hazard_var",
    )


def holt_damped_forecast(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str],
    alpha: float,
    beta: float,
    phi: float = 0.9,
    horizon: int = 1,
    out_col: str = "holt_damped_fc",
) -> DataFrame:
    """Damped-trend Holt forecast (Gardner-McKenzie 1985; the damped
    member of the exponential family beside :func:`holt_forecast` —
    src/time_series/forecasting.rs:453 is the behavioral spec for the
    undamped recursion):

        l_t = α·x_t + (1−α)(l_{t−1} + φ·b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·φ·b_{t−1}
        x̂_{t+h} = l_t + (Σ_{i=1..h} φ^i)·b_t

    φ < 1 flattens the trend extrapolation — the production default
    for long horizons. Same per-series applyInPandas fold shape as
    Holt; the oracle replays the identical recursion via list_reduce.
    """
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema += f", {out_col} double"
    order_cols = list(order_by)
    phi_h = sum(phi**i for i in range(1, horizon + 1))

    def _fold(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(
            drop=True
        )
        vals = pdf[value_col].to_numpy(dtype=float)
        fc = [float("nan")] * len(vals)
        if len(vals) >= 2:
            level, trend = vals[0], vals[1] - vals[0]
            fc[0] = level + phi_h * trend
            for t in range(1, len(vals)):
                prev_level = level
                level = alpha * vals[t] + (1 - alpha) * (level + phi * trend)
                trend = beta * (level - prev_level) + (1 - beta) * phi * trend
                fc[t] = level + phi_h * trend
        pdf[out_col] = fc
        return pdf

    return fan_out_groups(df, *partition_by).groupBy(*partition_by).applyInPandas(_fold, schema=schema)


def page_hinkley(
    df: DataFrame,
    value_col: str,
    order_col: str,
    delta: float = 0.005,
    lam: float = 1.0,
) -> DataFrame:
    """Page-Hinkley change detection (Page 1954; the streaming-style
    drift alarm beside the offline CUSUM scan):

        cum_t = Σ_{i≤t} (x_i − x̄_i − δ)   with x̄_i the running mean,
        PH_t  = cum_t − min_{s≤t} cum_s,   alarm when PH_t > λ.

    The running mean linearizes into prefix sums, so the whole fold is
    window algebra over the input spine — no recursion. Returns one row
    (n_days, ph_max, n_alarm_days, first_alarm_idx).

    Scale: the input is expected to be a calendar-bounded series (one
    row per day/week), so the partitionless ordered windows here are
    bounded by the calendar, not the data (the same whitelist argument
    as the resample family). All running sums are quantized exact longs
    → partition-order invariant (pinned in test_fold_invariance.py).
    """
    from pandrs_spark.functions.deterministic import quantize

    w_in = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_ord = Window.orderBy(order_col)
    pref = df.select(
        F.col(order_col).alias("__o"),
        F.col(value_col).alias("x"),
        F.row_number().over(w_ord).alias("i"),
        (F.sum(quantize(value_col, 6)).over(w_in).cast("double") / 1e6).alias(
            "sx"
        ),
    )
    w_run = Window.orderBy("__o").rowsBetween(Window.unboundedPreceding, 0)
    terms = pref.select(
        "__o",
        "i",
        (F.col("x") - F.col("sx") / F.col("i") - F.lit(delta)).alias("term"),
    )
    cum = terms.select(
        "__o",
        "i",
        (F.sum(quantize("term", 6)).over(w_run).cast("double") / 1e6).alias(
            "c"
        ),
    )
    ph = cum.select(
        "__o", "i", "c", (F.col("c") - F.min("c").over(w_run)).alias("ph_t")
    )
    return ph.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        (quantize(F.max("ph_t"), 6) / 1e6).alias("ph_max"),
        F.sum(F.when(F.col("ph_t") > F.lit(lam), 1).otherwise(0))
        .cast("long")
        .alias("n_alarm_days"),
        F.min(F.when(F.col("ph_t") > F.lit(lam), F.col("i")))
        .cast("long")
        .alias("first_alarm_idx"),
    )
