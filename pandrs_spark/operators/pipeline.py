"""sklearn-compatible estimator / Pipeline surface (SURVEY.md §2.13).

Reference: /root/reference src/ml/pipeline/ (Pipeline stages),
src/ml/sklearn_compat.rs (fit/transform estimator protocol, 962 LoC),
src/ml/preprocessing/mod.rs (StandardScaler :14, MinMaxScaler :146,
OneHotEncoder :302, PolynomialFeatures :348, Binner :394, Imputer :447).

The window-expression tier in ``operators/ml.py`` computes fit
statistics inline (one pass, per-group).  This module is the
*estimator* tier: ``fit(df)`` runs ONE Spark aggregation and collects
the tiny fitted-state dict to the driver; ``transform(df)`` applies
pure literal expressions — no shuffle, no stats recomputation, and no
train→test leakage (fit on train, transform anything).  At 100 TB the
fit is a single partial-agg shuffle producing one row; every transform
is embarrassingly parallel map-side work that stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "StandardScalerEst",
    "MinMaxScalerEst",
    "ImputerEst",
    "OneHotEncoderEst",
    "BinnerEst",
    "PolynomialFeaturesEst",
    "Pipeline",
]


class _Estimator:
    """fit(df) -> self, transform(df) -> DataFrame, fit_transform(df)."""

    def fit(self, df: DataFrame) -> "_Estimator":  # pragma: no cover
        raise NotImplementedError

    def transform(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)

    def _check_fitted(self):
        if not getattr(self, "fitted_", None):
            raise RuntimeError(f"{type(self).__name__} is not fitted")


class StandardScalerEst(_Estimator):
    """(x - mean) / stddev with stats frozen at fit time
    (preprocessing/mod.rs:14, sklearn_compat.rs)."""

    def __init__(self, cols, suffix: str = "_z"):
        self.cols = list(cols)
        self.suffix = suffix
        self.fitted_ = None

    def fit(self, df: DataFrame) -> "StandardScalerEst":
        aggs = []
        for c in self.cols:
            aggs += [F.avg(c).alias(f"mu_{c}"), F.stddev_samp(c).alias(f"sd_{c}")]
        self.fitted_ = df.agg(*aggs).collect()[0].asDict()
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        self._check_fitted()
        s = self.fitted_
        for c in self.cols:
            df = df.withColumn(
                c + self.suffix,
                (F.col(c) - F.lit(s[f"mu_{c}"])) / F.lit(s[f"sd_{c}"]),
            )
        return df


class MinMaxScalerEst(_Estimator):
    """(x - min) / (max - min) with the fit-time range
    (preprocessing/mod.rs:146)."""

    def __init__(self, cols, suffix: str = "_mm"):
        self.cols = list(cols)
        self.suffix = suffix
        self.fitted_ = None

    def fit(self, df: DataFrame) -> "MinMaxScalerEst":
        aggs = []
        for c in self.cols:
            aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
        self.fitted_ = df.agg(*aggs).collect()[0].asDict()
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        self._check_fitted()
        s = self.fitted_
        for c in self.cols:
            lo, hi = s[f"lo_{c}"], s[f"hi_{c}"]
            df = df.withColumn(
                c + self.suffix, (F.col(c) - F.lit(lo)) / F.lit(hi - lo)
            )
        return df


class ImputerEst(_Estimator):
    """Fill nulls with the fit-time mean or median
    (preprocessing/mod.rs:447)."""

    def __init__(self, cols, strategy: str = "mean"):
        if strategy not in ("mean", "median"):
            raise ValueError("strategy must be 'mean' or 'median'")
        self.cols = list(cols)
        self.strategy = strategy
        self.fitted_ = None

    def fit(self, df: DataFrame) -> "ImputerEst":
        if self.strategy == "mean":
            aggs = [F.avg(c).alias(c) for c in self.cols]
        else:
            aggs = [F.expr(f"median({c})").alias(c) for c in self.cols]
        self.fitted_ = df.agg(*aggs).collect()[0].asDict()
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        self._check_fitted()
        return df.na.fill({c: self.fitted_[c] for c in self.cols})


class OneHotEncoderEst(_Estimator):
    """Dummy columns with a vocabulary frozen at fit time — unseen
    categories at transform become all-zero rows, exactly sklearn's
    ``handle_unknown='ignore'`` (preprocessing/mod.rs:302)."""

    def __init__(self, col: str, prefix: str | None = None):
        self.col = col
        self.prefix = prefix or col
        self.fitted_ = None

    def fit(self, df: DataFrame) -> "OneHotEncoderEst":
        self.fitted_ = [
            r[0]
            for r in df.select(self.col).distinct().orderBy(self.col).collect()
            if r[0] is not None
        ]
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if self.fitted_ is None:
            raise RuntimeError("OneHotEncoderEst is not fitted")
        for cat in self.fitted_:
            df = df.withColumn(
                f"{self.prefix}_{cat}",
                F.when(F.col(self.col) == cat, 1).otherwise(0),
            )
        return df


class BinnerEst(_Estimator):
    """Equal-width bins with edges from the fit data; transform values
    outside the fit range clamp to the edge bins
    (preprocessing/mod.rs:394)."""

    def __init__(self, col: str, n_bins: int, out: str = "bin"):
        self.col = col
        self.n_bins = n_bins
        self.out = out
        self.fitted_ = None

    def fit(self, df: DataFrame) -> "BinnerEst":
        self.fitted_ = (
            df.agg(F.min(self.col).alias("lo"), F.max(self.col).alias("hi"))
            .collect()[0]
            .asDict()
        )
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        self._check_fitted()
        lo, hi = self.fitted_["lo"], self.fitted_["hi"]
        width = (hi - lo) / self.n_bins
        return df.withColumn(
            self.out,
            F.greatest(
                F.least(
                    F.floor((F.col(self.col) - F.lit(lo)) / F.lit(width)),
                    F.lit(self.n_bins - 1),
                ),
                F.lit(0),
            ).cast("int"),
        )


class PolynomialFeaturesEst(_Estimator):
    """Stateless powers + pairwise interactions; estimator-shaped for
    pipeline composition (preprocessing/mod.rs:348)."""

    def __init__(self, cols, degree: int = 2):
        self.cols = list(cols)
        self.degree = degree
        self.fitted_ = None

    def fit(self, df: DataFrame) -> "PolynomialFeaturesEst":
        self.fitted_ = True
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        for c in self.cols:
            for d in range(2, self.degree + 1):
                df = df.withColumn(f"{c}_pow{d}", F.pow(F.col(c), d))
        for i, a in enumerate(self.cols):
            for b in self.cols[i + 1 :]:
                df = df.withColumn(f"{a}_x_{b}", F.col(a) * F.col(b))
        return df


class Pipeline(_Estimator):
    """Ordered chain of estimators (src/ml/pipeline/): ``fit`` runs
    fit_transform through the stages so each sees its predecessors'
    output; ``transform`` replays the frozen stages.  Fit cost is one
    tiny aggregation per stateful stage; the transform plan is a single
    stage of narrow projections Catalyst collapses into one codegen
    span."""

    def __init__(self, steps):
        self.steps = list(steps)
        self.fitted_ = None

    def fit(self, df: DataFrame) -> "Pipeline":
        cur = df
        for _name, est in self.steps:
            cur = est.fit(cur).transform(cur)
        self.fitted_ = True
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        self._check_fitted()
        for _name, est in self.steps:
            df = est.transform(df)
        return df

    def named_steps(self) -> dict:
        return dict(self.steps)
