"""Property-based tests (hypothesis): the reference's example-based
suites (SURVEY §5) hand-pick values; these generate them. Two invariant
families:

1. determinism — quantized aggregation is partition-count-invariant and
   matches an exact Python model;
2. pandas parity — rank/rolling/ffill agree with pandas on arbitrary
   data including ties, NaN-free floats and duplicates.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from pandrs_spark.functions.deterministic import dsum
from pandrs_spark.operators.windows import ordered_window, rank_method, rolling

# Bounded, NaN/inf-free doubles: the deterministic layer quantizes at
# scale 2, so generate values that stay far from the int64 envelope.
floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def _model_dsum(vals, scale=2):
    m = 10**scale
    total = sum(
        int(math.copysign(math.floor(abs(v) * m + 0.5), v)) for v in vals
    )
    return total / m


@settings(max_examples=12, deadline=None)
@given(st.lists(floats, min_size=1, max_size=40), st.integers(1, 6))
def test_dsum_partition_invariant_and_exact(spark, vals, nparts):
    df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(nparts)
    got = df.agg(dsum("v").alias("s")).first()["s"]
    assert got == pytest.approx(_model_dsum(vals), abs=1e-9)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(-5, 5), min_size=1, max_size=30))
def test_rank_methods_match_pandas(spark, vals):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i bigint, v double"
    )
    out = df.select(
        "i",
        rank_method("v", None, "average").alias("avg_r"),
        rank_method("v", None, "min").alias("min_r"),
        rank_method("v", None, "max").alias("max_r"),
        rank_method("v", None, "dense").alias("dense_r"),
    ).orderBy("i")
    got = out.collect()
    s = pd.Series(vals, dtype=float)
    for method, col in (("average", "avg_r"), ("min", "min_r"), ("max", "max_r"), ("dense", "dense_r")):
        ref = s.rank(method=method).tolist()
        for r, e in zip(got, ref):
            assert float(r[col]) == pytest.approx(e), (method, vals)


@settings(max_examples=10, deadline=None)
@given(st.lists(floats, min_size=1, max_size=30), st.integers(1, 5))
def test_rolling_mean_matches_pandas(spark, vals, window):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i bigint, v double"
    )
    w = ordered_window("i")
    got = [
        r["m"]
        for r in df.select("i", rolling("v", window, w, "mean").alias("m"))
        .orderBy("i")
        .collect()
    ]
    ref = pd.Series(vals).rolling(window).mean().tolist()
    for g, e in zip(got, ref):
        if e != e:  # NaN
            assert g is None
        else:
            assert g == pytest.approx(e, rel=1e-9, abs=1e-9)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.integers(-100, 100)), min_size=1, max_size=30)
)
def test_ffill_matches_pandas(spark, vals):
    from pandrs_spark.operators.timeseries import ffill

    df = spark.createDataFrame(
        [(i, float(v) if v is not None else None) for i, v in enumerate(vals)],
        "i bigint, v double",
    )
    from pyspark.sql import Window

    w = Window.orderBy("i")
    got = [
        r["f"] for r in df.select("i", ffill("v", w).alias("f")).orderBy("i").collect()
    ]
    ref = pd.Series([float(v) if v is not None else None for v in vals]).ffill().tolist()
    for g, e in zip(got, ref):
        if e != e:
            assert g is None
        else:
            assert g == e
