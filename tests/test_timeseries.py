"""Time-series operator tests — resample/date_range/gap-filling
(reference: tests/temporal_test.rs, src/time_series/core.rs)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from pandrs_spark.operators.timeseries import (
    bfill,
    date_range,
    ffill,
    interpolate_linear_cols,
    resample,
)


def test_date_range_daily(spark):
    out = date_range(spark, "2024-01-01 00:00:00", "2024-01-05 00:00:00").collect()
    assert len(out) == 5
    assert out[0].ts == dt.datetime(2024, 1, 1)
    assert out[-1].ts == dt.datetime(2024, 1, 5)


def test_date_range_hourly(spark):
    out = date_range(spark, "2024-01-01 00:00:00", "2024-01-01 06:00:00", "1 hour")
    assert out.count() == 7


def test_resample_daily_sum(spark):
    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 3), 1.0),
            (dt.datetime(2024, 1, 1, 15), 2.0),
            (dt.datetime(2024, 1, 2, 1), 10.0),
        ],
        "ts timestamp, v double",
    )
    out = resample(df, "ts", "day", [F.sum("v").alias("s")]).orderBy("bucket").collect()
    assert [(r.bucket.day, r.s) for r in out] == [(1, 3.0), (2, 10.0)]


def _gappy(spark):
    rows = [
        (1, None), (2, 10.0), (3, None), (4, None), (5, 40.0), (6, None),
    ]
    return spark.createDataFrame(rows, "i long, v double")


def test_ffill_bfill(spark):
    w = Window.orderBy("i")
    out = _gappy(spark).select(
        "i", ffill("v", w).alias("f"), bfill("v", w).alias("b")
    ).orderBy("i").collect()
    assert [r.f for r in out] == [None, 10.0, 10.0, 10.0, 40.0, 40.0]
    assert [r.b for r in out] == [10.0, 10.0, 40.0, 40.0, 40.0, None]


def test_interpolate_linear(spark):
    w = Window.orderBy("i")
    out = (
        _gappy(spark)
        .select("i", interpolate_linear_cols("v", F.col("i"), w).alias("x"))
        .orderBy("i")
        .collect()
    )
    # leading null -> bfill(10); interior 3,4 -> 20, 30; trailing -> ffill(40)
    assert [r.x for r in out] == [10.0, 10.0, 20.0, 30.0, 40.0, 40.0]
