"""Embedding similarity tests on crafted vectors (known cosines)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandrs_spark.operators.similarity import cosine, cosine_topk, nearest_neighbors


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [2.0, 0.0, 0.0], 0),   # parallel to 0 -> cos 1
        (2, [0.0, 1.0, 0.0], 1),   # orthogonal -> cos 0
        (3, [1.0, 1.0, 0.0], 1),   # cos ~ 0.7071
        (4, [-1.0, 0.0, 0.0], 2),  # opposite -> cos -1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_cosine_expression(spark):
    df = _vecs(spark)
    a = df.filter("vec_id = 0").select(F.col("embedding").alias("a"))
    b = df.filter("vec_id = 3").select(F.col("embedding").alias("b"))
    val = a.crossJoin(b).select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0].c
    assert abs(val - 0.70710678) < 1e-6


def test_cosine_topk_ordering(spark):
    df = _vecs(spark)
    out = cosine_topk(df.filter("vec_id <> 0"), df.filter("vec_id = 0"), k=4)
    got = [(r.vec_id, r.sim) for r in out.collect()]
    assert [g[0] for g in got] == [1, 3, 2, 4]
    assert got[0][1] == 1.0 and got[-1][1] == -1.0


def test_nearest_neighbors_labels(spark):
    df = _vecs(spark)
    nn = {r.vec_id: r.nn_id for r in nearest_neighbors(df, label_col="label").collect()}
    assert nn[0] == 1 and nn[1] == 0
    assert nn[3] in (0, 1, 2)  # 45 degrees from both axes; tie broken by id -> 0
    assert nn[3] == 0
