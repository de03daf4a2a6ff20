"""Deterministic sampling (reference sample :310, train_test_split)."""

from __future__ import annotations

from pandrs_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
    train_test_split_hash,
)


def test_deterministic_sample_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    a = {r["id"] for r in deterministic_sample(df.repartition(3), ["id"], 0.25).collect()}
    b = {r["id"] for r in deterministic_sample(df.repartition(11), ["id"], 0.25).collect()}
    assert a == b
    assert 0.2 < len(a) / 2000 < 0.3


def test_stratified_rates(spark):
    rows = [(i, "maj" if i % 10 else "min") for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, cls string")
    out = stratified_sample(df, "cls", {"maj": 0.1, "min": 1.0}, ["id"])
    got = {r["cls"]: r["n"] for r in out.groupBy("cls").count().withColumnRenamed("count", "n").collect()}
    assert got["min"] == 500          # rate 1.0 keeps every rare row
    assert 300 < got["maj"] < 600     # ~10% of 4500


def test_stratified_unlisted_stratum_dropped(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, cls string")
    out = stratified_sample(df, "cls", {"a": 1.0}, ["id"])
    assert [r["cls"] for r in out.collect()] == ["a"]


def test_train_test_split_hash_partition(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    train, test = train_test_split_hash(df, ["id"], test_frac=0.3)
    n_tr, n_te = train.count(), test.count()
    assert n_tr + n_te == 1000
    assert 0.2 < n_te / 1000 < 0.4
    # disjoint and entity-stable
    both = train.select("id").intersect(test.select("id")).count()
    assert both == 0
