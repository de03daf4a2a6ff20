"""Snapshot versioning (commit_table_version / read_table_version)."""

import pytest

from pandrs_spark.sources.io import commit_table_version, read_table_version


def test_snapshot_isolation_and_overwrite(spark, tmp_path):
    t = str(tmp_path / "vt")
    df1 = spark.range(0, 10).withColumnRenamed("id", "k")
    df2 = spark.range(10, 15).withColumnRenamed("id", "k")
    df3 = spark.range(100, 102).withColumnRenamed("id", "k")
    assert commit_table_version(spark, df1, t, "append") == 1
    assert commit_table_version(spark, df2, t, "append") == 2
    assert commit_table_version(spark, df3, t, "overwrite") == 3
    # latest = overwrite result
    assert read_table_version(spark, t).count() == 2
    # time travel: v1 untouched by later commits, v2 = append union
    assert read_table_version(spark, t, 1).count() == 10
    assert read_table_version(spark, t, 2).count() == 15
    assert sorted(
        r["k"] for r in read_table_version(spark, t, 3).collect()
    ) == [100, 101]


def test_snapshot_missing_version_raises(spark, tmp_path):
    t = str(tmp_path / "vt2")
    commit_table_version(
        spark, spark.range(3).withColumnRenamed("id", "k"), t, "append"
    )
    with pytest.raises(FileNotFoundError):
        read_table_version(spark, t, 7)


def test_first_commit_may_be_overwrite(spark, tmp_path):
    t = str(tmp_path / "vt3")
    assert (
        commit_table_version(
            spark, spark.range(4).withColumnRenamed("id", "k"), t, "overwrite"
        )
        == 1
    )
    assert read_table_version(spark, t).count() == 4
