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


def test_expire_versions_keeps_latest_and_deletes_orphans(spark, tmp_path):
    import os

    from pandrs_spark.sources.io import expire_table_versions

    t = str(tmp_path / "vt4")
    commit_table_version(
        spark, spark.range(5).withColumnRenamed("id", "k"), t, "append"
    )
    commit_table_version(
        spark, spark.range(5, 8).withColumnRenamed("id", "k"), t, "append"
    )
    commit_table_version(
        spark, spark.range(100, 101).withColumnRenamed("id", "k"), t, "overwrite"
    )
    stats = expire_table_versions(t, keep_last=1)
    assert stats["versions_removed"] == 2
    assert stats["versions_kept"] == 1
    # latest still reads; expired versions raise cleanly
    assert read_table_version(spark, t).count() == 1
    with pytest.raises(FileNotFoundError):
        read_table_version(spark, t, 1)
    # commit-1/2 data files (orphaned by the overwrite) are gone
    assert not os.path.exists(os.path.join(t, "data", "commit-1")) or not any(
        f.endswith(".parquet")
        for f in os.listdir(os.path.join(t, "data", "commit-1"))
    )
    assert stats["files_deleted"] >= 2


def test_expire_versions_preserves_shared_files(spark, tmp_path):
    from pandrs_spark.sources.io import expire_table_versions

    t = str(tmp_path / "vt5")
    commit_table_version(
        spark, spark.range(4).withColumnRenamed("id", "k"), t, "append"
    )
    commit_table_version(
        spark, spark.range(4, 6).withColumnRenamed("id", "k"), t, "append"
    )
    # v2 (APPEND) still references v1's files — expiry of v1 must NOT
    # delete them
    stats = expire_table_versions(t, keep_last=1)
    assert stats["versions_removed"] == 1
    assert stats["files_deleted"] == 0
    assert read_table_version(spark, t).count() == 6


def test_versioned_table_rejects_remote_schemes(spark, tmp_path):
    """Manifest IO is local-filesystem-only (ADVICE r6): a remote
    scheme must fail fast instead of writing manifests to the wrong
    place or expiring nothing while reporting success."""
    import pytest

    from pandrs_spark.sources.io import (
        commit_table_version,
        expire_table_versions,
        read_table_version,
    )

    df = spark.range(3)
    with pytest.raises(ValueError, match="local"):
        commit_table_version(spark, df, "s3a://bucket/tbl")
    with pytest.raises(ValueError, match="local"):
        read_table_version(spark, "hdfs://nn/tbl")
    with pytest.raises(ValueError, match="local"):
        expire_table_versions("gs://bucket/tbl")
