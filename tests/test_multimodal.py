"""Multimodal column tests: struct schema, byte stats, stubbed decode
through real mapInPandas plumbing, frame-sampling plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandrs_spark.operators.multimodal import (
    attach_media_struct,
    decode_image_features,
    media_stats,
    sample_video_frames,
)


@pytest.fixture()
def media_df(spark):
    rows = [(1, b"fake-image-bytes-1"), (2, b"fake-image-bytes-22")]
    df = spark.createDataFrame(rows, "id long, raw binary")
    return attach_media_struct(
        df, "raw", "image/fake", width=F.lit(32), height=F.lit(16)
    ).drop("raw")


def test_media_struct_schema(media_df):
    f = media_df.schema["media"]
    names = [x.name for x in f.dataType.fields]
    assert names == ["content", "mime", "meta"]


def test_media_stats_no_decode(media_df):
    rows = {r.n_bytes: r for r in media_stats(media_df).collect()}
    assert set(rows) == {18, 19}
    assert all(len(r.checksum) == 32 for r in rows.values())
    assert all(r.width == 32 and r.height == 16 for r in rows.values())


def test_decode_image_features_deterministic(media_df):
    out = {r.id: r for r in decode_image_features(media_df).collect()}
    assert set(out) == {1, 2}
    assert len(out[1].features) == 8
    again = {r.id: r for r in decode_image_features(media_df).collect()}
    assert out[1].features == again[1].features
    assert 1 <= out[1].width <= 64


def test_decode_rejects_real_images(spark):
    df = spark.createDataFrame(
        [(1, b"\x89PNG\r\n\x1a\nrest")], "id long, raw binary"
    )
    media = attach_media_struct(df, "raw", "image/png")
    with pytest.raises(Exception, match="NotImplementedError|real image"):
        decode_image_features(media).collect()


def test_sample_video_frames(spark):
    df = spark.createDataFrame([(7, b"vid")], "id long, raw binary")
    media = attach_media_struct(
        df, "raw", "video/fake", n_frames=F.lit(10)
    )
    out = sample_video_frames(media, every_n=3).collect()
    assert [r.frame_idx for r in out] == [0, 3, 6, 9]


def test_repartition_for_payload_parallelism_floor(spark):
    """A corpus that fits one byte-budget partition must still fan out
    to every core — the byte budget is an upper bound on partition
    SIZE, not a license to serialize the decode."""
    from pandrs_spark.operators.multimodal import repartition_for_payload

    df = spark.createDataFrame(
        [(i, b"x" * 100) for i in range(200)], "id long, content binary"
    ).coalesce(1)
    out = repartition_for_payload(df, avg_payload_bytes=100)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # and the byte budget still dominates for large corpora
    big = repartition_for_payload(
        df, avg_payload_bytes=512 * 1024 * 1024
    )  # 200 rows x 512MB >> 128MB target
    assert big.rdd.getNumPartitions() > spark.sparkContext.defaultParallelism
