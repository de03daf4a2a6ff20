"""Multimodal (image/audio/video) column handling for training-data
pipelines (BASELINE.json north star; no reference equivalent).

Representation: media is an opaque ``binary`` column plus a typed
metadata struct — the lakehouse-native layout (same shape as
``spark.read.format("binaryFile")``):

    media: struct<content: binary, mime: string, meta: struct<...>>

Processing model: decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages. The Spark-side plumbing
(schemas, batching, partition sizing) is real and tested; the actual
codec calls are STUBBED behind ``_decode_image_bytes`` because this
container ships no image/audio libraries — swap in PIL/libav there and
nothing else changes.

Scale notes: binary payloads make rows wide — repartition by byte
budget (``repartition_for_payload``) so a task's Arrow batch stays in
memory; metadata-only predicates (mime, width, dataset split) are
ordinary columns, so Catalyst prunes/pushes them down and never
touches the bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_struct",
    "media_stats",
    "decode_image_features",
    "sample_video_frames",
    "repartition_for_payload",
]

MEDIA_SCHEMA = (
    "struct<content:binary,mime:string,"
    "meta:struct<width:int,height:int,n_frames:int,sample_rate:int>>"
)


def attach_media_struct(
    df: DataFrame,
    content_col: str,
    mime: str,
    width: Column | None = None,
    height: Column | None = None,
    n_frames: Column | None = None,
    sample_rate: Column | None = None,
    out: str = "media",
) -> DataFrame:
    """Pack raw bytes + typed metadata into the canonical media struct."""
    null_int = F.lit(None).cast("int")
    return df.withColumn(
        out,
        F.struct(
            F.col(content_col).alias("content"),
            F.lit(mime).alias("mime"),
            F.struct(
                (width if width is not None else null_int).alias("width"),
                (height if height is not None else null_int).alias("height"),
                (n_frames if n_frames is not None else null_int).alias("n_frames"),
                (sample_rate if sample_rate is not None else null_int).alias(
                    "sample_rate"
                ),
            ).alias("meta"),
        ),
    )


def media_stats(df: DataFrame, media_col: str = "media", keep: tuple = ()) -> DataFrame:
    """Byte-level stats without decoding: size, checksum, mime — pure
    column expressions over the binary payload. ``keep`` carries id/key
    columns through for downstream joins/groupBys."""
    m = F.col(media_col)
    return df.select(
        *[F.col(c) for c in keep],
        F.length(m["content"]).alias("n_bytes"),
        F.md5(m["content"]).alias("checksum"),
        m["mime"].alias("mime"),
        m["meta"]["width"].alias("width"),
        m["meta"]["height"].alias("height"),
    )


def _decode_image_bytes(content: bytes) -> tuple[int, int, list[float]]:
    """STUB decoder. Real pipelines replace this with PIL/torchvision;
    here: deterministic fake features derived from the byte stream so
    the distributed plumbing is fully testable.

    Raises NotImplementedError for payloads that declare themselves
    real images (magic bytes), making accidental production use loud.
    """
    if content[:8] == b"\x89PNG\r\n\x1a\n" or content[:3] == b"\xff\xd8\xff":
        raise NotImplementedError(
            "real image decoding requires PIL/libvips — not shipped in this container"
        )
    h = hashlib.sha256(content).digest()
    width = 1 + h[0] % 64
    height = 1 + h[1] % 64
    feats = [b / 255.0 for b in h[:8]]
    return width, height, feats


def decode_image_features(
    df: DataFrame, media_col: str = "media", id_col: str = "id"
) -> DataFrame:
    """Decode images → (width, height, feature vector) via Arrow-batched
    mapInPandas. Output schema is fixed and narrow; the binary column is
    dropped as early as possible so the shuffle (if any) moves features,
    not payloads."""
    out_schema = f"{id_col} long, width int, height int, features array<double>"

    def _decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, ws, hs, fs = [], [], [], []
            for _, row in pdf.iterrows():
                w, h, feats = _decode_image_bytes(bytes(row[media_col]["content"]))
                ids.append(row[id_col])
                ws.append(w)
                hs.append(h)
                fs.append(feats)
            yield pd.DataFrame(
                {id_col: ids, "width": ws, "height": hs, "features": fs}
            )

    return df.select(id_col, media_col).mapInPandas(_decode, schema=out_schema)


def sample_video_frames(
    df: DataFrame, every_n: int, media_col: str = "media", id_col: str = "id"
) -> DataFrame:
    """Frame-sampling plan for video payloads: expand (id, n_frames)
    into one row per sampled frame index — pure column ops; the decode
    of each sampled frame would then go through the mapInPandas stage.
    """
    m = F.col(media_col)
    frames = F.sequence(F.lit(0), m["meta"]["n_frames"] - 1, F.lit(every_n))
    return df.select(
        F.col(id_col),
        F.explode(frames).alias("frame_idx"),
        m["mime"].alias("mime"),
    )


def repartition_for_payload(
    df: DataFrame, avg_payload_bytes: int, target_partition_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Size partitions by byte budget, not row count — with multimodal
    payloads a 128 MB partition may be only a few thousand rows. The
    byte budget is an UPPER bound on partition size, so the count is
    floored at the cluster's default parallelism: a corpus small enough
    to fit one 128 MB partition must still decode on every core, not
    serialize through one task (same starvation as util.fan_out fixes
    for explode-heavy text work)."""
    rows = df.count()
    parts = max(1, (rows * avg_payload_bytes) // target_partition_bytes)
    parts = max(parts, df.sparkSession.sparkContext.defaultParallelism)
    return df.repartition(int(parts))
