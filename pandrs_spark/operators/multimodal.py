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
    "decode_audio_features",
    "encode_bmp_rgb24",
    "encode_png_rgb",
    "encode_wav_pcm16",
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
    """Dispatching decoder: uncompressed BMP (24-bpp) and zlib-deflated
    PNG (8-bit RGB/RGBA — zlib is stdlib) decode FOR REAL via the
    pure-stdlib parsers (:func:`_decode_bmp_bytes`,
    :func:`_decode_png_bytes`); JPEG still raises NotImplementedError
    loudly (DCT entropy coding genuinely needs libjpeg/PIL); anything
    else falls through to the deterministic fake (features from sha256
    of the byte stream) so the distributed plumbing stays fully
    testable on arbitrary bytes.
    """
    if content[:2] == b"BM":
        import struct

        try:
            return _decode_bmp_bytes(content)
        except struct.error as e:
            # non-BMP bytes that merely start with 'BM': surface the
            # same error family as truncated payloads, not a raw
            # struct.error from header parsing
            raise ValueError(f"malformed BMP header: {e}") from e
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png_bytes(content)
    if content[:3] == b"\xff\xd8\xff":
        raise NotImplementedError(
            "real JPEG decoding requires libjpeg/PIL — not shipped in this container"
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
            # plain column zip: iterrows() builds a Series per row,
            # which dominated the per-row cost next to the actual
            # decode (round 11)
            for rid, m in zip(pdf[id_col].values, pdf[media_col].values):
                w, h, feats = _decode_image_bytes(bytes(m["content"]))
                ids.append(rid)
                ws.append(w)
                hs.append(h)
                fs.append(feats)
            yield pd.DataFrame(
                {id_col: ids, "width": ws, "height": hs, "features": fs}
            )

    # Deliberately NOT widened with fan_out (round 11, measured): at
    # sf0.1 the warm decode is ~0.5 s on one task, and repartitioning
    # ships the PAYLOAD bytes through a shuffle plus one Python-worker
    # spin-up per added task — A/B 0.51 s (as-is) vs 0.74 s (128 KB/
    # task) vs 1.30 s (16 KB/task). Callers with decode-bound corpora
    # stuck in few scan partitions should apply
    # repartition_for_payload, which sizes by payload bytes.
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


# --- Pure-stdlib codecs (round-7 BMP/WAV; round-8 adds PNG — zlib is
# stdlib, so "compressed codecs need external libs" only holds for
# entropy-coded formats). BMP (24-bpp BI_RGB), WAV (PCM16) and PNG
# (8-bit RGB/RGBA, all five scanline filters) decode for real through
# the same mapInPandas plumbing; JPEG/MP3/AAC stay honestly gated
# behind NotImplementedError. --------------------------------------------


def encode_bmp_rgb24(width: int, height: int, pixel_bytes: bytes) -> bytes:
    """Minimal BMP writer (BITMAPINFOHEADER, 24-bpp, uncompressed,
    bottom-up). ``pixel_bytes`` is ``width*height*3`` BGR bytes in
    scanline order starting at the TOP row (the writer flips to the
    BMP's bottom-up layout). Test/pipeline fixture — the product
    surface is the decoder."""
    import struct

    if len(pixel_bytes) != width * height * 3:
        raise ValueError("pixel_bytes must be width*height*3 BGR bytes")
    row = width * 3
    pad = (4 - row % 4) % 4
    body = b"".join(
        pixel_bytes[r * row : (r + 1) * row] + b"\x00" * pad
        for r in range(height - 1, -1, -1)
    )
    off = 14 + 40
    return (
        struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
        + body
    )


def _decode_bmp_bytes(content: bytes) -> tuple[int, int, list[float]]:
    """REAL pure-stdlib BMP decoder: BITMAPINFOHEADER, 24-bpp,
    uncompressed (BI_RGB), bottom-up or top-down. Returns
    (width, height, [mean_b, mean_g, mean_r] normalized to [0,1]) —
    channel means are row-order invariant, so the oracle can mirror
    them from the payload bytes without replaying the scanline flip."""
    import struct

    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    width, height = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bpp uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    height = abs(height)
    row = width * 3
    stride = row + (4 - row % 4) % 4
    if width <= 0 or height <= 0:
        raise ValueError(f"BMP header declares empty image {width}x{height}")
    if len(content) < off + (height - 1) * stride + row:
        raise ValueError(
            f"truncated BMP payload: need {off + (height - 1) * stride + row}"
            f" bytes for {width}x{height}, got {len(content)}"
        )
    sb = sg = sr = 0
    for r in range(height):
        base = off + r * stride
        line = content[base : base + row]
        sb += sum(line[0::3])
        sg += sum(line[1::3])
        sr += sum(line[2::3])
    n = width * height
    return width, height, [sb / n / 255.0, sg / n / 255.0, sr / n / 255.0]


def _decode_wav_bytes(content: bytes) -> tuple[int, int, int, float, int]:
    """REAL pure-stdlib WAV decoder via the ``wave`` module: PCM16
    only (compressed/float WAV raises). Returns
    (sample_rate, n_channels, n_frames, rms, peak) over all samples."""
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(content), "rb") as w:
            if w.getsampwidth() != 2:
                raise NotImplementedError(
                    f"only PCM16 WAV supported (sampwidth={w.getsampwidth()})"
                )
            rate, nch, nfr = w.getframerate(), w.getnchannels(), w.getnframes()
            raw = w.readframes(nfr)
    except (wave.Error, EOFError, struct.error) as e:
        raise NotImplementedError(f"unsupported WAV payload: {e}") from e
    samples = struct.unpack(f"<{len(raw) // 2}h", raw)
    if not samples:
        return rate, nch, nfr, 0.0, 0
    ss = sum(s * s for s in samples)
    return (
        rate,
        nch,
        nfr,
        (ss / len(samples)) ** 0.5,
        max(abs(s) for s in samples),
    )


def encode_wav_pcm16(sample_rate: int, samples: list[int], n_channels: int = 1) -> bytes:
    """Minimal PCM16 WAV writer (``wave`` module). Fixture twin of
    :func:`_decode_wav_bytes`."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_audio_features(
    df: DataFrame, media_col: str = "media", id_col: str = "id"
) -> DataFrame:
    """Decode audio → (sample_rate, n_channels, n_frames, rms, peak)
    via Arrow-batched mapInPandas — the audio twin of
    :func:`decode_image_features`. PCM16 WAV decodes for real
    (pure stdlib); compressed codecs raise NotImplementedError.
    The binary column is dropped after this stage so downstream
    shuffles move features, not payloads."""
    out_schema = (
        f"{id_col} long, sample_rate int, n_channels int, "
        "n_frames long, rms double, peak int"
    )

    def _decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, rates, chs, frs, rmss, peaks = [], [], [], [], [], []
            # plain column zip instead of iterrows() — see
            # decode_image_features (round 11)
            for rid, m in zip(pdf[id_col].values, pdf[media_col].values):
                rate, nch, nfr, rms, peak = _decode_wav_bytes(
                    bytes(m["content"])
                )
                ids.append(rid)
                rates.append(rate)
                chs.append(nch)
                frs.append(nfr)
                rmss.append(rms)
                peaks.append(peak)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "sample_rate": rates,
                    "n_channels": chs,
                    "n_frames": frs,
                    "rms": rmss,
                    "peak": peaks,
                }
            )

    # NOT widened — same measured negative result as
    # decode_image_features (round 11)
    return df.select(id_col, media_col).mapInPandas(_decode, schema=out_schema)


def encode_png_rgb(width: int, height: int, pixel_bytes: bytes) -> bytes:
    """Minimal PNG writer: 8-bit RGB (color type 2), filter 0 on every
    scanline, one zlib-compressed IDAT. ``pixel_bytes`` is
    ``width*height*3`` RGB bytes in scanline order, top row first.
    Test/pipeline fixture — the product surface is the decoder."""
    import struct
    import zlib

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixel_bytes[r * width * 3 : (r + 1) * width * 3]
        for r in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _decode_png_bytes(content: bytes) -> tuple[int, int, list[float]]:
    """REAL pure-stdlib PNG decoder (zlib IS stdlib — the round-7
    'compressed codecs need external libs' gap was only half true):
    8-bit RGB (color type 2) and RGBA (6), non-interlaced, all five
    scanline filters (None/Sub/Up/Average/Paeth) reconstructed per the
    PNG spec. Returns (width, height, per-channel means in file
    channel order, normalized to [0,1]). Palette/gray/16-bit/Adam7
    raise NotImplementedError; truncation and CRC-frame damage raise
    ValueError."""
    import struct
    import zlib

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = b""
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        tag = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _c, _f, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + payload + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlaced PNG not supported")
    if bit_depth != 8 or color_type not in (2, 6):
        raise NotImplementedError(
            f"only 8-bit RGB/RGBA PNG supported (depth={bit_depth}, "
            f"color_type={color_type})"
        )
    nch = 3 if color_type == 2 else 4
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG pixel data length {len(raw)} != expected "
            f"{height * (stride + 1)} for {width}x{height}x{nch}"
        )
    sums = [0] * nch
    prior = bytearray(stride)
    for r in range(height):
        base = r * (stride + 1)
        ft = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ft == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + (left + prior[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prior[i]
                c = prior[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"invalid PNG filter type {ft}")
        for i in range(stride):
            sums[i % nch] += line[i]
        prior = line
    n = width * height
    return width, height, [s / n / 255.0 for s in sums]
