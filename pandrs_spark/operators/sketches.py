"""Mergeable-sketch rollups (Apache DataSketches HLL, built into Spark
as ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``).

The hypertable-rollup pattern for distinct counts at 100 TB: build one
small sketch per fine bucket (day/month), then answer every coarser
rollup (quarter/year/all-time) by UNIONING the stored sketches —
never re-scanning raw data. Exact COUNT(DISTINCT) needs a full
re-shuffle of the raw keys per rollup level; sketches make each level
a merge of kilobyte-sized binaries. Error is ~1/sqrt(2^lg_k)
(±1.6% at lg_k=12), certified in-gate by q199 against the exact count.

Reference scope: aggregation tier (SURVEY §2.4 approx distinct;
reference exposes approx distinct ops in its stats surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_rollup", "cms_build", "cms_estimate", "bitmap_distinct_rollup"]


def bitmap_distinct_rollup(
    df: DataFrame,
    fine_keys,
    coarse_keys,
    value_col: str,
) -> DataFrame:
    """EXACT mergeable distinct-count rollup over an integer key —
    the roaring-bitmap-style complement to :func:`hll_rollup`. Each
    (fine_keys, bucket) group aggregates a fixed 4KB bitmap of the
    key's bit positions (``bitmap_construct_agg``); coarser levels OR
    the stored bitmaps (``bitmap_or_agg``) and count bits — exact, no
    re-scan of the raw data, and the merge is associative so any rollup
    lattice (day→month→quarter→year) folds from the level below.

    vs exact COUNT(DISTINCT): that reshuffles all raw keys per rollup
    level; this shuffles raw rows ONCE to build fine bitmaps, then each
    level moves only (n_fine_groups x n_touched_buckets) 4KB blobs.
    vs HLL (hll_rollup): bitmaps are exact but sized by key-space
    density; HLL is fixed-size but approximate. Use bitmaps for dense
    integer ids (user ids), HLL for strings/sparse ids.

    Returns one row per coarse key: (coarse_keys..., exact_distinct).
    """
    v = F.col(value_col)
    fine = df.groupBy(
        *fine_keys, F.bitmap_bucket_number(v).alias("__bucket__")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(v)).alias("__bm__"))
    merged = fine.groupBy(*coarse_keys, "__bucket__").agg(
        F.bitmap_or_agg(F.col("__bm__")).alias("__bm__")
    )
    return merged.groupBy(*coarse_keys).agg(
        F.sum(F.bitmap_count(F.col("__bm__"))).alias("exact_distinct")
    )


def hll_rollup(
    df: DataFrame,
    fine_keys,
    coarse_keys,
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Two-level distinct-count rollup from one pass over the data:
    per-``fine_keys`` HLL sketches, merged up to ``coarse_keys`` with
    ``hll_union_agg`` (no second scan of ``df``). Returns one row per
    coarse key: (coarse_keys..., approx_distinct, n_fine_buckets).
    """
    fine = df.groupBy(*fine_keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("__sk__")
    )
    return fine.groupBy(*coarse_keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("__sk__"))).alias(
            "approx_distinct"
        ),
        F.count(F.lit(1)).alias("n_fine_buckets"),
    )


def _cms_bucket(width: int, fast_hash: bool):
    """Bucket expression for one (depth-index, key) pair. md5-derived by
    default so any engine (the DuckDB oracle included) rebuilds the
    identical grid; ``fast_hash=True`` swaps in xxhash64 — one 64-bit
    JVM hash instead of a full md5 + hex-decode per (row, depth), ~an
    order of magnitude cheaper in the hot explode — for production
    sketches that never need cross-engine replay. pmod keeps the bucket
    non-negative (xxhash64 is signed)."""
    if fast_hash:
        return F.pmod(
            F.xxhash64(F.lit("cms"), F.col("__i__"), F.col("__k__")),
            F.lit(width),
        ).alias("__b__")
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit("cms"), F.col("__i__").cast("string"), F.col("__k__")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width
    ).alias("__b__")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    fast_hash: bool = False,
) -> DataFrame:
    """Count-min sketch over ``key_col``: a ``depth x width`` counter
    grid, each row hashing into one bucket per depth row
    (deterministic md5-derived hashes, so any engine rebuilds the
    identical sketch). The sketch is ~depth*width longs REGARDLESS of
    key cardinality — the fixed-memory frequency summary for
    billion-key streams. One explode(depth) + one groupBy: map-side
    partial counts do the heavy lifting.

    The hash is md5 so any engine (the DuckDB oracle included) can
    rebuild the identical grid; in production swap the hash expression
    for ``F.xxhash64(seed, key)`` — ~10x cheaper per row with the same
    plan shape — when cross-engine replay is not required.
    """
    rows = df.select(F.col(key_col).cast("string").alias("__k__"))
    idx = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("__i__")
    hashed = rows.select("__k__", idx).select(
        "__i__", _cms_bucket(width, fast_hash)
    )
    grid = hashed.groupBy("__i__", "__b__").agg(
        F.count(F.lit(1)).alias("__c__")
    )
    # Record the hash mode (and grid geometry) in the count column's
    # schema metadata so cms_estimate can refuse a mismatched probe: a
    # probe hashed with the OTHER function lands in unrelated buckets
    # and the left join silently returns zero/garbage estimates.
    # Metadata rides the schema — no extra rows, no extra job, and the
    # DuckDB oracle (which compares values/dtypes) never sees it.
    return grid.withColumn(
        "__c__",
        F.col("__c__").alias(
            "__c__",
            metadata={
                "cms_fast_hash": bool(fast_hash),
                "cms_depth": depth,
                "cms_width": width,
            },
        ),
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    fast_hash: bool = False,
) -> DataFrame:
    """Point-estimate frequencies for ``keys`` from a count-min
    sketch: min over the depth counters each key hashes to. The
    classic one-sided guarantee holds exactly: estimate >= true count,
    and exceeds it by at most eps*N with probability 1-delta
    (eps=e/width, delta=e^-depth). Broadcast the sketch (depth*width
    rows) into the key probe — no shuffle of the key set.

    ``fast_hash``/``depth``/``width`` MUST match the values the sketch
    was built with; the probe re-derives buckets from them. Sketches
    built by :func:`cms_build` carry all three in the ``__c__`` column's
    schema metadata, and a mismatch raises here instead of silently
    returning zero/garbage estimates (a mismatched probe hashes into
    unrelated buckets, so the left join simply misses)."""
    if "__c__" in sketch.columns:
        md = sketch.schema["__c__"].metadata or {}
        for name, got in (
            ("cms_fast_hash", bool(fast_hash)),
            ("cms_depth", depth),
            ("cms_width", width),
        ):
            if name in md and md[name] != got:
                raise ValueError(
                    f"cms_estimate: probe {name.removeprefix('cms_')}="
                    f"{got!r} does not match the sketch's recorded "
                    f"{md[name]!r}; estimates would be garbage. Pass "
                    "the same parameters cms_build used."
                )
    probes = keys.select(F.col(key_col).cast("string").alias("__k__")).distinct()
    idx = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("__i__")
    probe = probes.select("__k__", idx).select(
        "__k__", "__i__", _cms_bucket(width, fast_hash)
    )
    return (
        probe.join(F.broadcast(sketch), ["__i__", "__b__"], "left")
        .groupBy("__k__")
        .agg(F.min(F.coalesce(F.col("__c__"), F.lit(0))).alias("est_count"))
        .select(F.col("__k__").alias(key_col), "est_count")
    )


def bloom_build(
    df: DataFrame, key_col: str, num_bits: int = 1 << 16, k: int = 3
) -> list[int]:
    """Build a Bloom filter over ``key_col`` and return it as a dense
    ``num_bits/64``-word Python bitmap — Spark's own runtime-filter
    shape (bloom_filter_agg is Catalyst-internal, not SQL-exposed, so
    this is the user-level equivalent).

    Build cost: one partial-combined aggregation — each key explodes to
    k (slot, mask) pairs, bit_or-reduced per slot, at most
    ``num_bits/64`` rows ever shuffle. The collect is bounded by the
    filter size (8 KB at the default 2^16 bits), NOT by data size —
    the same scalar-class carry as a broadcast threshold. Size
    ``num_bits`` ≈ 10–15 bits/key for ~1% FP at the classic k=3–5.
    The reference ships no sketch module — this is scale surface
    built beyond it (Bloom 1970, public methodology).
    """
    assert num_bits % 64 == 0
    m = F.lit(num_bits).cast("long")
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), m)
                    for i in range(k)
                ]
            )
        ).alias("pos")
    ).select(
        F.expr("CAST(pos DIV 64 AS BIGINT)").alias("slot"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
        ).alias("mask"),
    )
    rows = (
        pairs.groupBy("slot")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    words = [0] * (num_bits // 64)
    for r in rows:
        words[int(r["slot"])] = int(r["bits"])
    return words


def bloom_might_contain(
    words: list[int], key_col: str, num_bits: int, k: int = 3
):
    """Membership predicate Column against a :func:`bloom_build`
    bitmap. Pure map-side codegen — the bitmap rides into the plan as
    a literal array (element_at + bitwise AND per hash), so
    prefiltering a 100 TB probe side costs zero shuffle and no join.
    No false negatives by construction; false positives are removed by
    the real join that follows (the runtime-filter contract)."""
    arr_sql = "ARRAY(" + ",".join(f"CAST({w} AS BIGINT)" for w in words) + ")"
    conds = []
    for i in range(k):
        pos = f"pmod(xxhash64({key_col}, {i}), CAST({num_bits} AS BIGINT))"
        mask = f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))"
        word = f"element_at({arr_sql}, CAST({pos} DIV 64 AS INT) + 1)"
        conds.append(f"(({word} & {mask}) = {mask})")
    return F.expr(" AND ".join(conds))
