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

__all__ = ["hll_rollup"]


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
