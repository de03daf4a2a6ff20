"""Data-layout operators: Z-order (Morton) interleaving for
multi-dimensional data clustering.

Sorting 100 TB of parquet by ONE key gives perfect min/max pruning on
that key and none on any other; interleaving the bits of several keys
(Morton / Z-order curve — the layout trick behind Delta OPTIMIZE
ZORDER BY and Hudi clustering) gives every interleaved dimension
partial locality, so row-group min/max stats prune scans filtered on
ANY of them. The z-value is a pure bit-arithmetic column expression
(codegen'd, map-side); clustering = repartitionByRange + sortWithin
on it, which is Spark's native range-exchange — no custom
partitioner.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue", "zorder_layout", "advise_partitions"]


def zvalue(cols, bits: int = 10) -> Column:
    """Morton z-value of ``cols`` (each masked to ``bits`` low bits;
    callers hash or quantize wider domains first). Bit i of column j
    lands at output bit i * n_cols + j — the standard interleave."""
    n = len(cols)
    mask = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long").bitwiseAND(
            F.lit(mask)
        )
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(col, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return z


def zorder_layout(df: DataFrame, cols, bits: int = 10, num_partitions: int | None = None) -> DataFrame:
    """Cluster rows along the Z-order curve of ``cols``: range-exchange
    on the z-value, then sort within each partition so parquet
    row-group stats are tight on every dimension. Write the result
    with ``.write.parquet`` to materialize the layout."""
    z = zvalue(cols, bits).alias("__z__")
    out = df.withColumn("__z__", z)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "__z__")
    else:
        out = out.repartitionByRange("__z__")
    return out.sortWithinPartitions("__z__").drop("__z__")


def advise_partitions(
    df: DataFrame, target_mb: int = 128, sample_rows: int = 10_000
) -> dict:
    """Partition-count advisor: estimate bytes/row from the logical
    plan's size statistics (Catalyst's own estimate — no data read) or,
    when stats are absent, from a bounded row sample, then recommend
    ``ceil(total_bytes / target_mb)`` partitions. The sizing arithmetic
    a 100 TB job does before `repartition()` so shuffle partitions land
    near the (default 128 MB) sweet spot instead of thousands of
    KB-sized tasks or a handful of multi-GB spills.

    Returns {est_total_bytes, est_rows, bytes_per_row,
    recommended_partitions}. Driver-side metadata only — the single
    sample action is bounded by ``sample_rows``.
    """
    import math

    stats = df._jdf.queryExecution().optimizedPlan().stats()
    est_bytes = int(str(stats.sizeInBytes()))
    row_count = stats.rowCount()
    est_rows = (
        int(str(row_count.get())) if row_count.isDefined() else None
    )
    if est_rows is None:
        # bounded sample action; good enough for a bytes/row estimate
        est_rows = df.limit(sample_rows).count() or None
    bytes_per_row = est_bytes / est_rows if est_rows else None
    recommended = max(1, math.ceil(est_bytes / (target_mb * 1024 * 1024)))
    return {
        "est_total_bytes": est_bytes,
        "est_rows": est_rows,
        "bytes_per_row": bytes_per_row,
        "recommended_partitions": recommended,
    }
