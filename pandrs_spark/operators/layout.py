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

__all__ = ["zvalue", "zorder_layout"]


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
