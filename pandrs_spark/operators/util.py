"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["fan_out"]


def fan_out(df: DataFrame) -> DataFrame:
    """Widen under-partitioned inputs before compute-heavy map work.

    Scan partition counts are sized from FILE BYTES
    (``spark.sql.files.maxPartitionBytes``), which underestimates the
    parallelism needed when per-row work amplifies past the scan:
    explode/shingle text operators (10-100× row blow-up), per-row
    minhash/simhash signatures, embedding dot products over
    array columns. Measured at the synthesized sf1: documents scans
    into 2 partitions and embeddings into ONE, leaving 30+ of 32 cores
    idle through a 30 s shingle explode (2.5 s after widening).

    When the input has fewer partitions than the cluster has slots,
    one cheap narrow-input round-robin shuffle buys full-width codegen
    for everything downstream. No-op when the input is already wide —
    at 100 TB scans are thousands of partitions and this never fires.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
