"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "UnboundedBuildError",
    "assert_bounded",
    "fan_out",
    "tracked_persist",
]


def tracked_persist(df: DataFrame, level=None) -> DataFrame:
    """Persist ``df`` and register it for ``release_persisted()``.

    For intermediates that the RETURNED DataFrame's lineage still
    references: unpersisting before return would force a recompute on
    the caller's first action, while a bare ``.persist()`` leaks cache
    entries across queries. Registering in the global ``_PERSISTED``
    list defers the unpersist to after materialization — check_oracle,
    bench.py, and the leak fence all call ``release_persisted()`` per
    query, so the cache-manager count returns to zero between queries.
    """
    from pandrs_spark.frame import _PERSISTED

    df = df.persist(level) if level is not None else df.persist()
    _PERSISTED.append(df)
    return df


def fan_out(df: DataFrame, bytes_per_task: int = 128 * 1024) -> DataFrame:
    """Widen under-partitioned inputs before compute-heavy map work.

    Scan partition counts are sized from FILE BYTES
    (``spark.sql.files.maxPartitionBytes``), which underestimates the
    parallelism needed when per-row work amplifies past the scan:
    explode/shingle text operators (10-100× row blow-up), per-row
    minhash/simhash signatures, embedding dot products over array
    columns. Measured at the synthesized sf1: documents scans into 2
    partitions and embeddings into ONE, leaving 30+ of 32 cores idle
    through a 30 s shingle explode (2.5 s after widening).

    The target is scaled to the input's optimizer-estimated size —
    one task per ``bytes_per_task`` of input, clamped to the cluster's
    default parallelism — so tiny inputs are NOT shattered into 32
    near-empty partitions (A/B-measured: unconditional widening cost
    +50% on a 200 KB embedding join whose branches re-read the
    exchange, while skipping sub-task-sized inputs keeps the 12×
    sf1 win). No-op when the input is already at least that wide — at
    100 TB scans are thousands of partitions and this never fires.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        if size >= (1 << 62):
            # Long.MaxValue sentinel: the optimizer does NOT know the
            # size (e.g. behind a coalesce/RDD-backed plan). No
            # evidence of under-partitioning beats an unconditional
            # shuffle — production scan plans (parquet/csv/json)
            # always carry real stats, which is where the measured
            # starvation lived; a user's explicit coalesce(1) is
            # deliberate and must not be silently undone.
            return df
        target = max(1, min(target, size // bytes_per_task))
    except Exception:  # noqa: BLE001 — stats unavailable: widen fully
        pass
    if df.rdd.getNumPartitions() < target:
        return df.repartition(int(target))
    return df


class UnboundedBuildError(RuntimeError):
    """Raised by :func:`assert_bounded` when a frame claimed to be
    bounded-by-assumption (e.g. a classifier's label set about to be
    broadcast) turns out to be data-sized."""


def assert_bounded(df: DataFrame, max_rows: int, what: str) -> DataFrame:
    """Runtime fence for broadcast/crossJoin build sides whose
    boundedness is a DOMAIN assumption rather than a structural one
    (scalar aggregates and Limits are plan-provably bounded; a
    grouped aggregate on a label column is only bounded because label
    spaces are small). Persists ``df``, counts it once (the frame is
    about to be reused anyway), and raises :class:`UnboundedBuildError`
    if the assumption is violated — failing LOUDLY at the fence instead
    of dying opaquely at the broadcast build on a 100 TB corpus.

    The registry-wide plan census (tools/plan_report.py) whitelists
    nested-loop builds that pass through this fence by query name, with
    this function as the enforcement backing the whitelist entry.
    """
    df = tracked_persist(df)
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise UnboundedBuildError(
            f"{what}: build side exceeds the bounded-broadcast fence "
            f"(> {max_rows} rows) — this frame scales with the data and "
            "must not be broadcast/nested-loop joined"
        )
    return df
