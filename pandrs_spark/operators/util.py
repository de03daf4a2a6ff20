"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "UnboundedBuildError",
    "assert_bounded",
    "fan_out",
    "fan_out_groups",
    "right_size_keyed",
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


# Logical operators that cannot change a plan's partition count on
# their own: a plan built ONLY of these above its leaves keeps the
# leaf scan/cache partitioning, so df.rdd.getNumPartitions() resolves
# WITHOUT materializing any AQE query stage. Anything else (Join,
# Aggregate, Window, Sort, ...) makes the width shuffle-governed — and,
# decisive for cost, asking .rdd for it under AQE EXECUTES the whole
# subtree as stage-materialization jobs (round 12, measured: q714's
# candidate-pair semi-join input ran a 92 s-CPU bands pass inside
# fan_out's .rdd probe, before the query's real action).
_NARROW_NODES = frozenset(
    {
        "Project",
        "Filter",
        "Generate",
        "SubqueryAlias",
        "Sample",
        "Union",
        "LogicalRelation",
        "Relation",
        "InMemoryRelation",
        "LogicalRDD",
        "LocalRelation",
        "DataSourceV2Relation",
        "DataSourceV2ScanRelation",
        "HiveTableRelation",
    }
)


def _width_is_leaf_governed(df: DataFrame) -> bool:
    """True when the optimized logical plan contains only narrow
    operators over its leaves (InMemoryRelation counts as a leaf), so
    the partition count is the leaf's and ``df.rdd`` is free. Unknown
    node names conservatively return False."""
    try:
        def walk(p) -> bool:
            if p.nodeName() not in _NARROW_NODES:
                return False
            if p.nodeName() == "InMemoryRelation":
                return True  # cached leaf: its own plan is materialized
            it = p.children().iterator()
            while it.hasNext():
                if not walk(it.next()):
                    return False
            return True

        return walk(df._jdf.queryExecution().optimizedPlan())
    except Exception:  # noqa: BLE001 — plan introspection unavailable
        return False


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
    if target <= 1:
        return df
    # Round 12: only consult the actual partition count when the plan's
    # width is leaf-governed (narrow chain over scans/caches), where
    # .rdd is free. For shuffle-shaped inputs (joins/aggregates/...),
    # .rdd under AQE EXECUTES the subtree (q714: a 92 s-CPU pass ran
    # inside this probe); their width is set by shuffle.partitions/AQE
    # coalescing at runtime, which is the cluster-scaled sizing this
    # helper must not fight — leave them unchanged. Operators that need
    # a widened map pass after a broadcast join hoist fan_out to the
    # probe side BEFORE the join (ngram_jaccard_pairs).
    if not _width_is_leaf_governed(df):
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(int(target))
    return df


def right_size_keyed(
    df: DataFrame, *key_cols: str, bytes_per_task: int = 1 << 22
) -> DataFrame:
    """Hash-repartition a provably SMALL frame to a size-derived
    partition count before it is persisted as an iterative loop's
    invariant table.

    Iterative operators scan their persisted edge/vertex tables once
    per round. The cache freezes whatever partitioning the build had —
    ``repartition(key)`` inherits ``spark.sql.shuffle.partitions`` (200
    on a default session) and AQE does NOT re-coalesce cached plans
    (``canChangeCachedPlanOutputPartitioning`` is false) — so a 25-row
    nation graph pays 200 near-empty tasks per cache scan, every round
    (measured round 11: a 20-round PageRank over 25 vertices spent
    2/3 of its wall in those scans on a default session).

    Call AFTER the source of ``df`` is materialized so optimizer stats
    are exact (``InMemoryRelation`` carries real bytes). The explicit
    count is only applied when the whole frame is provably smaller
    than one task per core — anything bigger, or with unknown stats,
    returns ``df`` unchanged and keeps the shuffle-partition/AQE
    sizing, so production-scale tables are never squeezed.
    """
    sc = df.sparkSession.sparkContext
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # noqa: BLE001 — stats unavailable: keep as-is
        return df
    if size >= (1 << 62):
        return df
    # Floor at 2 partitions: hashpartitioning(k, 1) canonicalizes to
    # Exchange SinglePartition in the physical plan, which the
    # registry-wide census (tools/plan_report.py) rightly treats as a
    # bottleneck signature when it feeds a join — a provably-small
    # right-sized table must stay distinguishable from a data-sized
    # single-partition mistake. Two near-empty tasks cost the same as
    # one at this size, and the plan stays honestly multi-partition.
    target = max(2, size // bytes_per_task + 1)
    # ADVICE r11 (low): on sessions with defaultParallelism <= 2 the
    # plain `target >= defaultParallelism` guard disabled right-sizing
    # entirely — a provably-TINY loop table (target at the 2-partition
    # floor) kept the 200-partition shuffle default, the exact
    # per-round-scan pathology this function exists to fix. Floor-sized
    # frames therefore always collapse to 2; anything larger keeps the
    # one-task-per-core proof requirement (and AQE sizing) as before.
    if target >= max(sc.defaultParallelism, 3):
        return df
    return df.repartition(int(target), *[F.col(c) for c in key_cols])


def fan_out_groups(df: DataFrame, *key_cols: str) -> DataFrame:
    """Explicitly hash-partition ``df`` by the group key ahead of a
    CPU-dense ``groupBy(...).applyInPandas`` (round 11).

    AQE sizes post-shuffle partitions by BYTES; a grouped Python
    recursion (BOCPD, ARIMA folds) carries kilobytes but burns seconds
    per group, so the advisory-size coalescing collapses thousands of
    groups onto one task (measured: q155's 7 s single-task stage while
    31 cores idled). An explicit repartition with an explicit partition
    count is exempt from AQE coalescing, and because it already
    produces the HashPartitioning the grouped-map operator needs, NO
    extra exchange is added — the plan has the same single shuffle,
    just with a CPU-sized partition count. ``defaultParallelism``
    scales with the cluster, so the knob is scale-adaptive, not a
    local constant.
    """
    if not key_cols:
        # a keyless grouped-map is one global group — nothing to spread
        return df
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism, *[F.col(c) for c in key_cols])


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
