"""Skyline (Pareto-dominance) queries.

A row is in the skyline iff no other row dominates it — dominates =
at-least-as-good on EVERY objective and strictly better on at least
one. The multi-objective "best tradeoffs" operator (e.g. high volume
AND low price) that top-k with a single score can't express.

Distributed shape (after the Spark-SQL skyline integration line of
work, EDBT 2023 "Integration of Skyline Queries into Spark SQL" —
pattern only, no code): dominance survives union, so compute LOCAL
skylines per partition in parallel (this prunes all but a sliver —
skylines are tiny relative to n for correlated data), then a FINAL
skyline over the union of local winners. The result is a set, so it is
partition-count-invariant — pinned by a property test. Both passes run
the same sort-pruned kernel: lexicographic descending sort over the
objectives (any dominator precedes its victims), compare each
candidate only against current skyline members (O(n·s), s = skyline
size).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["skyline"]


def skyline(
    df: DataFrame,
    maximize: Sequence[str] = (),
    minimize: Sequence[str] = (),
) -> DataFrame:
    """Rows not Pareto-dominated under the given objectives.

    Ties: identical objective vectors don't strictly dominate each
    other, so all tied optimal rows are kept (matches the NOT EXISTS
    strict-dominance SQL definition).
    """
    objs = list(maximize) + list(minimize)
    if not objs:
        raise ValueError("skyline: at least one objective required")
    signs = [1.0] * len(maximize) + [-1.0] * len(minimize)

    import numpy as np
    import pandas as pd

    def _local(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pdf
        vals = pdf[objs].to_numpy(dtype=float) * np.array(signs)
        # lexicographic descending sort over ALL objectives: any strict
        # dominator of v is lexicographically greater than v, so it
        # appears strictly before v and is already in `kept` when v is
        # tested. (First-objective-only sorting is WRONG: a tie on the
        # first objective lets a dominator sort after its victim.)
        order = np.lexsort(tuple(-vals[:, j] for j in reversed(range(vals.shape[1]))))
        keep_idx: list[int] = []
        kept: list = []
        for i in order:
            v = vals[i]
            dominated = False
            for w in kept:
                if (w >= v).all() and (w > v).any():
                    dominated = True
                    break
            if not dominated:
                kept.append(v)
                keep_idx.append(i)
        return pdf.iloc[sorted(keep_idx)]

    schema = df.schema
    with_pid = df.withColumn("__pid__", F.spark_partition_id())
    local = (
        with_pid.groupBy("__pid__")
        .applyInPandas(
            lambda pdf: _local(pdf.drop(columns="__pid__")), schema=schema
        )
    )
    # final pass over the (small) union of local skylines
    return local.groupBy().applyInPandas(_local, schema=schema)
