"""Deterministic sampling operators (reference src/stats/mod.rs sample
:310, ml train_test_split re-export src/lib.rs:219-244).

``rand(seed)`` is engine- and partitioning-specific; every sampler here
derives its coin flip from a content hash of the row key (md5 prefix),
so the SAME rows are selected on any engine, any partitioning, any
cluster size — reproducible experiment splits at 100 TB, and the
DuckDB oracle can replay the exact predicate. Selection is a map-side
filter: no shuffle, pushes below joins, and composes with column
pruning.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "deterministic_sample",
    "stratified_sample",
    "train_test_split_hash",
]

_BUCKETS = 65536  # 4 hex chars of md5


def _threshold_hex(frac: float) -> str:
    """Largest 4-hex-char bucket kept for a sampling fraction."""
    k = int(round(frac * _BUCKETS))
    return format(max(k - 1, -1), "04x") if k > 0 else ""


def hash_bucket(*key_cols: str | Column) -> Column:
    """First 4 md5 hex chars of the concatenated key — a uniform
    16-bit bucket string, comparable in any engine."""
    cols = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in key_cols]
    return F.substring(F.md5(F.concat_ws("|", *cols)), 1, 4)


def deterministic_sample(df: DataFrame, key_cols: Sequence[str], frac: float) -> DataFrame:
    """Keep ~``frac`` of rows, chosen by content hash of the key."""
    thr = _threshold_hex(frac)
    if not thr:
        return df.limit(0)
    return df.filter(hash_bucket(*key_cols) <= thr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    key_cols: Sequence[str],
) -> DataFrame:
    """Per-stratum sampling rates (``df.stat.sampleBy`` semantics but
    reproducible across engines): strata not listed get rate 0. The
    class-rebalancing primitive for training-data pipelines — e.g.
    downsample the majority label, keep all of the rare one."""
    bucket = hash_bucket(*key_cols)
    cond = F.lit(False)
    for stratum, frac in rates.items():
        thr = _threshold_hex(frac)
        if thr:
            cond = cond | ((F.col(strata_col) == stratum) & (bucket <= thr))
    return df.filter(cond)


def train_test_split_hash(
    df: DataFrame, key_cols: Sequence[str], test_frac: float = 0.25
) -> tuple[DataFrame, DataFrame]:
    """Split by content hash of a stable key: the same entity always
    lands on the same side — across runs, engines, cluster sizes, and
    (unlike ``randomSplit``) across re-partitioning, which is what
    prevents train/test leakage when the pipeline is re-run on grown
    data. Hash the GROUPING entity (user id, document id), not the row
    id, to keep correlated rows on one side."""
    thr = _threshold_hex(test_frac)
    bucket = hash_bucket(*key_cols)
    test = df.filter(bucket <= thr) if thr else df.limit(0)
    train = df.filter(bucket > thr) if thr else df
    return train, test
