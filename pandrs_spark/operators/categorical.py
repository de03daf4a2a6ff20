"""Categorical dtype emulation (SURVEY.md §1.2).

The reference has a first-class dictionary-encoded categorical type —
``Categorical<T>`` with ``codes: Vec<i32>`` + ordered ``categories``
(/root/reference src/series/categorical.rs:29) and set operations over
categories (:333,:349,:372). Spark has no categorical dtype: Parquet +
Tungsten dictionary-encode strings physically, so the *storage* win is
free. What's worth reifying is the *logical* code↔label mapping:

- ``encode`` produces a broadcast-able dimension table (code, label)
  with codes assigned by sorted label order (deterministic on any
  engine) and the fact table with the label column replaced by its code.
- ``decode`` joins the dimension back.

At 100 TB the dim table is tiny (cardinality of the column) and the
fact-side transform is one broadcast join — the same shape a star
schema gives you.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "encode",
    "decode",
    "category_union",
    "category_intersection",
    "category_difference",
]


def encode(df: DataFrame, col: str, code_col: str | None = None):
    """Returns (encoded_df, dim_df); codes are 0-based in sorted label
    order (categorical.rs:29 — ordered categories)."""
    code_col = code_col or f"{col}_code"
    dim = (
        df.select(F.col(col).alias("label"))
        .where(F.col("label").isNotNull())
        .distinct()
        .withColumn("code", F.row_number().over(Window.orderBy("label")) - 1)
        .select("code", "label")
    )
    encoded = (
        df.join(
            F.broadcast(dim.withColumnRenamed("label", col)), col, "left"
        )
        .withColumnRenamed("code", code_col)
        .drop(col)
    )
    return encoded, dim


def decode(encoded: DataFrame, dim: DataFrame, code_col: str, out_col: str) -> DataFrame:
    """Join labels back (code → label)."""
    d = dim.select(
        F.col("code").alias(code_col), F.col("label").alias(out_col)
    )
    return encoded.join(F.broadcast(d), code_col, "left")


def category_union(dim_a: DataFrame, dim_b: DataFrame) -> DataFrame:
    """Set ops over category sets (categorical.rs:333) — recoded."""
    labels = dim_a.select("label").union(dim_b.select("label")).distinct()
    return labels.withColumn(
        "code", F.row_number().over(Window.orderBy("label")) - 1
    ).select("code", "label")


def category_intersection(dim_a: DataFrame, dim_b: DataFrame) -> DataFrame:
    labels = dim_a.select("label").intersect(dim_b.select("label"))
    return labels.withColumn(
        "code", F.row_number().over(Window.orderBy("label")) - 1
    ).select("code", "label")


def category_difference(dim_a: DataFrame, dim_b: DataFrame) -> DataFrame:
    """A \\ B over category label sets (categorical.rs:372) — recoded
    densely like the other set ops."""
    labels = dim_a.select("label").exceptAll(dim_b.select("label")).distinct()
    return labels.withColumn(
        "code", F.row_number().over(Window.orderBy("label")) - 1
    ).select("code", "label")
