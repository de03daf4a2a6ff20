"""ML evaluation metrics (SURVEY.md §2.13; reference metrics
re-exports src/lib.rs:219-244 — accuracy/f1/mse/r2 etc.).

Pure aggregation-tier: every metric reduces to one grouped/global
aggregation over (label, prediction) pairs — a single partial-agg
shuffle at any scale, no driver-side data movement. Double sums are
dsum-quantized so the numbers are bit-identical across partitionings
and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandrs_spark.functions.deterministic import dsum

__all__ = [
    "confusion_matrix",
    "classification_metrics",
    "regression_metrics",
]


def confusion_matrix(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """Counts per (label, prediction) cell."""
    return (
        df.groupBy(F.col(label_col).alias("label"), F.col(pred_col).alias("pred"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "pred")
    )


def classification_metrics(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """Per-class precision / recall / F1 plus support, from one pass.

    tp/fp/fn come from conditional counts grouped by class; the
    classes present in either column each get a row.
    """
    lab = F.col(label_col)
    pred = F.col(pred_col)
    classes = df.select(lab.alias("cls")).union(df.select(pred.alias("cls"))).distinct()
    per = (
        df.crossJoin(F.broadcast(classes))
        .groupBy("cls")
        .agg(
            F.count(F.when((lab == F.col("cls")) & (pred == F.col("cls")), 1)).alias("tp"),
            F.count(F.when((lab != F.col("cls")) & (pred == F.col("cls")), 1)).alias("fp"),
            F.count(F.when((lab == F.col("cls")) & (pred != F.col("cls")), 1)).alias("fn"),
        )
    )
    precision = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    recall = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
    return per.select(
        "cls",
        (F.col("tp") + F.col("fn")).alias("support"),
        precision.alias("precision"),
        recall.alias("recall"),
        F.when(
            precision + recall > 0, 2 * precision * recall / (precision + recall)
        )
        .otherwise(0.0)
        .alias("f1"),
    ).orderBy("cls")


def regression_metrics(
    df: DataFrame, y_col: str, yhat_col: str, scale: int = 4
) -> DataFrame:
    """mse / rmse / mae / r2 as one aggregation of quantized sums.

    Residual powers are quantized at ``scale`` digits before summing
    (mind the int64 envelope: rescale y first if |y| is large).
    """
    y = F.col(y_col)
    e = y - F.col(yhat_col)
    agg = df.agg(
        F.count(y).alias("n"),
        dsum(e * e, scale).alias("sse"),
        dsum(F.abs(e), scale).alias("sae"),
        dsum(y, scale).alias("sy"),
        dsum(y * y, scale).alias("syy"),
    )
    sst = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    return agg.select(
        "n",
        (F.col("sse") / F.col("n")).alias("mse"),
        F.sqrt(F.col("sse") / F.col("n")).alias("rmse"),
        (F.col("sae") / F.col("n")).alias("mae"),
        (F.lit(1.0) - F.col("sse") / sst).alias("r2"),
    )
