"""Driver contract for the spark-graft builder (PySpark target).

Thin façade over :mod:`pandrs_spark.queries` — the registry maps every
implemented SURVEY.md §2 operator to a (Spark query, DuckDB oracle SQL)
pair. ``entry`` runs the flagship TPC-H-Q1-shaped pricing summary.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import pandrs_spark.queries as Q

Q.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLE)
