"""Query registry: every SURVEY.md §2 operator demonstrated as a
(spark_query, duckdb_oracle_sql) pair over the driver's testdata.

Submodules register into :data:`QUERIES` / :data:`ORACLE` via the
``@query`` decorator; ``__spark_entry__.py`` re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import all query modules (idempotent)."""
    from pandrs_spark.queries import core  # noqa: F401
    from pandrs_spark.queries import windows  # noqa: F401
    from pandrs_spark.queries import text  # noqa: F401
    from pandrs_spark.queries import events  # noqa: F401
    from pandrs_spark.queries import timeseries  # noqa: F401
    from pandrs_spark.queries import stats  # noqa: F401
    from pandrs_spark.queries import graph  # noqa: F401
    from pandrs_spark.queries import hypothesis  # noqa: F401
    from pandrs_spark.queries import ml  # noqa: F401
    from pandrs_spark.queries import ml_embedding  # noqa: F401
    from pandrs_spark.queries import warehouse  # noqa: F401
    from pandrs_spark.queries import warehouse_econometrics  # noqa: F401
    from pandrs_spark.queries import timeseries_risk  # noqa: F401
    from pandrs_spark.queries import text_lexical  # noqa: F401
    from pandrs_spark.queries import text_retrieval  # noqa: F401
