"""Named SQL function registration.

Mirrors the reference's ``QueryContext::add_function`` (/root/reference
src/dataframe/query/evaluator.rs:146), which lets users call custom
scalar functions by name inside query strings. The Spark-native answer
is ``spark.udf.register``: a registered name becomes callable in
``spark.sql(...)`` strings, ``F.expr`` fragments and the Frame ``query``
DSL alike.

Scale note: registered functions default to Arrow-batched pandas UDFs
(vectorized, ~10-100x faster than row-at-a-time Python UDFs); pass
``vectorized=False`` only for functions that genuinely can't take a
``pd.Series``. Either way a Python UDF is the slow path next to
built-in expressions — prefer ``F.expr`` when the formula is
expressible — but the named-registration surface exists for parity and
for genuinely custom scalar logic.
"""

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

__all__ = ["register_function", "register_builtin_functions"]


def register_function(
    spark: SparkSession,
    name: str,
    fn: Callable,
    return_type: str = "double",
    vectorized: bool = True,
):  # noqa: ANN201 — returns the registered UDF object
    """Register ``fn`` under ``name`` for use inside SQL strings.

    ``vectorized=True`` wraps ``fn`` as a pandas UDF — ``fn`` receives
    ``pd.Series`` arguments and must return a ``pd.Series`` (Arrow
    batch transfer, stays off the per-row Python path). Returns the
    registered function object (also usable as a Column expression).

    Annotations on ``fn`` are normalized before registration: under
    ``from __future__ import annotations`` (PEP 563) hints arrive as
    strings that pandas_udf cannot resolve unless the caller's module
    happens to import pandas at top level — so the Series hints are
    re-stamped as real classes from ``fn``'s signature.
    """
    if vectorized:
        import inspect

        def _series_fn(*cols):
            return fn(*cols)

        params = list(inspect.signature(fn).parameters)
        # no functools.wraps: it would set __wrapped__ and make
        # inspect.signature resurface fn's (possibly string) hints
        _series_fn.__name__ = getattr(fn, "__name__", name)
        _series_fn.__signature__ = inspect.Signature(
            [
                inspect.Parameter(
                    p,
                    inspect.Parameter.POSITIONAL_OR_KEYWORD,
                    annotation=pd.Series,
                )
                for p in params
            ],
            return_annotation=pd.Series,
        )
        _series_fn.__annotations__ = {p: pd.Series for p in params}
        _series_fn.__annotations__["return"] = pd.Series
        udf = F.pandas_udf(_series_fn, return_type)
    else:
        udf = F.udf(fn, return_type)
    return spark.udf.register(name, udf)


def register_builtin_functions(spark: SparkSession) -> list[str]:
    """Register the library's standard helpers as named SQL functions.

    ``quantize100(x)``: the deterministic-aggregation unit used across
    the engine (sign(x)·floor(|x|·100 + 0.5), see
    functions/deterministic.py) — exposed by name so SQL-string users
    can build order-independent float aggregates the same way the
    DataFrame tier does.
    """
    def _quantize100(x: pd.Series) -> pd.Series:
        return np.sign(x) * np.floor(np.abs(x) * 100.0 + 0.5)

    register_function(spark, "quantize100", _quantize100, "double")
    return ["quantize100"]
