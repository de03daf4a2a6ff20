"""Plan inspection utilities (SURVEY.md §3.3 ``explain_plan`` /
§4 optimizer visibility).

The reference surfaces its optimized plan as text
(/root/reference src/distributed/engines/datafusion/mod.rs:283,
src/distributed/explain/format.rs); here we expose Catalyst's formatted
plan plus structured assertions used by the perf tests: is the filter
pushed to the parquet scan, is the small side broadcast, how many
shuffles does the plan contain. These are the levers that decide whether
a query survives a 100× scale-up, so tests pin them.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "plan_text",
    "pushed_filters",
    "read_schema_columns",
    "num_shuffles",
    "has_broadcast_join",
    "wholestage_codegen_spans",
]


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """Formatted physical plan (``explain_plan`` parity)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (row-group skipping)."""
    text = plan_text(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*\[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning check)."""
    text = plan_text(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema:\s*struct<([^>]*)>", text):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def num_shuffles(df: DataFrame) -> int:
    """Count of Exchange operators — each is a full shuffle of its input."""
    return len(re.findall(r"\bExchange\b", plan_text(df, "simple")))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_text(df, "simple") or "BroadcastNestedLoopJoin" in plan_text(df, "simple")


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen regions (wider = more fused JVM code).

    Caveat: under AQE the plan is wrapped in AdaptiveSparkPlan and
    reports 0 subtrees until finalized — build the DataFrame with
    ``spark.sql.adaptive.enabled=false`` (plan-time conf) to inspect
    codegen statically, as the plan tests do.
    """
    text = plan_text(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0
