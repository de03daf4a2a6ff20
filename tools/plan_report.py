"""Registry-wide physical-plan census → one JSON artifact.

For every ``queries()`` entry, builds the plan at the given sf dir and
counts the physical operators that matter at 100 TB: shuffles
(Exchange), broadcast joins, sort-merge joins, nested-loop joins,
cartesian products, row-at-a-time Python (BatchEvalPython), Arrow
Python stages, and whole-stage-codegen spans. The committed artifact
(PLANS_r{N}.json) lets a reviewer grep "which queries shuffle most /
which ever nested-loop" without re-running anything.

Usage: python tools/plan_report.py [sf_dir] [--json OUT] [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATTERNS = {
    "exchanges": r"\bExchange (?:hash|range)partitioning",
    "single_partition_exchanges": r"\bExchange SinglePartition",
    "broadcast_hash_joins": r"\bBroadcastHashJoin\b",
    "sort_merge_joins": r"\bSortMergeJoin\b",
    "broadcast_nested_loop_joins": r"\bBroadcastNestedLoopJoin\b",
    "cartesian_products": r"\bCartesianProduct\b",
    "batch_eval_python": r"\bBatchEvalPython\b",
    "arrow_python_stages": r"\b(?:ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|AggregateInPandas)\b",
    "codegen_spans": r"\*\(\d+\)",
    "parquet_scans": r"\bFileScan parquet\b",
}


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from pandrs_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    from pandrs_spark.frame import release_persisted

    out: dict = {"sf_dir": sf_dir, "queries": {}}
    totals = {k: 0 for k in PATTERNS}
    n_err = 0
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            text = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            out["queries"][name] = {"error": str(e).splitlines()[0][:160]}
            n_err += 1
            continue
        finally:
            release_persisted()
            spark.catalog.clearCache()
        row = {k: len(re.findall(p, text)) for k, p in PATTERNS.items()}
        for k, v in row.items():
            totals[k] += v
        out["queries"][name] = row
    out["totals"] = totals
    out["n_queries"] = len(out["queries"])
    out["n_errors"] = n_err
    line = json.dumps(
        {"n_queries": out["n_queries"], "n_errors": n_err, **totals}
    )
    print(line)
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
