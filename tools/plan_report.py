"""Registry-wide physical-plan census → one JSON artifact.

For every ``queries()`` entry, builds the plan at the given sf dir and
counts the physical operators that matter at 100 TB: shuffles
(Exchange), broadcast joins, sort-merge joins, nested-loop joins,
cartesian products, row-at-a-time Python (BatchEvalPython), Arrow
Python stages, and whole-stage-codegen spans. The committed artifact
(PLANS_r{N}.json) lets a reviewer grep "which queries shuffle most /
which ever nested-loop" without re-running anything.

Round 8 adds a CLASSIFIER over the two counters that used to need
eyeball audits:

- every ``BroadcastNestedLoopJoin`` build side is walked and classified
  **benign** (the broadcast subtree is bounded by construction: it
  contains a scalar ``keys=[]`` aggregate, a Limit/TakeOrdered, only
  region/nation dim scans, or no file scan at all) vs **suspicious**
  (a data-sized FileScan reaches the broadcast build with nothing
  bounding it — the q446-class mistake);
- every ``Exchange SinglePartition`` is classified by its consumer
  chain: **benign** when it feeds a scalar aggregate or a bounded
  Limit/TakeOrdered, **window** when it feeds a partitionless Window
  (those are separately whitelisted in tests/test_plans.py), and
  **suspicious** otherwise.

The artifact carries per-query splits plus a top-level
``suspicious_queries`` list; the fence is suspicious == 0 registry-wide
(tests/test_plans.py exercises the classifier itself on constructed
benign/suspicious plans).

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

# Tables whose full scan is bounded by construction at any scale factor
# (fixed-cardinality dims: 5 regions, 25 nations).
_BOUNDED_TABLES = ("region.parquet", "nation.parquet")

# SortAggregate prints `key=[]` (singular); Hash/ObjectHash print `keys=[]`
_SCALAR_AGG = re.compile(r"\b(?:Hash|Sort|ObjectHash)Aggregate\(keys?=\[\]")
# a single-key aggregate build: bounded by the KEY\'s cardinality — a
# domain claim (labels, sources, months, scenario grids), reported as
# its own category rather than benign or suspicious
_SINGLE_KEY_AGG = re.compile(
    r"\b(?:Hash|Sort|ObjectHash)Aggregate\(keys?=\[[^,\]]+\]"
)
_LIMIT = re.compile(r"\b(?:GlobalLimit|LocalLimit|CollectLimit|TakeOrderedAndProject)\b")
_FILESCAN = re.compile(r"\bFileScan parquet [^\n]*")


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _node_line(node) -> str:
    """One-line description of a single plan node (no subtree)."""
    try:
        return node.simpleString(100)
    except Exception:  # noqa: BLE001
        return node.nodeName()


def classify_build_subtree(text: str) -> str:
    """Classify a broadcast build side's subtree TEXT. benign = bounded
    by construction: a scalar (keys=[]/key=[]) aggregate reduces
    everything below it, a Limit bounds the row count, every file scan
    is a fixed-cardinality dim, or nothing scans files at all
    (LocalTableScan / cached fixtures / reused exchanges). keyed_agg =
    the build is a SINGLE-KEY grouped aggregate: bounded by the key's
    cardinality, which is a DOMAIN claim (labels, sources, calendar
    months, scenario grids) the query's docstring must carry — reported
    separately so a reviewer can audit the claims without launching
    Spark. suspicious = a data-sized FileScan reaches the broadcast
    build with nothing bounding it (the q446-class mistake)."""
    if _SCALAR_AGG.search(text) or _LIMIT.search(text):
        return "benign"
    scans = _FILESCAN.findall(text)
    if not scans and "InMemoryTableScan" not in text:
        return "benign"
    if scans and all(any(t in s for t in _BOUNDED_TABLES) for s in scans):
        return "benign"
    if _SINGLE_KEY_AGG.search(text):
        return "keyed_agg"
    return "suspicious"


def classify_single_partition(parent_lines: list[str]) -> str:
    """Classify one ``Exchange SinglePartition`` by its consumer chain
    (nearest ancestors first). benign = feeds a scalar aggregate or a
    bounded Limit; window = feeds a partitionless Window (fenced by the
    explicit whitelist in tests/test_plans.py); pandas_fold = feeds a
    FlatMapGroupsInPandas single-series fold (the SES/Holt/ARIMA/
    skyline per-series recursions over calendar-bounded spines — the
    grouping key is a constant, so one group is the semantics, not an
    accident); suspicious otherwise."""
    for line in parent_lines:
        if _SCALAR_AGG.search(line) or _LIMIT.search(line):
            return "benign"
        if "FlatMapGroupsInPandas" in line or "MapGroups" in line:
            return "pandas_fold"
        if re.match(r"\s*\*?\(?\d*\)?\s*(Window|WindowGroupLimit)\b", line) or line.lstrip().startswith(
            ("Window", "WindowGroupLimit", "RunningWindowFunction")
        ):
            return "window"
        # pass-through operators between the exchange and its real
        # consumer: sorts, projects, filters, codegen wrappers
        stripped = re.sub(r"^\*\(\d+\)\s*", "", line.lstrip())
        if stripped.startswith(("Sort ", "Sort[", "Project", "Filter", "InputAdapter", "WholeStageCodegen", "ColumnarToRow", "Coalesce")):
            continue
        return "suspicious"
    return "suspicious"


def walk_classify(root) -> dict:
    """Walk the physical plan tree once; classify every BNLJ build side
    and every SinglePartition exchange."""
    counts = {
        "bnlj_benign": 0,
        "bnlj_keyed_agg": 0,
        "bnlj_suspicious": 0,
        "sp_benign": 0,
        "sp_window": 0,
        "sp_pandas_fold": 0,
        "sp_suspicious": 0,
    }

    def visit(node, ancestors):
        name = node.nodeName()
        if "AdaptiveSparkPlan" in name:
            # AdaptiveSparkPlanExec is a leaf; the real tree hangs off
            # initialPlan (not yet executed at census time)
            visit(node.initialPlan(), ancestors)
            return
        if "InMemoryTableScan" in name:
            # Round-9 fix (VERDICT r8 What's-wrong #1): the plan CACHED
            # inside an InMemoryTableScan is an innerChild, not a child,
            # so the walker used to be blind to any BNLJ/SinglePartition
            # exchange under a tracked_persist boundary (41 of 710 r8
            # plans). treeString prints innerChildren on every
            # occurrence, so recursing unconditionally keeps the
            # text-count == classified-count reconciliation exact.
            try:
                cached = node.relation().cachedPlan()
            except Exception:  # noqa: BLE001
                cached = None
            if cached is not None:
                ancestors.append(node)
                visit(cached, ancestors)
                ancestors.pop()
        if "BroadcastNestedLoopJoin" in name:
            build = None
            for ch in _children(node):
                cn = ch.nodeName()
                if "BroadcastExchange" in cn or "BroadcastQueryStage" in cn:
                    build = ch
                    break
            if build is None:
                # ReusedExchange build sides have no subtree here; the
                # original exchange is classified where it first appears
                for ch in _children(node):
                    if "ReusedExchange" in ch.nodeName():
                        build = ch
                        break
            if build is None:
                counts["bnlj_suspicious"] += 1
            elif "ReusedExchange" in build.nodeName():
                counts["bnlj_benign"] += 1
            else:
                verdict = classify_build_subtree(build.toString())
                counts[f"bnlj_{verdict}"] += 1
        if name == "ShuffleExchange" or "Exchange" in name:
            line = _node_line(node)
            if "SinglePartition" in line:
                parent_lines = [_node_line(a) for a in reversed(ancestors)]
                verdict = classify_single_partition(parent_lines)
                counts[f"sp_{verdict}"] += 1
        ancestors.append(node)
        for ch in _children(node):
            visit(ch, ancestors)
        try:
            sq = node.subqueries()
            for i in range(sq.size()):
                visit(sq.apply(i), ancestors)
        except Exception:  # noqa: BLE001 — not every node exposes subqueries
            pass
        ancestors.pop()

    visit(root, [])
    return counts


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
    cls_totals = {
        "bnlj_benign": 0,
        "bnlj_keyed_agg": 0,
        "bnlj_suspicious": 0,
        "sp_benign": 0,
        "sp_window": 0,
        "sp_pandas_fold": 0,
        "sp_suspicious": 0,
    }
    suspicious_queries: list[str] = []
    census_mismatches: list[dict] = []
    n_err = 0
    # Documented exceptions: plans that ARE data-sized by design, with
    # the justification carried here and in the operator docstring. The
    # fence is suspicious_queries EXCLUDING these.
    documented = {
        "q35_nn_label_purity":
            "exact 1-NN label-purity CALIBRATION baseline — O(n2) all-"
            "pairs by documented design (operators/similarity.py "
            "docstring scopes it to calibration, never the scale path; "
            "q88/q177 are the bucketed production variants)",
    }
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan()
            text = plan.toString()
            cls = walk_classify(plan)
        except Exception as e:  # noqa: BLE001
            out["queries"][name] = {"error": str(e).splitlines()[0][:160]}
            n_err += 1
            continue
        finally:
            release_persisted()
            spark.catalog.clearCache()
        row = {k: len(re.findall(p, text)) for k, p in PATTERNS.items()}
        row.update(cls)
        for k, v in row.items():
            if k in totals:
                totals[k] += v
        for k in cls_totals:
            cls_totals[k] += cls[k]
        if cls["bnlj_suspicious"] or cls["sp_suspicious"]:
            if name not in documented:
                suspicious_queries.append(name)
        # Reconciliation fence (round 9): every BNLJ and SinglePartition
        # exchange the TEXT counter sees must also have been adjudicated
        # by the walker — a mismatch means a traversal blind spot (the r8
        # cache hole) and fails the census loudly instead of silently
        # under-covering.
        bnlj_classified = (
            cls["bnlj_benign"] + cls["bnlj_keyed_agg"] + cls["bnlj_suspicious"]
        )
        sp_classified = (
            cls["sp_benign"]
            + cls["sp_window"]
            + cls["sp_pandas_fold"]
            + cls["sp_suspicious"]
        )
        if (
            row["broadcast_nested_loop_joins"] != bnlj_classified
            or row["single_partition_exchanges"] != sp_classified
        ):
            census_mismatches.append(
                {
                    "query": name,
                    "bnlj_text": row["broadcast_nested_loop_joins"],
                    "bnlj_classified": bnlj_classified,
                    "sp_text": row["single_partition_exchanges"],
                    "sp_classified": sp_classified,
                }
            )
        out["queries"][name] = row
    out["totals"] = {**totals, **cls_totals}
    out["suspicious_queries"] = suspicious_queries
    out["census_mismatches"] = census_mismatches
    out["documented_suspicious"] = documented
    out["n_queries"] = len(out["queries"])
    out["n_errors"] = n_err
    line = json.dumps(
        {
            "n_queries": out["n_queries"],
            "n_errors": n_err,
            **totals,
            **cls_totals,
            "n_suspicious_queries": len(suspicious_queries),
            "n_census_mismatches": len(census_mismatches),
        }
    )
    print(line)
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    if census_mismatches:
        print(
            f"CENSUS MISMATCH: {len(census_mismatches)} queries where the "
            "text counters saw BNLJs/SinglePartition exchanges the walker "
            "never classified",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
