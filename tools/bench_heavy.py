"""Heavy-operator scaling sweep (README "Scaling curve" second table).

Times named registry queries at one sf dir: one warmup run, then
best-of-2, full materialization via a count(). Prints one JSON line
per query and a total. Unlike bench.py (headline latency profile),
this uses the shipped library default session (AQE ON) because the
heavy tier's shuffles are big enough for AQE to matter.

Usage:
    python tools/bench_heavy.py SF_DIR [query ...]
    python tools/bench_heavy.py .sfbench/sf1 q122 q147 q177 q230
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = ["q122", "q147", "q177", "q230"]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or DEFAULT_QUERIES

    import __spark_entry__ as entry
    from pandrs_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    reg = {}
    for want in names:
        hits = [k for k in qs if k == want or k.startswith(want + "_")]
        if not hits:
            print(f"unknown query {want!r}", file=sys.stderr)
            return 2
        reg[hits[0]] = qs[hits[0]]

    results = {}
    for name, fn in reg.items():
        times = []
        for i in range(3):  # warmup + best-of-2
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times.append(time.perf_counter() - t0)
        results[name] = round(min(times[1:]), 3)
        print(json.dumps({"query": name, "sec": results[name], "sf_dir": sf_dir}))
    print(json.dumps({"total": round(sum(results.values()), 3), "queries": results, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
