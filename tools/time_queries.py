"""Median-of-3 noop-sink walls for named queries in one warm session.

Usage: python tools/time_queries.py SF_DIR q732 q725 ...
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir

    import __spark_entry__ as entry
    from pandrs_spark.frame import release_persisted
    from pandrs_spark.session import get_spark

    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    def run(qn: str) -> float:
        t0 = time.time()
        qs[qn](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        release_persisted()
        return wall

    for name in names:
        qn = [k for k in qs if k == name or k.startswith(name + "_")][0]
        run(qn)  # warm
        walls = sorted(run(qn) for _ in range(3))
        print(f"{qn}: median {statistics.median(walls):.2f}s {['%.2f' % w for w in walls]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
