"""Dump .explain('formatted') for named registry queries to files.

Usage: python tools/dump_plans.py OUT_DIR SUFFIX SF_DIR q01 q03 ...
Writes OUT_DIR/<query>_<SUFFIX>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, suffix, sf_dir, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from pandrs_spark.frame import release_persisted
    from pandrs_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for want in names:
        hits = [k for k in qs if k == want or k.startswith(want + "_")]
        if not hits:
            print(f"unknown query {want!r}", file=sys.stderr)
            return 2
        name = hits[0]
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        release_persisted()
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
