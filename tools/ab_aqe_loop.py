"""A/B: AQE on vs off around iterative-loop queries (round 11 experiment).

Alternates the two profiles in one session, median-of-3 each, noop sink.
Usage: python tools/ab_aqe_loop.py SF_DIR qname [qname ...]
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
    from pandrs_spark.session import get_spark
    from pandrs_spark.frame import release_persisted

    spark = get_spark("ab-aqe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    def run(name: str, aqe: str) -> float:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        release_persisted()
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        return wall

    for name in names:
        hits = [k for k in qs if k == name or k.startswith(name + "_")]
        qn = hits[0]
        run(qn, "true")  # warm both paths once
        run(qn, "false")
        on, off = [], []
        for _ in range(3):
            on.append(run(qn, "true"))
            off.append(run(qn, "false"))
        print(
            f"{qn}: AQE-on median {statistics.median(on):.2f}s {sorted(on)} | "
            f"AQE-off median {statistics.median(off):.2f}s {sorted(off)}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
