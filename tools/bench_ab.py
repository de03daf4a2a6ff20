"""A/B the round-8 de-hinting cost: hinted vs unhinted q03/q05, one
session, same bench profile as bench.py.

Round 8 removed broadcast hints from SF-scaling frames (q03's filtered
customer, q05's customer join) so a 100 TB run cannot die on a
driver-side broadcast build of a data-sized table; AQE/size-based
planning still broadcasts them at test SF. The committed r7→r8 headline
moved 1.05 → 1.262 s and VERDICT r8 (What's-wrong #3) asked for the A/B
that splits the deliberate de-hinting cost from machine drift. This
runs both variants back-to-back in ONE session (same JIT/cache state)
and writes BENCH_AB_r{N}.json.

Usage: python tools/bench_ab.py [sf_dir] [--json OUT]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _q03_hinted(spark, sf_dir):
    from pandrs_spark.catalog import load_table as T
    from pandrs_spark.functions.deterministic import dsum

    cust = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1999-01-01 00:00:00"
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1997-06-30 00:00:00"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def _q05_hinted(spark, sf_dir):
    """The pre-round-8 shape: dims joined BEFORE the aggregate, customer
    broadcast-hinted — fast at test SF, a scale bomb at 100 TB."""
    from pandrs_spark.catalog import load_table as T
    from pandrs_spark.functions.deterministic import dsum

    region = T(spark, sf_dir, "region")
    nation = T(spark, sf_dir, "nation")
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    ndim = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "r_name", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == cust.c_custkey,
        )
        .join(F.broadcast(ndim), F.col("c_nationkey") == ndim.n_nationkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from pandrs_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark("pandrs-bench-ab")
    spark.sparkContext.setLogLevel("ERROR")
    from pandrs_spark.catalog import enable_cache
    from pandrs_spark.frame import release_persisted

    enable_cache(warm=True, spark=spark, sf_dir=sf_dir)
    # identical profile to bench.py
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(4, spark.sparkContext.defaultParallelism // 8)),
    )

    qs = E.queries()
    variants = {
        "q03_unhinted": qs["q03_unshipped_revenue_topk"],
        "q03_hinted": _q03_hinted,
        "q05_unhinted": qs["q05_region_nation_revenue"],
        "q05_hinted": _q05_hinted,
    }
    dfs = {n: fn(spark, sf_dir) for n, fn in variants.items()}
    for _ in range(4):
        for df in dfs.values():
            df.write.format("noop").mode("overwrite").save()
    timings, spread = {}, {}
    for name, df in dfs.items():
        df.write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[2], 3)
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]
    release_persisted()
    out = {
        "metric": "dehinting_ab",
        "sf_dir": sf_dir,
        "method": "median-of-5, one session, bench.py profile",
        "timings": timings,
        "spread_min_max": spread,
        "dehinting_cost_sec": round(
            (timings["q03_unhinted"] - timings["q03_hinted"])
            + (timings["q05_unhinted"] - timings["q05_hinted"]),
            3,
        ),
    }
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
