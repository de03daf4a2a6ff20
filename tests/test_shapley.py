"""Shapley attribution efficiency property on the q405 lattice logic."""

import datetime as dt

from pyspark.sql import functions as F


def test_shapley_efficiency_axiom(spark):
    """Sum of Shapley values == v(all channels) - v(empty set):
    total conversions attributable to any touch, computed on the real
    sf0.001 events table through the registry query."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = E.queries()["q405_shapley_channel_attribution"](spark, sf)
    total_shapley = sum(r["shapley_conversions"] for r in out.collect())

    from pandrs_spark.catalog import load_table as T

    ev = T(spark, sf, "events")
    firstp = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp")
    )
    touched_any = (
        ev.filter(F.col("event_type") != "purchase")
        .join(firstp, "user_id")
        .filter(F.col("tp").isNull() | (F.col("ts") < F.col("tp")))
        .select("user_id")
        .distinct()
    )
    v_all = (
        firstp.join(touched_any, "user_id")
        .filter(F.col("tp").isNotNull())
        .count()
    )
    v_empty = (
        firstp.join(touched_any, "user_id", "left_anti")
        .filter(F.col("tp").isNotNull())
        .count()
    )
    # v(S) counts users with touchset ⊆ S; empty-set users are in every
    # coalition, so Σφ = v(full) − v(∅) = conversions with ≥1 touch
    assert abs(total_shapley - (v_all + v_empty - v_empty)) < 1e-9
    assert total_shapley == v_all
