"""Hypothesis-test query batch (SURVEY.md §2.12, nonparametric tier).

Reference: /root/reference src/stats/nonparametric.rs (Mann-Whitney :14,
Kruskal-Wallis :201, KS :375) and src/stats/mod.rs (anova :354). Every
test reduces 100 TB of rows to a distinct-value histogram (one shuffle,
partial-aggregated) before any ordered pass — see
operators/hypothesis.py. Both engines evaluate the same statistic
formula over the same exact sums, so values hash-match.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pandrs_spark.catalog import load_table as T
from pandrs_spark.operators.hypothesis import (
    anova_oneway,
    kruskal_wallis,
    ks_2samp,
    mann_whitney_u,
)
from pandrs_spark.queries import query

# Shared oracle scaffolding: rank histogram over customer balances for a
# pair (or all) of market segments.
_HIST = """
per_vg AS (
    SELECT c_acctbal AS value, c_mktsegment AS grp, COUNT(*) AS cnt_g
    FROM two GROUP BY value, grp
),
per_v AS (SELECT value, SUM(cnt_g) AS cnt FROM per_vg GROUP BY value),
ranked AS (
    SELECT value, cnt, SUM(cnt) OVER (ORDER BY value) AS cum FROM per_v
),
hist AS (
    SELECT g.value, g.grp, g.cnt_g, r.cnt,
           CAST(r.cum - (r.cnt - 1) / 2.0 AS DECIMAL(32, 1)) AS avg_rank
    FROM per_vg g JOIN ranked r USING (value)
),
ties AS (SELECT SUM(cnt * cnt * cnt - cnt) AS ties FROM per_v)
"""


# --- q71: Mann-Whitney U (nonparametric.rs:14) ------------------------------
@query(
    "q71_mann_whitney_segments",
    oracle=f"""
    WITH two AS (
        SELECT c_acctbal, c_mktsegment FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    {_HIST},
    stats AS (
        SELECT
            CAST(SUM(CASE WHEN grp = 'BUILDING' THEN cnt_g ELSE 0 END) AS BIGINT) AS n1,
            CAST(SUM(CASE WHEN grp = 'MACHINERY' THEN cnt_g ELSE 0 END) AS BIGINT) AS n2,
            CAST(SUM(CASE WHEN grp = 'BUILDING' THEN avg_rank * cnt_g
                          ELSE CAST(0 AS DECIMAL(32, 1)) END) AS DOUBLE) AS r1
        FROM hist
    )
    SELECT n1, n2,
           r1 - n1 * (n1 + 1) / 2 AS u1,
           n1 * n2 - (r1 - n1 * (n1 + 1) / 2) AS u2,
           ROUND((r1 - n1 * (n1 + 1) / 2 - n1 * n2 / 2) /
                 SQRT(n1 * n2 / 12.0 *
                      ((n1 + n2 + 1) - ties / CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE))),
                 6) AS z
    FROM stats, ties
    """,
)
def q71(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    res = mann_whitney_u(cust, "c_acctbal", "c_mktsegment", "BUILDING", "MACHINERY")
    return res.select("n1", "n2", "u1", "u2", F.round("z", 6).alias("z"))


# --- q72: two-sample Kolmogorov-Smirnov (nonparametric.rs:375) --------------
@query(
    "q72_ks_two_sample",
    oracle="""
    WITH two AS (
        SELECT c_acctbal, c_mktsegment FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    per_v AS (
        SELECT c_acctbal AS value,
               SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS c1,
               SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS c2
        FROM two GROUP BY value
    ),
    cdf AS (
        SELECT SUM(c1) OVER (ORDER BY value) AS cum1,
               SUM(c2) OVER (ORDER BY value) AS cum2
        FROM per_v
    ),
    totals AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM per_v)
    SELECT ROUND(MAX(ABS(cum1 / n1 - cum2 / n2)), 6) AS ks_d FROM cdf, totals
    """,
)
def q72(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    res = ks_2samp(cust, "c_acctbal", "c_mktsegment", "BUILDING", "MACHINERY")
    return res.select(F.round("ks_d", 6).alias("ks_d"))


# --- q73: Kruskal-Wallis across all segments (nonparametric.rs:201) ---------
@query(
    "q73_kruskal_wallis_segments",
    oracle=f"""
    WITH two AS (SELECT c_acctbal, c_mktsegment FROM customer),
    {_HIST},
    per_g AS (
        SELECT grp, SUM(cnt_g) AS n_g,
               CAST(SUM(avg_rank * cnt_g) AS DOUBLE) AS r_g
        FROM hist GROUP BY grp
    ),
    gstats AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n, COUNT(*) AS k,
               SUM(r_g * r_g / n_g) AS rr
        FROM per_g
    )
    SELECT n, k,
           ROUND((12.0 / (n * (n + 1.0)) * rr - 3.0 * (n + 1)) /
                 (1.0 - ties / (CAST(n AS DOUBLE) * n * n - n)), 6) AS h
    FROM gstats, ties
    """,
)
def q73(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    res = kruskal_wallis(cust, "c_acctbal", "c_mktsegment")
    return res.select("n", "k", F.round("h", 6).alias("h"))


# --- q74: one-way ANOVA F (src/stats/mod.rs:354) ----------------------------
@query(
    "q74_anova_oneway_segments",
    oracle="""
    WITH per_g AS (
        SELECT c_mktsegment,
               COUNT(c_acctbal) AS n_g,
               CAST(SUM(CAST(ROUND(c_acctbal, 2) AS DECIMAL(32, 2))) AS DOUBLE) AS s_g,
               CAST(SUM(CAST(ROUND(c_acctbal * c_acctbal, 4) AS DECIMAL(32, 4))) AS DOUBLE) AS ss_g
        FROM customer GROUP BY c_mktsegment
    ),
    tot AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n, COUNT(*) AS k,
               SUM(s_g) AS s, SUM(ss_g) AS ss,
               SUM(s_g * s_g / n_g) AS sgg
        FROM per_g
    )
    SELECT n, k,
           ROUND(((sgg - s * s / n) / (k - 1)) / ((ss - sgg) / (n - k)), 6) AS f_stat
    FROM tot
    """,
)
def q74(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    res = anova_oneway(cust, "c_acctbal", "c_mktsegment")
    return res.select("n", "k", F.round("f_stat", 6).alias("f_stat"))
