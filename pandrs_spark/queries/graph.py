"""Graph query batch (SURVEY.md §2.14) over the nation trade graph.

Graph construction: nations are vertices; a directed edge (c_nation →
s_nation) exists when customers of one nation bought from suppliers of
another (customer ⋈ orders ⋈ lineitem ⋈ supplier), weighted by line
count. The "strong" subgraph keeps pairs with above-average weight —
deterministic at any scale factor.

The reference's graph algorithms are single-threaded adjacency walks
(/root/reference src/graph/centrality.rs, components.rs, path.rs);
here each is an iterative DataFrame program (operators/graph.py) whose
oracles are DuckDB recursive CTEs.

Scale: the edge-building join chains through orders/lineitem (the two
big tables) with nation-cardinality output — partial aggregation
collapses it before the shuffle; dims broadcast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pandrs_spark.catalog import load_table as T
from pandrs_spark.operators.graph import (
    bfs_hops,
    connected_components,
    degrees,
    pagerank,
    symmetrize,
    triangle_count,
)
from pandrs_spark.queries import query

# Shared SQL fragments for the oracle side -----------------------------------
_TRADE = """
trade AS (
    SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS cnt
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE c.c_nationkey <> s.s_nationkey
    GROUP BY src, dst
)
"""

_STRONG = _TRADE + """,
strong AS (
    SELECT src, dst FROM trade WHERE cnt > (SELECT AVG(cnt) FROM trade)
),
und AS (
    -- DISTINCT over UNION ALL, not bare UNION: inside WITH RECURSIVE,
    -- DuckDB 1.0 stops deduplicating UNION in non-recursive CTEs, which
    -- silently doubles reciprocal edges.
    SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM strong
        UNION ALL
        SELECT dst, src FROM strong
    ) t
)
"""


def _trade_edges(spark, sf_dir):
    """Directed nation→nation trade edges with weights."""
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    supp = T(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("cnt"))
    )


def _strong_edges(spark, sf_dir):
    trade = _trade_edges(spark, sf_dir)
    avg_cnt = trade.agg(F.avg("cnt")).first()[0]
    return trade.filter(F.col("cnt") > avg_cnt).select("src", "dst")


# --- q65: degree centrality (centrality.rs:33,55,77) ------------------------
@query(
    "q65_nation_trade_degrees",
    oracle=f"""
    WITH {_TRADE}
    SELECT v.id,
           COALESCE(o.out_degree, 0) AS out_degree,
           COALESCE(i.in_degree, 0) AS in_degree,
           COALESCE(o.out_degree, 0) + COALESCE(i.in_degree, 0) AS degree,
           COALESCE(o.out_weight, 0) + COALESCE(i.in_weight, 0) AS strength
    FROM (SELECT src AS id FROM trade UNION SELECT dst FROM trade) v
    LEFT JOIN (SELECT src AS id, COUNT(*) AS out_degree,
                      CAST(SUM(cnt) AS BIGINT) AS out_weight
               FROM trade GROUP BY src) o USING (id)
    LEFT JOIN (SELECT dst AS id, COUNT(*) AS in_degree,
                      CAST(SUM(cnt) AS BIGINT) AS in_weight
               FROM trade GROUP BY dst) i USING (id)
    ORDER BY id
    """,
)
def q65(spark, sf_dir):
    trade = _trade_edges(spark, sf_dir).persist()
    deg = degrees(trade, "src", "dst")
    strength = (
        trade.select(F.col("src").alias("id"), "cnt")
        .union(trade.select(F.col("dst").alias("id"), "cnt"))
        .groupBy("id")
        .agg(F.sum("cnt").alias("strength"))
    )
    return deg.join(strength, "id").orderBy("id")


# --- q66: triangle count on the strong subgraph -----------------------------
@query(
    "q66_trade_triangles",
    oracle=f"""
    WITH {_STRONG},
    canon AS (SELECT DISTINCT src, dst FROM und WHERE src < dst)
    SELECT COUNT(*) AS n_triangles
    FROM canon ab
    JOIN canon bc ON bc.src = ab.dst
    JOIN canon ac ON ac.src = ab.src AND ac.dst = bc.dst
    """,
)
def q66(spark, sf_dir):
    return triangle_count(_strong_edges(spark, sf_dir))


# --- q67: connected components (components.rs:70) ---------------------------
@query(
    "q67_trade_components",
    oracle=f"""
    WITH RECURSIVE {_STRONG},
    reach(a, b) AS (
        SELECT src, dst FROM und
        UNION
        SELECT r.a, u.dst FROM reach r JOIN und u ON r.b = u.src
    ),
    verts AS (SELECT DISTINCT src AS id FROM und)
    SELECT v.id, LEAST(v.id, MIN(r.b)) AS component
    FROM verts v LEFT JOIN reach r ON r.a = v.id
    GROUP BY v.id
    ORDER BY v.id
    """,
)
def q67(spark, sf_dir):
    return connected_components(_strong_edges(spark, sf_dir)).orderBy("id")


# --- q68: PageRank, 10 fixed iterations (centrality.rs:250) -----------------
# Recursive-CTE aggregation is not portable (DuckDB's working-table
# semantics diverge from the textbook power method), so the oracle
# unrolls the 10 iterations as chained CTEs — plain ANSI SQL.
def _pagerank_oracle(iterations: int = 10) -> str:
    steps = []
    for k in range(1, iterations + 1):
        steps.append(
            f"""pr{k} AS (
        SELECT v.id,
               0.15 / (SELECT n FROM nv) + 0.85 * COALESCE(m.mass, 0) AS rank
        FROM verts v LEFT JOIN (
            SELECT u.dst AS id, SUM(p.rank / o.d) AS mass
            FROM pr{k - 1} p
            JOIN und u ON u.src = p.id
            JOIN outdeg o ON o.src = p.id
            GROUP BY u.dst
        ) m ON m.id = v.id
    )"""
        )
    chained = ",\n    ".join(steps)
    return f"""
    WITH {_STRONG},
    verts AS (SELECT DISTINCT src AS id FROM und),
    nv AS (SELECT COUNT(*) AS n FROM verts),
    outdeg AS (SELECT src, COUNT(*) AS d FROM und GROUP BY src),
    pr0 AS (SELECT id, 1.0 / (SELECT n FROM nv) AS rank FROM verts),
    {chained}
    SELECT id, ROUND(rank, 6) AS rank FROM pr{iterations} ORDER BY id
    """


@query("q68_trade_pagerank", oracle=_pagerank_oracle())
def q68(spark, sf_dir):
    # PageRank itself is directional; the oracle ranks the undirected
    # trade graph, so feed it the symmetric closure.
    und = symmetrize(_strong_edges(spark, sf_dir))
    ranks = pagerank(und, iterations=10)
    return ranks.select("id", F.round("rank", 6).alias("rank")).orderBy("id")


# --- q69: BFS hop counts from nation 0 (path.rs) ----------------------------
@query(
    "q69_trade_bfs_hops",
    oracle=f"""
    WITH RECURSIVE {_STRONG},
    bfs(id, hops) AS (
        SELECT MIN(src), 0 FROM und
        UNION
        SELECT u.dst, b.hops + 1
        FROM bfs b JOIN und u ON u.src = b.id
        WHERE b.hops < 20
    )
    SELECT id, CAST(MIN(hops) AS INT) AS hops FROM bfs GROUP BY id ORDER BY id
    """,
)
def q69(spark, sf_dir):
    edges = _strong_edges(spark, sf_dir).persist()
    seed = edges.agg(F.least(F.min("src"), F.min("dst"))).first()[0]
    return bfs_hops(edges, [seed]).orderBy("id")


# --- q97: per-vertex clustering coefficient on the strong trade graph -------
@query(
    "q97_trade_clustering_coefficient",
    oracle=f"""
    WITH {_STRONG},
    canon AS (SELECT DISTINCT src, dst FROM und WHERE src < dst),
    tri AS (
        SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
        FROM canon ab
        JOIN canon bc ON bc.src = ab.dst
        JOIN canon ac ON ac.src = ab.src AND ac.dst = bc.dst
    ),
    tri_counts AS (
        SELECT id, COUNT(*) AS n_tri FROM (
            SELECT a AS id FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY id
    ),
    deg AS (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY src)
    SELECT d.id, d.deg, COALESCE(t.n_tri, 0) AS n_tri,
           ROUND(CASE WHEN d.deg > 1
                      THEN 2.0 * COALESCE(t.n_tri, 0) / (d.deg * (d.deg - 1))
                      ELSE 0.0 END, 6) AS lcc
    FROM deg d LEFT JOIN tri_counts t USING (id)
    ORDER BY d.id
    """,
)
def q97(spark, sf_dir):
    from pandrs_spark.operators.graph import clustering_coefficient

    lcc = clustering_coefficient(_strong_edges(spark, sf_dir))
    return lcc.select(
        "id", "deg", "n_tri", F.round("lcc", 6).alias("lcc")
    ).orderBy("id")


# --- q106: label propagation communities, 4 synchronous rounds
# (components.rs:250) ---------------------------------------------------------
# Deterministic variant: most-frequent neighbor label, smallest label on
# ties, all vertices updated from the previous round's labels. The
# oracle unrolls the 4 rounds as chained CTEs with the identical
# count-then-top-1 window.
def _lpa_oracle(iterations: int = 4) -> str:
    steps = []
    for k in range(1, iterations + 1):
        steps.append(
            f"""lp{k} AS (
        SELECT id, label FROM (
            SELECT u.src AS id, l.label,
                   ROW_NUMBER() OVER (
                       PARTITION BY u.src
                       ORDER BY COUNT(*) DESC, l.label
                   ) AS rn
            FROM und u JOIN lp{k - 1} l ON l.id = u.dst
            GROUP BY u.src, l.label
        ) t WHERE rn = 1
    )"""
        )
    chained = ",\n    ".join(steps)
    return f"""
    WITH {_STRONG},
    verts AS (SELECT DISTINCT src AS id FROM und),
    lp0 AS (SELECT id, id AS label FROM verts),
    {chained}
    SELECT id, label FROM lp{iterations} ORDER BY id
    """


@query("q106_label_propagation", oracle=_lpa_oracle())
def q106(spark, sf_dir):
    from pandrs_spark.operators.graph import label_propagation

    out = label_propagation(_strong_edges(spark, sf_dir), iterations=4)
    return out.orderBy("id")


# --- q108: Newman modularity of the connected-components partition
# (components.rs:310) ---------------------------------------------------------
@query(
    "q108_trade_modularity",
    oracle=f"""
    WITH RECURSIVE {_STRONG},
    reach(a, b) AS (
        SELECT src, dst FROM und
        UNION
        SELECT r.a, u.dst FROM reach r JOIN und u ON r.b = u.src
    ),
    verts AS (SELECT DISTINCT src AS id FROM und),
    comp AS (
        SELECT v.id, LEAST(v.id, MIN(r.b)) AS c
        FROM verts v LEFT JOIN reach r ON r.a = v.id
        GROUP BY v.id
    ),
    m2 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m2 FROM und),
    intra AS (
        SELECT cs.c, COUNT(*) AS e_c
        FROM und u
        JOIN comp cs ON cs.id = u.src
        JOIN comp cd ON cd.id = u.dst
        WHERE cs.c = cd.c
        GROUP BY cs.c
    ),
    deg AS (SELECT src AS id, COUNT(*) AS d FROM und GROUP BY src),
    dsums AS (
        SELECT comp.c, SUM(deg.d) AS d_c
        FROM deg JOIN comp ON comp.id = deg.id
        GROUP BY comp.c
    )
    SELECT d.c AS community,
           CAST(COALESCE(i.e_c, 0) AS BIGINT) AS intra_edges,
           CAST(d.d_c AS BIGINT) AS degree_sum,
           ROUND(COALESCE(i.e_c, 0) / m2.m2 - (d.d_c / m2.m2) * (d.d_c / m2.m2), 6)
               AS contribution
    FROM dsums d LEFT JOIN intra i ON i.c = d.c CROSS JOIN m2
    ORDER BY community
    """,
)
def q108(spark, sf_dir):
    from pandrs_spark.operators.graph import modularity

    edges = _strong_edges(spark, sf_dir)
    und = symmetrize(edges)
    comps = connected_components(edges).withColumnRenamed("component", "community")
    out = modularity(und, comps)
    return out.select(
        "community",
        "intra_edges",
        "degree_sum",
        F.round("contribution", 6).alias("contribution"),
    ).orderBy("community")
