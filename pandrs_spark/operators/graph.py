"""Graph operators (SURVEY.md §2.14) as iterative DataFrame programs.

The reference builds an adjacency-list graph in memory
(/root/reference src/graph/mod.rs:168, src/graph/core.rs) and walks it
single-threaded: centrality (src/graph/centrality.rs:33,55,77,250),
components (src/graph/components.rs:70,250), paths (src/graph/path.rs).

Spark-first re-expression: a graph IS two DataFrames (vertices, edges).
Degree-style centrality is one aggregation; traversal algorithms
(connected components, PageRank, BFS) are loops of joins where each
iteration is one shuffle. Scale posture:

- edges are repartitioned ONCE on the join key and persisted, so every
  iteration reuses the same partitioning (no repeated exchange of the
  big side);
- per-iteration state (ranks/labels/frontier) is small relative to
  edges and is what moves;
- lineage is cut with ``localCheckpoint`` every few iterations so plans
  don't grow unboundedly (the classic iterative-Spark failure mode);
- convergence checks (``count`` on changed rows) are cheap aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pandrs_spark.operators.util import right_size_keyed, tracked_persist

__all__ = [
    "ConvergenceError",
    "degrees",
    "rich_club_coefficient",
    "edge_embeddedness",
    "k_truss",
    "symmetrize",
    "connected_components",
    "pagerank",
    "personalized_pagerank",
    "bfs_hops",
    "triangle_count",
    "clustering_coefficient",
    "label_propagation",
    "modularity",
    "closeness_centrality",
    "eigenvector_centrality",
    "katz_centrality",
    "hits",
    "shortest_paths",
    "strongly_connected_components",
    "betweenness_centrality",
    "louvain",
    "from_adjacency",
    "dfs_preorder",
]

_CHECKPOINT_EVERY = 5


class ConvergenceError(RuntimeError):
    """Raised by iterative graph operators when ``check_convergence=True``
    and the iteration budget (``max_iter`` / ``iterations``) was
    exhausted before the fixpoint — the k-truss certificate pattern
    (q392) generalized family-wide. Without the flag the operators keep
    their documented truncation conventions (label leftovers by own id,
    return the last iterate), which is what the fixed-round SQL oracles
    mirror; WITH it a truncated answer can never be mistaken for a
    converged one."""


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Out/in/total degree per vertex (centrality.rs:33,55,77).

    One aggregation per direction + an outer merge; no iteration.
    """
    out_d = edges.groupBy(F.col(src).alias("id")).agg(F.count("*").alias("out_degree"))
    in_d = edges.groupBy(F.col(dst).alias("id")).agg(F.count("*").alias("in_degree"))
    return (
        out_d.join(in_d, "id", "outer")
        .select(
            "id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected closure: both directions, self-loops dropped, distinct.

    One explode pass instead of union-of-two-selects (round 11): the
    union form evaluated the ``edges`` subtree twice — for callers that
    pass a computed edge list (q143's all-pairs distance filter burned
    ~13 s of executor CPU per evaluation at sf0.1), the input is now
    scanned exactly once. Identical output rows.
    """
    both = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(src).alias("src"), F.col(dst).alias("dst")
                ),
                F.struct(
                    F.col(dst).alias("src"), F.col(src).alias("dst")
                ),
            )
        ).alias("e")
    )
    return (
        both.select(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    check_convergence: bool = False,
) -> DataFrame:
    """Connected components via min-label propagation (components.rs:70).

    Each vertex starts with its own id as label; every round each vertex
    takes the min label among itself and its neighbors. Converges in
    O(graph diameter) rounds — each round is one join + one aggregation.
    Returns (id, component) with component = min vertex id reachable.

    ``check_convergence=True`` raises :class:`ConvergenceError` if
    ``max_iter`` rounds end with labels still changing (graph diameter
    exceeds the budget); the default keeps the documented truncation
    convention (return the last iterate) that the fixed-round oracles
    mirror.
    """
    und0 = tracked_persist(symmetrize(edges, src, dst))
    converged = False
    labels = (
        und0.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .persist()
    )
    # materialize, then right-size the edge table every round re-scans
    labels.count()
    und = right_size_keyed(und0, "src")
    if und is not und0:
        und = tracked_persist(und)
    for i in range(max_iter):
        # neighbor labels: for each dst, min label of its srcs
        neighbor = (
            und.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        relaxed = (
            labels.join(neighbor, "id", "left")
            .select(
                "id",
                F.least(
                    "component", F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
        )
        # Path halving (round 11): every label value is itself a vertex
        # id in the SAME component (initially own id; the edge step
        # only adopts component-mates' labels; this step only adopts
        # the label OF a component-mate), so jumping each vertex to its
        # label's label is monotone non-increasing toward the same
        # min-id fixpoint while roughly halving the label-path length —
        # O(diameter) rounds become O(log diameter). A near-critical
        # eps-chain (q143, threshold 0.015) needed ~50 edge-only rounds
        # at sf0.1. The lazy checkpoint before the self-join keeps the
        # relaxed subtree from evaluating twice. (Round-11 negative
        # result, instrumented at sf0.1: a SECOND jump per round
        # converged no faster — changed-counts nearly identical — and
        # the extra pending lazy checkpoint chained per round blew the
        # per-round wall up 4×/round past round ~9; reverted.)
        relaxed = relaxed.localCheckpoint(eager=False)
        hop = relaxed.select(
            F.col("id").alias("__t"), F.col("component").alias("__tc")
        )
        updated = (
            relaxed.join(hop, relaxed["component"] == hop["__t"], "left")
            .select(
                "id",
                F.least(
                    "component", F.coalesce("__tc", F.col("component"))
                ).alias("component"),
            )
        )
        # Truncate lineage every round; lazy checkpoint (round 11) —
        # the convergence count below shuffles every partition of
        # `updated`, so it materializes the checkpoint inside the same
        # job instead of paying a dedicated eager-checkpoint action per
        # round (2 driver actions/round -> 1). The count is exact (no
        # limit) precisely so that every partition is computed.
        updated = updated.localCheckpoint(eager=False)
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "id")
            .filter("u.component < l.component")
            .count()
        )
        labels.unpersist()
        labels = updated
        if changed == 0:
            converged = True
            break
    if check_convergence and not converged:
        raise ConvergenceError(
            f"connected_components: labels still changing after "
            f"{max_iter} rounds — raise max_iter (diameter exceeds "
            "the iteration budget)"
        )
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    check_convergence: bool = False,
    tol: float = 1e-6,
) -> DataFrame:
    """PageRank, fixed-iteration power method (centrality.rs:250).

    rank_{t+1}(v) = (1-d)/N + d * Σ_{u→v} rank_t(u)/outdeg(u).
    Dangling nodes' mass is redistributed uniformly each round (the
    standard formulation the reference uses). Edges are pre-partitioned
    on ``src`` and persisted; each iteration shuffles only the rank
    vector (|V| rows), not the edge set.

    ``check_convergence=True`` certifies the fixed-round answer: after
    the last round it compares against the previous iterate and raises
    :class:`ConvergenceError` if max |Δrank| > ``tol`` (one extra
    |V|-row join + aggregate, only when the flag is set).
    """
    e = tracked_persist(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .repartition("src")
    )
    verts = tracked_persist(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = verts.count()
    # e and verts are materialized now, so cache stats are exact:
    # right-size the loop-invariant tables that every round re-scans
    # (provably-small graphs stop paying shuffle.partitions-wide cache
    # scans per round on a default session; big graphs unchanged).
    rs = right_size_keyed(verts, "id")
    if rs is not verts:
        verts = tracked_persist(rs)
    outdeg = tracked_persist(
        e.groupBy("src").agg(F.count("*").alias("outdeg"))
    )
    # Dangling handling costs one extra driver action per iteration;
    # detect up front whether any vertex lacks out-edges (never true for
    # symmetrized graphs) and skip the per-round reduction when possible.
    has_dangling = (
        verts.join(outdeg.withColumnRenamed("src", "id"), "id", "left_anti")
        .limit(1)
        .count()
        > 0
    )
    # The edges ⋈ outdeg join is loop-invariant — materialize it once
    # instead of re-joining every iteration (round 11: at 20 iterations
    # this removes 20 joins' worth of stages and driver re-planning;
    # the division stays rank/outdeg inside the loop, so the float
    # arithmetic is unchanged).
    ew = tracked_persist(right_size_keyed(e.join(outdeg, "src"), "src"))
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    prev_ranks = ranks
    for i in range(iterations):
        contribs = (
            ew.join(ranks.withColumnRenamed("id", "src"), "src")
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("contrib"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("contrib").alias("in_mass"))
        )
        # mass sitting on dangling vertices (no out-edges) this round
        if has_dangling:
            dangling = (
                ranks.join(outdeg.withColumnRenamed("src", "id"), "id", "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .first()[0]
            )
        else:
            dangling = 0.0
        ranks = verts.join(contribs, "id", "left").select(
            "id",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce("in_mass", F.lit(0.0)) + F.lit(dangling / n))
            ).alias("rank"),
        )
        # Lineage grows linearly (ranks is referenced once per round),
        # so per-round LAZY truncation keeps every catalyst plan one
        # round deep while deferring execution: the chain of pending
        # checkpoint RDDs forms a DAG that the first downstream action
        # computes in one submission instead of one eager
        # (AQE-multiplied) job per window — q68 at sf0.1: 109 scheduled
        # jobs -> single-digit, wall 24 s -> (see OPTIMIZATION_r11.md).
        # The |V|-row rank vector is tiny at any scale.
        ranks = ranks.localCheckpoint(eager=False)
        if check_convergence and i == iterations - 1:
            delta = (
                ranks.alias("cur")
                .join(prev_ranks.alias("p"), "id")
                .agg(
                    F.max(
                        F.abs(F.col("cur.rank") - F.col("p.rank"))
                    ).alias("d")
                )
                .first()["d"]
            )
            if delta is not None and delta > tol:
                raise ConvergenceError(
                    f"pagerank: max |Δrank| = {delta:.3e} > tol={tol} "
                    f"after {iterations} iterations — raise iterations"
                )
        prev_ranks = ranks
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seed,
    src: str = "src",
    dst: str = "dst",
    restart: float = 0.15,
    iterations: int = 10,
    check_convergence: bool = False,
    tol: float = 1e-6,
) -> DataFrame:
    """Personalized PageRank (random walk with restart to a single
    seed vertex): rank_{t+1}(v) = restart·1{v=seed} +
    (1-restart)·(Σ_{u→v} rank_t(u)/outdeg(u) + dangling·1{v=seed}) —
    the topic-sensitive variant of :func:`pagerank` (same power-method
    dataflow, centrality.rs:250 is the behavioral spec for the global
    walk), with dangling mass teleported back to the seed. The
    standard relevance/recommendation primitive: rank = probability a
    restarted random walker stands at v.

    Same scale shape as pagerank: edges deduped, partitioned once on
    src and persisted; each round shuffles only the |V|-row rank
    vector; lineage cut per iteration with localCheckpoint.

    ``check_convergence=True`` certifies the fixed-round answer the same
    way :func:`pagerank` does: after the last round it raises
    :class:`ConvergenceError` if max |Δrank| > ``tol``.
    """
    e = tracked_persist(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .repartition("src")
    )
    verts = tracked_persist(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    # materialize so cache stats are exact, then right-size the tables
    # the loop re-scans every round (no-op above one task per core)
    verts.count()
    rs = right_size_keyed(verts, "id")
    if rs is not verts:
        verts = tracked_persist(rs)
    outdeg = tracked_persist(
        e.groupBy("src").agg(F.count("*").alias("outdeg"))
    )
    has_dangling = (
        verts.join(outdeg.withColumnRenamed("src", "id"), "id", "left_anti")
        .limit(1)
        .count()
        > 0
    )
    is_seed = F.col("id") == F.lit(seed)
    # loop-invariant edges ⋈ outdeg hoisted out of the loop (round 11,
    # same change as pagerank — the division stays inside, float
    # arithmetic unchanged)
    ew = tracked_persist(right_size_keyed(e.join(outdeg, "src"), "src"))
    ranks = verts.withColumn(
        "rank", F.when(is_seed, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    prev_ranks = ranks
    for i in range(iterations):
        contribs = (
            ew.join(ranks.withColumnRenamed("id", "src"), "src")
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("contrib"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("contrib").alias("in_mass"))
        )
        if has_dangling:
            dangling = (
                ranks.join(
                    outdeg.withColumnRenamed("src", "id"), "id", "left_anti"
                )
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .first()[0]
            )
        else:
            dangling = 0.0
        ranks = verts.join(contribs, "id", "left").select(
            "id",
            (
                F.when(
                    is_seed,
                    F.lit(restart) + F.lit((1.0 - restart) * dangling),
                ).otherwise(F.lit(0.0))
                + F.lit(1.0 - restart) * F.coalesce("in_mass", F.lit(0.0))
            ).alias("rank"),
        )
        # per-round LAZY truncation: one-round-deep plans, single
        # deferred materialization (round 11, same change as pagerank)
        ranks = ranks.localCheckpoint(eager=False)
        if check_convergence and i == iterations - 1:
            delta = (
                ranks.alias("cur")
                .join(prev_ranks.alias("p"), "id")
                .agg(
                    F.max(F.abs(F.col("cur.rank") - F.col("p.rank"))).alias("d")
                )
                .first()["d"]
            )
            if delta is not None and delta > tol:
                raise ConvergenceError(
                    f"personalized_pagerank: max |Δrank| = {delta:.3e} > "
                    f"tol={tol} after {iterations} iterations — raise "
                    "iterations"
                )
        prev_ranks = ranks
    return ranks


def bfs_hops(
    edges: DataFrame,
    start_ids: list,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    check_convergence: bool = False,
) -> DataFrame:
    """Minimum hop count from a start set (path.rs BFS / unweighted
    shortest path). Frontier-based: each round expands the frontier one
    hop and keeps newly discovered vertices only — the frontier (small)
    moves to the edges (big, partitioned once).

    ``check_convergence=True`` raises :class:`ConvergenceError` if the
    frontier is still non-empty when ``max_iter`` is exhausted (the BFS
    was truncated before exploring the reachable set)."""
    und0 = tracked_persist(symmetrize(edges, src, dst).repartition("src"))
    spark = edges.sparkSession
    visited = tracked_persist(
        spark.createDataFrame(
            [(int(i), 0) for i in start_ids], "id bigint, hops int"
        )
    )
    # materialize, then right-size the edge table every hop re-scans
    und0.count()
    und = right_size_keyed(und0, "src")
    if und is not und0:
        und = tracked_persist(und)
    frontier = visited
    converged = False
    for hop in range(1, max_iter + 1):
        neighbors = (
            und.join(frontier.withColumnRenamed("id", "src").select("src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        new_frontier = tracked_persist(
            neighbors.join(visited, "id", "left_anti")
            .withColumn("hops", F.lit(hop))
        )
        if new_frontier.limit(1).count() == 0:
            converged = True
            break
        visited = visited.union(new_frontier)
        if hop % _CHECKPOINT_EVERY == 0:
            visited = visited.localCheckpoint(eager=True)
        frontier = new_frontier
    if check_convergence and not converged:
        raise ConvergenceError(
            f"bfs_hops: frontier still expanding after {max_iter} hops — "
            "raise max_iter (diameter exceeds the budget)"
        )
    return visited


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count (graph clustering primitive).

    Canonical-orientation join-join-join: orient every undirected edge
    small→large id, then count paths a<b<c with (a,b),(b,c),(a,c) all
    present. Each join shuffles on one endpoint; AQE broadcasts when a
    side is small. Returns a 1-row DataFrame (n_triangles).
    """
    und = symmetrize(edges, src, dst)
    canon = tracked_persist(
        und.filter(F.col("src") < F.col("dst")).distinct()
    )
    ab = canon.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = canon.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = canon.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    return tri.agg(F.count("*").alias("n_triangles"))


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-vertex local clustering coefficient:
    lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) with T(v) = triangles through
    v (graph clustering parity for src/graph/ metrics).

    Triangles enumerate once over the canonical (a<b<c) orientation —
    three bucket-joins — then each triangle credits its three corners;
    degrees come from one aggregation. All shuffles key on vertex ids.
    """
    und = symmetrize(edges, src, dst)
    canon = tracked_persist(
        und.filter(F.col("src") < F.col("dst")).distinct()
    )
    ab = canon.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = canon.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = canon.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    tri_counts = (
        tri.select(F.col("a").alias("id"))
        .union(tri.select(F.col("b").alias("id")))
        .union(tri.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("n_tri"))
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    return (
        deg.join(tri_counts, "id", "left")
        .select(
            "id",
            "deg",
            F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
            F.when(
                F.col("deg") > 1,
                2.0 * F.coalesce("n_tri", F.lit(0)) / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
    check_convergence: bool = False,
) -> DataFrame:
    """Synchronous label propagation (components.rs:250) with a
    deterministic tie-break: every round each vertex adopts the most
    frequent label among its neighbors, smallest label winning ties.
    Labels start as vertex ids; all updates in a round read the previous
    round's labels (synchronous), so the result is partitioning- and
    engine-independent — unlike the usual async LPA. Each round is one
    join + one aggregation + one per-vertex top-1 window.

    ``check_convergence=True`` raises :class:`ConvergenceError` if the
    final round still changed any label (sync LPA can also 2-cycle on
    bipartite structures — the check surfaces that too; the check costs
    one extra join + count, only when the flag is set).
    """
    und0 = tracked_persist(symmetrize(edges, src, dst))
    labels = tracked_persist(
        und0.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    # materialize, then right-size the edge table every round re-scans
    labels.count()
    und = right_size_keyed(und0, "dst")
    if und is not und0:
        und = tracked_persist(und)
    top1 = Window.partitionBy("id").orderBy(F.desc("c"), F.asc("label"))
    for i in range(iterations):
        nbr = (
            und.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        updated = (
            nbr.withColumn("rn", F.row_number().over(top1))
            .filter(F.col("rn") == 1)
            .select("id", "label")
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            updated = updated.localCheckpoint(eager=True)
        else:
            updated = tracked_persist(updated)
        if check_convergence and i == iterations - 1:
            changed = (
                updated.alias("u")
                .join(labels.alias("l"), "id")
                .filter("u.label <> l.label")
                .limit(1)
                .count()
            )
            if changed > 0:
                labels.unpersist()
                updated.unpersist()
                raise ConvergenceError(
                    f"label_propagation: labels still changing after "
                    f"{iterations} rounds — raise iterations (or the "
                    "graph oscillates under synchronous updates)"
                )
        labels.unpersist()
        labels = updated
    return labels


def modularity(
    und_edges: DataFrame,
    communities: DataFrame,
    src: str = "src",
    dst: str = "dst",
    community_col: str = "community",
) -> DataFrame:
    """Newman modularity of a vertex partition (components.rs:310):
    Q = sum_c [ E_c/(2m) − (D_c/(2m))² ] with E_c the directed-pair
    count inside community c, D_c its degree sum, and 2m the count of
    directed pairs in the symmetric edge set ``und_edges``. Returns one
    row per community with its contribution — three joins and two
    aggregations, all on the (small) vertex/community side after the
    edge table is reduced once.
    """
    comm = communities.select(F.col("id"), F.col(community_col).alias("__c__"))
    m2 = und_edges.count()  # 2m: symmetric edges count each pair twice
    intra = (
        und_edges.join(comm.withColumnRenamed("id", src), src)
        .withColumnRenamed("__c__", "__cs__")
        .join(comm.withColumnRenamed("id", dst), dst)
        .filter(F.col("__cs__") == F.col("__c__"))
        .groupBy(F.col("__cs__").alias("community"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    deg = und_edges.groupBy(F.col(src).alias("id")).agg(F.count(F.lit(1)).alias("d"))
    dsum_c = (
        deg.join(comm, "id")
        .groupBy(F.col("__c__").alias("community"))
        .agg(F.sum("d").alias("degree_sum"))
    )
    return (
        dsum_c.join(intra, "community", "left")
        .select(
            "community",
            F.coalesce("intra_edges", F.lit(0)).cast("long").alias("intra_edges"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            (
                F.coalesce("intra_edges", F.lit(0)) / F.lit(float(m2))
                - (F.col("degree_sum") / F.lit(float(m2))) ** 2
            ).alias("contribution"),
        )
    )


def closeness_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    roots: DataFrame | None = None,
    max_iter: int = 20,
    check_convergence: bool = False,
) -> DataFrame:
    """Closeness centrality (centrality.rs:109):
    closeness(v) = (reached(v) − 1) / Σ_u dist(v, u) over the vertices
    reachable from v, unweighted hops on the symmetric closure.

    Multi-source BFS: the state is (root, id, hops) pairs; every round
    the whole frontier (all roots at once) expands one hop through the
    edge table — one join + one anti-join per round, NOT one BFS per
    root. Exact closeness is inherently all-pairs (O(V·E) state); at
    scale pass ``roots`` (a DataFrame of ``id``) to compute landmark/
    pivot closeness over a sample of sources — the standard
    approximation — while the per-round dataflow stays identical.
    """
    und0 = tracked_persist(symmetrize(edges, src, dst).repartition("src"))
    verts = und0.select(F.col("src").alias("id")).distinct()
    start = (roots if roots is not None else verts).select("id")
    visited = tracked_persist(
        start.select(
            F.col("id").alias("root"), F.col("id"), F.lit(0).alias("hops")
        )
    )
    # materialize, then right-size the edge table every hop re-scans
    und0.count()
    und = right_size_keyed(und0, "src")
    if und is not und0:
        und = tracked_persist(und)
    frontier = visited
    converged = False
    for hop in range(1, max_iter + 1):
        neighbors = (
            und.join(frontier.withColumnRenamed("id", "src"), "src")
            .select("root", F.col("dst").alias("id"))
            .distinct()
        )
        new_frontier = tracked_persist(
            neighbors.join(visited, ["root", "id"], "left_anti")
            .withColumn("hops", F.lit(hop))
        )
        if new_frontier.limit(1).count() == 0:
            converged = True
            break
        visited = visited.union(new_frontier)
        if hop % _CHECKPOINT_EVERY == 0:
            visited = visited.localCheckpoint(eager=True)
        frontier = new_frontier
    if check_convergence and not converged:
        raise ConvergenceError(
            f"closeness_centrality: multi-source BFS frontier still "
            f"expanding after {max_iter} hops — raise max_iter"
        )
    return visited.groupBy(F.col("root").alias("id")).agg(
        (F.count(F.lit(1)) - 1).alias("n_reached"),
        F.when(
            F.sum("hops") > 0, (F.count(F.lit(1)) - 1) / F.sum("hops")
        )
        .otherwise(F.lit(0.0))
        .alias("closeness"),
    )


def _l2_normalize(scores: DataFrame, col: str) -> DataFrame:
    """Divide ``col`` by its L2 norm via a broadcast scalar join (keeps
    the whole round inside one plan — no driver round-trip).

    The input is checkpointed first: the norm subplan references
    ``scores`` a second time, so without materialization each iteration
    would DOUBLE the lineage (2^k plan growth over k rounds) — the
    classic iterative-Spark blowup. The score vector is |V| rows, so the
    checkpoint is cheap at any scale. Lazy (eager=False, round 11): the
    checkpoint materializes inside the next action that touches the
    scores (the norm broadcast build) instead of paying a dedicated
    driver job per normalize — one job per iteration saved, identical
    values and identical lineage truncation.
    """
    scores = scores.localCheckpoint(eager=False)
    norm = scores.agg(F.sqrt(F.sum(F.col(col) * F.col(col))).alias("__norm__"))
    return scores.crossJoin(F.broadcast(norm)).select(
        *[c for c in scores.columns if c != col],
        (F.col(col) / F.col("__norm__")).alias(col),
    )


def eigenvector_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    check_convergence: bool = False,
    tol: float = 1e-6,
) -> DataFrame:
    """Eigenvector centrality by power iteration (centrality.rs:344):
    x ← A·x / ‖A·x‖₂ on the symmetric closure, fixed iteration count
    for engine-independent results. Edges partition once on the join
    key; each round moves only the |V|-row score vector.

    ``check_convergence=True`` raises :class:`ConvergenceError` if the
    last two (normalized) iterates differ by more than ``tol`` in max
    norm — the power method has not settled on the principal
    eigenvector at this budget.
    """
    und0 = tracked_persist(symmetrize(edges, src, dst).repartition("dst"))
    verts = tracked_persist(
        und0.select(F.col("src").alias("id")).distinct()
    )
    # materialize, then right-size the per-round tables (round 11)
    verts.count()
    und = right_size_keyed(und0, "dst")
    if und is not und0:
        und = tracked_persist(und)
    rs = right_size_keyed(verts, "id")
    if rs is not verts:
        verts = tracked_persist(rs)
    scores = verts.withColumn("score", F.lit(1.0))
    scores = _l2_normalize(scores, "score")
    prev_scores = scores
    for i in range(iterations):
        nbr_sum = (
            und.join(scores.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("score").alias("score"))
        )
        scores = verts.join(nbr_sum, "id", "left").select(
            "id", F.coalesce("score", F.lit(0.0)).alias("score")
        )
        scores = _l2_normalize(scores, "score")
        if check_convergence and i == iterations - 1:
            delta = (
                scores.alias("cur")
                .join(prev_scores.alias("p"), "id")
                .agg(
                    F.max(
                        F.abs(F.col("cur.score") - F.col("p.score"))
                    ).alias("d")
                )
                .first()["d"]
            )
            if delta is not None and delta > tol:
                raise ConvergenceError(
                    f"eigenvector_centrality: max |Δscore| = {delta:.3e} "
                    f"> tol={tol} after {iterations} iterations — raise "
                    "iterations"
                )
        prev_scores = scores
    return scores


def katz_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    alpha: float = 0.1,
    beta: float = 1.0,
    iterations: int = 10,
    check_convergence: bool = False,
    tol: float = 1e-6,
) -> DataFrame:
    """Katz centrality (centrality.rs:424), fixed-point iteration
    x ← α·Aᵀ·x + β over in-neighbors of the directed graph. α must be
    below 1/λ_max for convergence; fixed iterations keep it
    deterministic. Same one-small-shuffle-per-round shape as PageRank.

    ``check_convergence=True`` raises :class:`ConvergenceError` when the
    last two iterates differ by more than ``tol`` in max norm (the
    geometric α-series was truncated short of its fixpoint).
    """
    e0 = tracked_persist(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .repartition("src")
    )
    verts = tracked_persist(
        e0.select(F.col("src").alias("id"))
        .union(e0.select(F.col("dst").alias("id")))
        .distinct()
    )
    # materialize, then right-size the per-round tables (round 11)
    verts.count()
    e = right_size_keyed(e0, "src")
    if e is not e0:
        e = tracked_persist(e)
    rs = right_size_keyed(verts, "id")
    if rs is not verts:
        verts = tracked_persist(rs)
    scores = verts.withColumn("score", F.lit(float(beta)))
    prev_scores = scores
    for i in range(iterations):
        in_sum = (
            e.join(scores.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("score").alias("in_score"))
        )
        scores = verts.join(in_sum, "id", "left").select(
            "id",
            (
                F.lit(float(alpha)) * F.coalesce("in_score", F.lit(0.0))
                + F.lit(float(beta))
            ).alias("score"),
        )
        # per-round LAZY truncation (round 11, same change as pagerank)
        scores = scores.localCheckpoint(eager=False)
        if check_convergence and i == iterations - 1:
            delta = (
                scores.alias("cur")
                .join(prev_scores.alias("p"), "id")
                .agg(
                    F.max(
                        F.abs(F.col("cur.score") - F.col("p.score"))
                    ).alias("d")
                )
                .first()["d"]
            )
            if delta is not None and delta > tol:
                raise ConvergenceError(
                    f"katz_centrality: max |Δscore| = {delta:.3e} > "
                    f"tol={tol} after {iterations} iterations — raise "
                    "iterations or lower alpha"
                )
        prev_scores = scores
    return scores


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    check_convergence: bool = False,
    tol: float = 1e-6,
) -> DataFrame:
    """HITS hubs & authorities (centrality.rs:501) on the directed
    graph, L2-normalized each half-step:
    auth(v) ← Σ_{u→v} hub(u);  hub(u) ← Σ_{u→v} auth(v).
    Two small shuffles per round (the |V|-row score vectors move; edges
    stay partitioned). Returns (id, authority, hub).

    ``check_convergence=True`` raises :class:`ConvergenceError` when
    either normalized vector moved more than ``tol`` in max norm over
    the final round.
    """
    e0 = tracked_persist(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
    )
    verts = tracked_persist(
        e0.select(F.col("src").alias("id"))
        .union(e0.select(F.col("dst").alias("id")))
        .distinct()
    )
    # materialize, then right-size the per-round tables (round 11)
    verts.count()
    e = right_size_keyed(e0, "src")
    if e is not e0:
        e = tracked_persist(e)
    rs = right_size_keyed(verts, "id")
    if rs is not verts:
        verts = tracked_persist(rs)
    hubs = verts.withColumn("hub", F.lit(1.0))
    auths = verts.withColumn("authority", F.lit(1.0))
    prev_hubs, prev_auths = hubs, auths
    for i in range(iterations):
        auth_sum = (
            e.join(hubs.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("authority"))
        )
        auths = verts.join(auth_sum, "id", "left").select(
            "id", F.coalesce("authority", F.lit(0.0)).alias("authority")
        )
        auths = _l2_normalize(auths, "authority")
        hub_sum = (
            e.join(auths.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("authority").alias("hub"))
        )
        hubs = verts.join(hub_sum, "id", "left").select(
            "id", F.coalesce("hub", F.lit(0.0)).alias("hub")
        )
        hubs = _l2_normalize(hubs, "hub")
        # _l2_normalize already lazily truncates both vectors every
        # half-step — a dedicated eager checkpoint would only add jobs
        if check_convergence and i == iterations - 1:
            delta = (
                auths.alias("ca")
                .join(prev_auths.alias("pa"), "id")
                .join(hubs.alias("ch"), "id")
                .join(prev_hubs.alias("ph"), "id")
                .agg(
                    F.max(
                        F.greatest(
                            F.abs(F.col("ca.authority") - F.col("pa.authority")),
                            F.abs(F.col("ch.hub") - F.col("ph.hub")),
                        )
                    ).alias("d")
                )
                .first()["d"]
            )
            if delta is not None and delta > tol:
                raise ConvergenceError(
                    f"hits: max |Δscore| = {delta:.3e} > tol={tol} after "
                    f"{iterations} iterations — raise iterations"
                )
        prev_hubs, prev_auths = hubs, auths
    return auths.join(hubs, "id")


def shortest_paths(
    edges: DataFrame,
    source,
    src: str = "src",
    dst: str = "dst",
    cost: str = "cost",
    iterations: int = 10,
    check_convergence: bool = False,
) -> DataFrame:
    """Single-source weighted shortest paths (path.rs Dijkstra parity)
    by synchronous Bellman-Ford relaxation — the distributed-friendly
    formulation (Dijkstra's priority queue is inherently sequential):

        d_{k+1}(v) = min(d_k(v), min_{u→v}(d_k(u) + cost(u,v)))

    ``iterations`` bounds path length (≥ graph diameter for exactness).
    Integer costs keep results bit-identical across engines. Each round
    joins the |V|-row distance vector against the once-partitioned edge
    table. Unreachable vertices return NULL dist.

    ``check_convergence=True`` certifies the fixpoint: relaxation is
    monotone non-increasing, so two identical consecutive iterates mean
    no path can improve further; the check raises
    :class:`ConvergenceError` if the final round still relaxed any
    vertex.
    """
    e0 = tracked_persist(
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(cost).cast("long").alias("cost"),
        )
        .repartition("src")
    )
    verts = tracked_persist(
        e0.select(F.col("src").alias("id"))
        .union(e0.select(F.col("dst").alias("id")))
        .distinct()
    )
    # materialize, then right-size the per-round tables (round 11)
    verts.count()
    e = right_size_keyed(e0, "src")
    if e is not e0:
        e = tracked_persist(e)
    rs = right_size_keyed(verts, "id")
    if rs is not verts:
        verts = tracked_persist(rs)
    dist = verts.withColumn(
        "dist",
        F.when(F.col("id") == F.lit(source), F.lit(0).cast("long")).otherwise(
            F.lit(None).cast("long")
        ),
    )
    prev_dist = dist
    for i in range(iterations):
        cand = (
            e.join(
                dist.filter(F.col("dist").isNotNull()).withColumnRenamed(
                    "id", "src"
                ),
                "src",
            )
            .select(F.col("dst").alias("id"), (F.col("dist") + F.col("cost")).alias("cand"))
            .groupBy("id")
            .agg(F.min("cand").alias("cand"))
        )
        dist = dist.join(cand, "id", "left").select(
            "id",
            F.when(F.col("dist").isNull(), F.col("cand"))
            .when(F.col("cand").isNull(), F.col("dist"))
            .otherwise(F.least("dist", "cand"))
            .alias("dist"),
        )
        # Each round references `dist` twice (relax source + the merge
        # join), so the old every-5 cadence replayed up to 2^5 subtrees
        # per window (round 11, measured: 291 jobs at sf0.1). Truncate
        # every round; the exact changed-count materializes the lazy
        # checkpoint in the same job AND detects the fixpoint —
        # relaxation is monotone, so an unchanged round means every
        # remaining round is the identity and results are bit-identical
        # to running the full budget.
        dist = dist.localCheckpoint(eager=False)
        changed = (
            dist.alias("cur")
            .join(prev_dist.alias("p"), "id")
            .filter(~F.col("cur.dist").eqNullSafe(F.col("p.dist")))
            .count()
        )
        prev_dist = dist
        if changed == 0:
            break
    if check_convergence:
        # fixpoint certificate: one more relaxation must change nothing
        final_cand = (
            e.join(
                prev_dist.filter(F.col("dist").isNotNull()).withColumnRenamed(
                    "id", "src"
                ),
                "src",
            )
            .select(
                F.col("dst").alias("id"),
                (F.col("dist") + F.col("cost")).alias("cand"),
            )
            .groupBy("id")
            .agg(F.min("cand").alias("cand"))
        )
        still_relaxing = (
            prev_dist.join(final_cand, "id", "left")
            .filter(
                F.col("cand").isNotNull()
                & (F.col("dist").isNull() | (F.col("cand") < F.col("dist")))
            )
            .limit(1)
            .count()
        )
        if still_relaxing:
            raise ConvergenceError(
                f"shortest_paths: distances still relaxing after "
                f"{iterations} rounds — raise iterations (longest "
                "shortest path exceeds the budget)"
            )
    return dist


def _directed_reach(edges: DataFrame, max_iter: int) -> DataFrame:
    """All-pairs directed reachability (root, id) via multi-source
    frontier expansion — every vertex's frontier advances together, one
    join + one anti-join per round."""
    e = edges.select("src", "dst").distinct().repartition("src").persist()
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    visited = verts.select(F.col("id").alias("root"), "id").localCheckpoint(
        eager=True
    )
    frontier = visited
    for _hop in range(1, max_iter + 1):
        neighbors = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .select("root", F.col("dst").alias("id"))
            .distinct()
        )
        # Truncate lineage EVERY hop, on the frontier as well as the
        # visited set: new_frontier's plan references frontier AND
        # visited, so without per-hop cuts the logical plan triples per
        # round and the driver OOMs building plan strings long before
        # the data is large (seen at 15 vertices).
        new_frontier = neighbors.join(
            visited, ["root", "id"], "left_anti"
        ).localCheckpoint(eager=True)
        if new_frontier.limit(1).count() == 0:
            break
        visited = visited.union(new_frontier).localCheckpoint(eager=True)
        frontier = new_frontier
    e.unpersist()
    return visited


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    exact_small_graph: bool = False,
    check_convergence: bool = False,
) -> DataFrame:
    """Strongly connected components (components.rs:118).

    Default path: the **coloring/trim peeling algorithm** (Orzan-style
    FW-BW coloring) — O(V+E) state per round, the web-scale design:

    1. *Trim*: vertices with no remaining in-edges or no remaining
       out-edges are singleton SCCs; peel them.
    2. *Color*: propagate ``min(ancestor id)`` forward along edges to a
       fixpoint (same join-per-round dataflow as
       :func:`connected_components`, O(diameter) rounds).
    3. *Collect*: every vertex whose color equals its own id is a root
       — the minimum id OF its SCC (the min forward-ancestor of an SCC
       that lies inside the SCC is also its min member). A backward BFS
       from each root restricted to same-color edges collects exactly
       that root's SCC; every vertex joins at most one search, so the
       frontier state is O(V) total, never per-pair.
    4. Remove collected vertices and repeat. Each outer round retires
       at least the SCC holding the globally smallest remaining id, so
       the outer loop is bounded by the condensation's chain length
       (and in practice by a few rounds); ``max_iter`` caps the outer
       loop and every inner propagation, like every iterative operator
       in this module.

    ``exact_small_graph=True`` keeps the previous all-pairs mutual-
    reachability formulation: forward × backward multi-source BFS
    intersection. Its visited set is O(V²) worst case — only for
    analytic-scale graphs where the quadratic state is affordable and
    a single-pass (no outer peeling) plan is preferred.

    Returns (id, component) with component = min vertex id of the SCC,
    one row per vertex appearing in ``edges``.

    ``check_convergence=True`` raises :class:`ConvergenceError` whenever
    ANY bounded loop hit its budget before the fixpoint — the outer
    peel with vertices left over, an inner coloring pass still
    changing, or a backward collect with a live frontier. A truncated
    coloring does not merely leave leftovers: it can split an SCC into
    several colors, so the certificate covers the inner loops too. The
    default keeps the documented truncation convention (leftovers
    labeled as singletons) that bounded oracles mirror.
    """
    e0 = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    if exact_small_graph:
        fwd = _directed_reach(e0, max_iter)
        bwd = _directed_reach(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
            max_iter,
        )
        mutual = fwd.join(bwd, ["root", "id"])  # reaches AND is reached
        return mutual.groupBy(F.col("root").alias("id")).agg(
            F.min("id").alias("component")
        )

    rem_e = e0.repartition("src").localCheckpoint(eager=True)
    rem_v = (
        rem_e.select(F.col("src").alias("id"))
        .union(rem_e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    done: list[DataFrame] = []
    truncated: list[str] = []
    for _outer in range(max_iter):
        if rem_v.limit(1).count() == 0:
            break
        # --- 1. trim: no in-edge or no out-edge => singleton SCC ---
        core = rem_e.select(F.col("src").alias("id")).distinct().join(
            rem_e.select(F.col("dst").alias("id")).distinct(), "id"
        )
        trimmed = rem_v.join(core, "id", "left_anti").withColumn(
            "component", F.col("id")
        )
        trimmed = trimmed.localCheckpoint(eager=True)
        if trimmed.limit(1).count() > 0:
            done.append(trimmed)
            rem_v = rem_v.join(trimmed, "id", "left_anti").localCheckpoint(
                eager=True
            )
            rem_e = (
                rem_e.join(
                    rem_v.withColumnRenamed("id", "src"), "src", "left_semi"
                )
                .join(rem_v.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )
            if rem_v.limit(1).count() == 0:
                break
        # --- 2. forward coloring: min ancestor id to fixpoint ---
        colors = rem_v.withColumn("color", F.col("id")).localCheckpoint(
            eager=True
        )
        color_fixpoint = False
        for _ in range(max_iter):
            nbr = (
                rem_e.join(colors.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("color").alias("nc"))
            )
            upd = (
                colors.join(nbr, "id", "left")
                .select(
                    "id",
                    F.least(
                        "color", F.coalesce("nc", F.col("color"))
                    ).alias("color"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                upd.alias("u")
                .join(colors.alias("c"), "id")
                .filter("u.color < c.color")
                .limit(1)
                .count()
            )
            colors = upd
            if changed == 0:
                color_fixpoint = True
                break
        if not color_fixpoint:
            truncated.append(f"coloring (outer round {_outer + 1})")
        # --- 3. backward collect within color, from the color roots ---
        ce = (
            rem_e.join(
                colors.select(
                    F.col("id").alias("src"), F.col("color").alias("c_src")
                ),
                "src",
            )
            .join(
                colors.select(
                    F.col("id").alias("dst"), F.col("color").alias("c_dst")
                ),
                "dst",
            )
            .filter(F.col("c_src") == F.col("c_dst"))
            # reversed edge, tagged with the color's root
            .select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                F.col("c_src").alias("root"),
            )
            .localCheckpoint(eager=True)
        )
        visited = colors.filter(F.col("color") == F.col("id")).select(
            F.col("id").alias("root"), "id"
        ).localCheckpoint(eager=True)
        frontier = visited
        collect_fixpoint = False
        for _ in range(max_iter):
            nxt = (
                ce.join(
                    frontier.select("root", F.col("id").alias("src")),
                    ["root", "src"],
                )
                .select("root", F.col("dst").alias("id"))
                .distinct()
            )
            new_f = nxt.join(visited, ["root", "id"], "left_anti").localCheckpoint(
                eager=True
            )
            if new_f.limit(1).count() == 0:
                collect_fixpoint = True
                break
            visited = visited.union(new_f).localCheckpoint(eager=True)
            frontier = new_f
        if not collect_fixpoint:
            truncated.append(f"backward collect (outer round {_outer + 1})")
        scc = visited.select("id", F.col("root").alias("component"))
        scc = scc.localCheckpoint(eager=True)
        done.append(scc)
        rem_v = rem_v.join(scc, "id", "left_anti").localCheckpoint(eager=True)
        rem_e = (
            rem_e.join(rem_v.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(rem_v.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    # max_iter exhausted with vertices still unpeeled: label the
    # leftovers by their own id (same truncation convention as every
    # bounded iterative operator here — raise max_iter for deeper
    # condensation chains); check_convergence turns silent truncation
    # into a raise instead.
    if rem_v.limit(1).count() > 0:
        truncated.append("outer peel (vertices left unpeeled)")
        done.append(rem_v.withColumn("component", F.col("id")))
    if check_convergence and truncated:
        raise ConvergenceError(
            "strongly_connected_components: iteration budget "
            f"max_iter={max_iter} exhausted before fixpoint in: "
            + "; ".join(truncated)
        )
    out = done[0]
    for part in done[1:]:
        out = out.unionByName(part)
    return out


def betweenness_centrality(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Betweenness centrality, Brandes' algorithm (centrality.rs:152)
    re-expressed as layered DataFrame passes on the symmetric closure:

    forward: multi-source BFS records, per (root, v), the hop distance
    and σ(root, v) = number of shortest root→v paths (σ sums over
    predecessor frontier rows instead of counting distinct vertices);
    backward: dependencies accumulate layer by layer from the deepest
    hop toward the root,
        δ(root, v) = Σ_{w: succ on a shortest path} σ_v/σ_w · (1 + δ_w),
    and betweenness(v) = ½ Σ_root δ(root, v) (halved for the
    undirected double count).

    Every pass is a join keyed on vertex ids over the once-partitioned
    edge set; per-layer state is (root, vertex) rows. Exact betweenness
    is inherently all-pairs — at 100 TB scale feed a sampled root set
    (same dataflow, unbiased estimator) the way closeness does.
    """
    und = symmetrize(edges, src, dst).repartition("src").persist()
    verts = und.select(F.col("src").alias("id")).distinct()
    # forward phase: (root, id, hops, sigma)
    visited = tracked_persist(
        verts.select(
            F.col("id").alias("root"), "id", F.lit(0).alias("hops"),
            F.lit(1.0).alias("sigma"),
        )
    )
    frontier = visited
    layers = [visited]
    max_hop = 0
    for hop in range(1, max_iter + 1):
        expanded = (
            und.join(frontier.withColumnRenamed("id", "src"), "src")
            .select("root", F.col("dst").alias("id"), "sigma")
        )
        new_frontier = (
            expanded.join(visited.select("root", "id"), ["root", "id"], "left_anti")
            .groupBy("root", "id")
            .agg(F.sum("sigma").alias("sigma"))
            .withColumn("hops", F.lit(hop))
            .select("root", "id", "hops", "sigma")
            .localCheckpoint(eager=True)
        )
        if new_frontier.limit(1).count() == 0:
            break
        visited = visited.union(new_frontier).localCheckpoint(eager=True)
        layers.append(new_frontier)
        frontier = new_frontier
        max_hop = hop
    # backward phase: delta per (root, id), deepest layer first
    delta = layers[max_hop].select(
        "root", "id", F.lit(0.0).alias("delta")
    ) if max_hop > 0 else None
    acc = None
    for hop in range(max_hop, 0, -1):
        cur = layers[hop].join(
            delta.select("root", "id", "delta"), ["root", "id"], "left"
        ).select("root", "id", "sigma", F.coalesce("delta", F.lit(0.0)).alias("delta"))
        acc = cur if acc is None else acc.union(cur)
        # push dependency to hop-1 predecessors: pred p of w iff
        # hops(p) = hops(w) - 1 and (p, w) is an edge
        contrib = (
            cur.withColumnRenamed("id", "dst")
            .join(und, "dst")
            .select(
                "root",
                F.col("src").alias("id"),
                F.col("sigma").alias("w_sigma"),
                F.col("delta").alias("w_delta"),
            )
            .join(
                layers[hop - 1].select("root", "id", F.col("sigma").alias("p_sigma")),
                ["root", "id"],
            )
            .groupBy("root", "id", "p_sigma")
            .agg(
                F.sum(
                    F.col("p_sigma") / F.col("w_sigma") * (1.0 + F.col("w_delta"))
                ).alias("delta")
            )
            .select("root", "id", "delta")
            .localCheckpoint(eager=True)
        )
        delta = contrib
    und.unpersist()
    if acc is None:
        return verts.withColumn("betweenness", F.lit(0.0))
    # root layer (hop 0) gets no credit; sum deltas of non-root rows
    per_vertex = (
        acc.filter(F.col("id") != F.col("root"))
        .groupBy("id")
        .agg((F.sum("delta") / 2.0).alias("betweenness"))
    )
    return verts.join(per_vertex, "id", "left").select(
        "id", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )


def louvain(
    edges: DataFrame, src: str = "src", dst: str = "dst", iterations: int = 6
) -> DataFrame:
    """Louvain community detection, level-1 local-moving phase
    (components.rs:356), as synchronous DataFrame rounds.

    Every vertex starts in its own community. Each round scores, for
    every vertex v with degree k_v and every candidate community c
    (its neighbors' communities plus its own),

        score(v→c) = k_{v,c} − k_v · tot'_c / 2m,

    the standard modularity-gain numerator with tot'_c the candidate
    community's degree total excluding v itself. The argmax wins with a
    smallest-community-id tie-break, and only vertices with
    id % 2 == round % 2 may move in a given round — the alternation
    breaks the two-cycle oscillation synchronous updates are prone to
    while keeping the result partitioning- and engine-independent.

    Each round is two joins + two aggregations + a per-vertex top-1
    window over (vertex, neighbor-community) rows — the same bounded
    dataflow as label_propagation, so it scales to edge sets that only
    fit shuffled. Returns (id, community).
    """
    und = symmetrize(edges, src, dst).repartition("src").persist()
    m2 = float(und.count())  # 2m: each undirected pair counted twice
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("k_v")
    ).persist()
    labels = deg.select("id", F.col("id").alias("community")).persist()
    top1 = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("community"))
    for r in range(iterations):
        tot = (
            labels.join(deg, "id")
            .groupBy("community")
            .agg(F.sum("k_v").alias("tot_c"))
        )
        k_vc = (
            und.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"), "community")
            .agg(F.count(F.lit(1)).alias("k"))
        )
        stay = labels.select("id", "community", F.lit(0).alias("k"))
        cand = (
            k_vc.unionByName(stay)
            .groupBy("id", "community")
            .agg(F.max("k").alias("k_vc"))
            .join(deg, "id")
            .join(labels.withColumnRenamed("community", "own"), "id")
            .join(tot, "community")
            .withColumn(
                "score",
                F.col("k_vc")
                - F.col("k_v")
                * (
                    F.col("tot_c")
                    - F.when(F.col("community") == F.col("own"), F.col("k_v"))
                    .otherwise(F.lit(0))
                )
                / F.lit(m2),
            )
        )
        best = (
            cand.withColumn("rn", F.row_number().over(top1))
            .filter(F.col("rn") == 1)
            .select("id", F.col("community").alias("best"), "own")
        )
        updated = best.select(
            "id",
            F.when(F.col("id") % 2 == r % 2, F.col("best"))
            .otherwise(F.col("own"))
            .alias("community"),
        )
        # Each round stacks ~5 joins; truncate lineage every round or
        # Catalyst replans the whole history (plan depth, not data,
        # dominates wall-clock on small graphs and heap on big ones).
        updated = updated.localCheckpoint(eager=True)
        labels.unpersist()
        labels = updated
    und.unpersist()
    deg.unpersist()
    return labels


def from_adjacency(
    matrix: DataFrame,
    row_col: str = "row",
    col_col: str = "col",
    weight_col: str | None = "w",
    directed: bool = True,
) -> DataFrame:
    """Build an edge DataFrame from a (sparse, long-form) adjacency
    matrix (src/graph/mod.rs:289 — the reference takes a dense Vec<Vec>;
    long-form triplets are the only shape that survives 100 TB). Zero /
    NULL weights are non-edges; for undirected input only the upper
    triangle needs to be present and the symmetric closure is applied
    by the consuming algorithm. Returns (src, dst[, weight]).
    """
    out = matrix.filter(
        F.col(row_col).isNotNull() & F.col(col_col).isNotNull()
    )
    if weight_col is not None:
        out = out.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) != 0))
        cols = [
            F.col(row_col).alias("src"),
            F.col(col_col).alias("dst"),
            F.col(weight_col).alias("weight"),
        ]
    else:
        cols = [F.col(row_col).alias("src"), F.col(col_col).alias("dst")]
    edges = out.select(*cols)
    if not directed:
        back = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            *([F.col("weight")] if weight_col is not None else []),
        )
        edges = edges.union(back).filter(F.col("src") != F.col("dst")).distinct()
    return edges


def dfs_preorder(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Deterministic depth-first preorder (src/graph/traversal.rs DFS).

    A DFS order is sequential *within* a component by definition, so the
    distributed shape is: label components with the scalable min-label
    loop, then run the stack walk per component in parallel via
    ``applyInPandas`` — each group ships only its own component's edges,
    components process concurrently across executors. Start vertex =
    component min id; neighbors are visited in ascending id order, so
    the order is engine- and partitioning-independent. Undirected view
    of the edges (matching the reference's default traversal).
    Returns (id, component, dfs_order).
    """
    import pandas as pd

    und = symmetrize(edges, src, dst)
    comp = connected_components(edges, src, dst, max_iter=max_iter)
    e = und.join(comp.withColumnRenamed("id", "src"), "src").select(
        "src", "dst", "component"
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        adj: dict = {}
        for s, d in zip(pdf["src"], pdf["dst"]):
            adj.setdefault(int(s), []).append(int(d))
        # push descending so the smallest id pops (is visited) first
        for v in adj:
            adj[v].sort(reverse=True)
        root = min(adj)
        component = int(pdf["component"].iloc[0])
        seen: set = set()
        out = []
        stack = [root]
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen.add(v)
            out.append((v, component, len(out)))
            for n in adj.get(v, []):
                if n not in seen:
                    stack.append(n)
        return pd.DataFrame(out, columns=["id", "component", "dfs_order"])

    return e.groupBy("component").applyInPandas(
        walk, "id long, component long, dfs_order long"
    )


def kcore(
    edges: DataFrame,
    k: int,
    n_iter: int = 12,
    src: str = "src",
    dst: str = "dst",
    check_convergence: bool = False,
) -> DataFrame:
    """k-core decomposition by synchronous peeling: drop every vertex
    whose degree in the surviving subgraph is < k, repeat ``n_iter``
    rounds (fixed-iteration form so a SQL oracle can unroll the exact
    same rounds; n_iter >= the peel depth reaches the fixpoint — each
    round either removes a vertex or is already stable). Works on the
    undirected closure. Returns (id, core_degree) for the k-core
    members. ``check_convergence=True`` certifies the fixpoint: it
    raises :class:`ConvergenceError` if one more round would still
    peel (budget short of the peel depth).

    Each round is one degree aggregate + two broadcast semi-filters on
    the shrinking edge set — the standard distributed peeling shape
    (vertex-centric k-core, e.g. Quick et al.); no driver-side graph.
    Reference scope: graph algorithms tier (src/graph/).
    """
    cur = symmetrize(edges, src, dst).localCheckpoint(eager=False)
    n_edges = cur.count()
    for i in range(n_iter):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("__d__"))
        keep = deg.filter(F.col("__d__") >= k).select("src")
        cur = (
            cur.join(F.broadcast(keep), "src")
            .join(
                F.broadcast(keep.withColumnRenamed("src", "dst")), "dst"
            )
            .select("src", "dst")
        )
        # Each round references `cur` three times (degree agg + both
        # broadcast builds), so un-truncated lineage RE-EXECUTES prior
        # rounds with ~3^r fan-out — the old every-4 cadence paid up to
        # dozens of subtree replays per window (round 11, measured:
        # 49 jobs / 13 s of driver re-planning at sf0.1). Truncate
        # every round; the count doubles as the materializing action
        # AND the fixpoint detector: peeling is monotone, so a round
        # that removes no edge is the fixpoint and every remaining
        # round is the identity — results are bit-identical to running
        # the full budget.
        cur = cur.localCheckpoint(eager=False)
        new_edges = cur.count()
        if new_edges == n_edges:
            break
        n_edges = new_edges
    if check_convergence:
        # peeling reached its fixpoint iff one more round removes
        # nothing: every surviving vertex already has degree >= k
        cur = cur.localCheckpoint(eager=True)
        still_peeling = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("__d__"))
            .filter(F.col("__d__") < k)
            .limit(1)
            .count()
        )
        if still_peeling:
            raise ConvergenceError(
                f"kcore: peel still removing vertices after {n_iter} "
                "rounds — raise n_iter (peel depth exceeds the budget)"
            )
    return (
        cur.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )


def neighborhood_jaccard(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Jaccard similarity of vertex neighborhoods — the classic
    link-prediction feature: |N(a) ∩ N(b)| / |N(a) ∪ N(b)| for every
    pair sharing at least one neighbor. The common-neighbor join is
    an equi-join THROUGH the shared neighbor (wedge enumeration, cost
    = Σ deg(v)² — bounded by degree, never all vertex pairs).
    Returns (id_a, id_b, common, jaccard) with id_a < id_b.
    """
    und = symmetrize(edges, src, dst)
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    a = und.select(F.col("dst").alias("via"), F.col("src").alias("id_a"))
    b = und.select(F.col("dst").alias("via"), F.col("src").alias("id_b"))
    common = (
        a.join(b, "via")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    da = deg.select(F.col("id").alias("id_a"), F.col("deg").alias("da"))
    db = deg.select(F.col("id").alias("id_b"), F.col("deg").alias("db"))
    return (
        common.join(F.broadcast(da), "id_a")
        .join(F.broadcast(db), "id_b")
        .select(
            "id_a",
            "id_b",
            "common",
            F.round(
                F.col("common")
                / (F.col("da") + F.col("db") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )


def k_truss(
    edges: DataFrame,
    k: int,
    n_iter: int = 8,
    src: str = "src",
    dst: str = "dst",
    emit_convergence: bool = False,
) -> DataFrame:
    """k-truss decomposition by synchronous edge peeling (graph tier,
    src/graph/ — the reference ships vertex k-core; k-truss is its
    edge-support analogue, Cohen 2008): every surviving edge must close
    >= k-2 triangles WITHIN the surviving subgraph. Each round computes
    per-edge support with two adjacency joins on the shrinking
    canonical edge set and drops weak edges; ``n_iter`` rounds reach
    the fixpoint when n_iter >= the peel depth (peeling is monotone, so
    extra rounds are no-ops — the same fixed-round form as
    :func:`kcore`, unrollable by a SQL oracle).

    Returns (u, v, support) for truss edges with support recomputed on
    the final subgraph; ``emit_convergence=True`` appends a
    ``converged`` boolean certifying the last round removed nothing.

    Scale: the support join is the textbook distributed triangle
    enumeration (join on the lower-degree endpoint would halve wedge
    work; at the bounded analytic-graph sizes here the plain form
    keeps the oracle mirror exact). Lineage is cut every other round.
    """
    und = symmetrize(edges, src, dst)
    cur = (
        und.filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
    )
    # prev starts at cur (not None): with n_iter=0 the convergence
    # certificate compares the edge set against itself instead of
    # dereferencing an unset round.
    prev = cur

    def _support(e: DataFrame) -> DataFrame:
        # Support is LEFT-joined back onto the edge set (coalesce 0):
        # a triangle-free edge must surface with support 0 so the
        # k=2 threshold (k-2=0) correctly keeps every edge — an
        # inner-join shape would silently drop it.
        adj = e.select("u", "v").union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        a = adj.select(F.col("u"), F.col("v").alias("w"))
        b = adj.select(F.col("u").alias("v"), F.col("v").alias("w"))
        sup = (
            e.join(a, "u")
            .join(b, ["v", "w"])
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("support"))
        )
        return e.join(sup, ["u", "v"], "left").select(
            "u", "v", F.coalesce("support", F.lit(0)).alias("support")
        )

    for i in range(n_iter):
        prev = cur
        cur = _support(cur).filter(F.col("support") >= k - 2).select("u", "v")
        if (i + 1) % 2 == 0:
            cur = cur.localCheckpoint(eager=True)
    out = _support(cur).filter(F.col("support") >= k - 2)
    if emit_convergence:
        c_prev = prev.agg(F.count(F.lit(1)).alias("__n_prev__"))
        c_cur = cur.agg(F.count(F.lit(1)).alias("__n_cur__"))
        out = (
            out.crossJoin(F.broadcast(c_prev))
            .crossJoin(F.broadcast(c_cur))
            .withColumn("converged", F.col("__n_prev__") == F.col("__n_cur__"))
            .drop("__n_prev__", "__n_cur__")
        )
    return out


def rich_club_coefficient(
    edges: DataFrame,
    ks: tuple = (2, 4, 8),
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Rich-club coefficient φ(k) (Colizza et al. 2006 is the public
    spec; degree-correlation tier beside :func:`degrees` /
    assortativity): for each degree threshold k, restrict the
    undirected graph to vertices with degree > k and measure how
    densely they interconnect:

        φ(k) = 2·E_k / (N_k·(N_k − 1))

    Returns one row per k: (k, n_rich, e_rich, phi); phi NULL when
    N_k < 2.

    Scale: degrees are one aggregation; each threshold is two
    semi-joins of the edge list against the rich vertex set plus exact
    counts — k thresholds are a bounded explode, no pairwise work.
    """
    und = symmetrize(edges, src, dst)
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    spark = edges.sparkSession
    kdf = spark.createDataFrame([(int(k),) for k in ks], "k int")
    rich = F.broadcast(kdf).join(
        deg, deg.deg > F.col("k")
    ).select("k", "id")
    n_rich = rich.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n_rich"))
    # undirected edge canonical form, then require both endpoints rich
    canon = und.filter(F.col("src") < F.col("dst"))
    e_rich = (
        canon.join(rich.withColumnRenamed("id", "src"), "src")
        .join(
            rich.withColumnRenamed("id", "dst").withColumnRenamed("k", "k2"),
            "dst",
        )
        .filter(F.col("k") == F.col("k2"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("e_rich"))
    )
    out = (
        kdf.join(n_rich, "k", "left")
        .join(e_rich, "k", "left")
        .select(
            "k",
            F.coalesce("n_rich", F.lit(0)).alias("n_rich"),
            F.coalesce("e_rich", F.lit(0)).alias("e_rich"),
        )
    )
    return out.withColumn(
        "phi",
        F.when(
            F.col("n_rich") >= 2,
            2.0
            * F.col("e_rich")
            / (F.col("n_rich").cast("double") * (F.col("n_rich") - 1)),
        ),
    ).orderBy("k")


def edge_embeddedness(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-edge embeddedness = number of common neighbors of the two
    endpoints in the undirected graph (Granovetter tie-strength
    proxy; the edge-level analogue of :func:`clustering_coefficient`,
    same two-join distributed triangle enumeration as :func:`k_truss`
    support). Returns (u, v, embeddedness) for each canonical edge
    u < v, zero-support edges included.

    Scale: two adjacency equi-joins + one groupBy — never all-pairs.
    """
    und = symmetrize(edges, src, dst)
    e = und.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    adj = e.select("u", "v").union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    a = adj.select(F.col("u"), F.col("v").alias("w"))
    b = adj.select(F.col("u").alias("v"), F.col("v").alias("w"))
    sup = (
        e.join(a, "u")
        .join(b, ["v", "w"])
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("embeddedness"))
    )
    return e.join(sup, ["u", "v"], "left").select(
        "u",
        "v",
        F.coalesce("embeddedness", F.lit(0)).cast("long").alias("embeddedness"),
    )


def weighted_pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    damping: float = 0.85,
    iterations: int = 15,
    check_convergence: bool = False,
    tol: float = 1e-6,
) -> DataFrame:
    """Weighted PageRank: rank mass flows proportional to edge weight,
    rank_{t+1}(v) = (1−d)/N + d·Σ_{u→v} rank_t(u)·w(u,v)/W_out(u) — the
    recommendation-grade variant of :func:`pagerank` (centrality.rs:250
    is the unweighted behavioral spec). Dangling mass is NOT
    redistributed (it decays, matching the chained-CTE oracle); feed a
    graph where every vertex has out-weight for the conservative walk.

    Same scale shape as pagerank: weighted edges partitioned once on
    ``src`` and persisted, each round shuffles only the |V|-row rank
    vector, lineage cut per iteration. ``check_convergence=True``
    raises :class:`ConvergenceError` if the final round moved any rank
    by more than ``tol``.
    """
    e = tracked_persist(
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("double").alias("w"),
        )
        .repartition("src")
    )
    verts = tracked_persist(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = verts.count()
    # materialized now — right-size the per-round tables (round 11)
    rs = right_size_keyed(verts, "id")
    if rs is not verts:
        verts = tracked_persist(rs)
    outw = tracked_persist(
        e.groupBy("src").agg(F.sum("w").alias("wout"))
    )
    # loop-invariant edges ⋈ out-weight hoisted (round 11, same change
    # as pagerank — the rank·w/wout arithmetic stays inside the loop)
    ew = tracked_persist(right_size_keyed(e.join(outw, "src"), "src"))
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    prev_ranks = ranks
    for i in range(iterations):
        contribs = (
            ew.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(
                "dst",
                (F.col("rank") * F.col("w") / F.col("wout")).alias("contrib"),
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("contrib").alias("in_mass"))
        )
        ranks = verts.join(contribs, "id", "left").select(
            "id",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
            ).alias("rank"),
        )
        # per-round LAZY truncation (round 11, same change as pagerank)
        ranks = ranks.localCheckpoint(eager=False)
        if check_convergence and i == iterations - 1:
            delta = (
                ranks.alias("cur")
                .join(prev_ranks.alias("p"), "id")
                .agg(
                    F.max(F.abs(F.col("cur.rank") - F.col("p.rank"))).alias("d")
                )
                .first()["d"]
            )
            if delta is not None and delta > tol:
                raise ConvergenceError(
                    f"weighted_pagerank: max |Δrank| = {delta:.3e} > "
                    f"tol={tol} after {iterations} iterations — raise "
                    "iterations"
                )
        prev_ranks = ranks
    return ranks
