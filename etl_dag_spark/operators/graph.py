"""Graph analytics as iterative DataFrame fixpoints: weighted PageRank.

Complements the connected-components labeling in ``operators/dedup.py``
(cluster_pairs) with the other canonical distributed-graph workload —
iterative rank propagation. The same discipline applies (SURVEY §6b-4):
every frontier stays persisted until the NEXT materialization, a fixed
iteration count (no data-dependent driver loop over floats), and the
only driver state is scalars.

Scale shape per iteration: one shuffle — contributions grouped by
destination — sized to the edge list; the (1−d)/N teleport and the
dangling-mass redistribution are scalar broadcasts, never a join
against a node-sized frame. At 100 TB the edge list is the cost, and
nothing here touches more than one pass of it per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
    driver_solve_max_edges: int = 500_000,
) -> DataFrame:
    """Multi-source BFS hop distances over a directed edge list —
    cycle-safe (every node is discovered exactly once, at its minimum
    hop count) → (node, dist INT); nodes unreachable from ``sources``
    are absent.

    ADAPTIVE physical strategy (r14, the greedy_earliest_survivors
    pattern): when the deduplicated edge list is at most
    ``driver_solve_max_edges`` rows (one count over the persisted edge
    frame), the exact BFS runs DRIVER-SIDE over the collected adjacency
    list — hop counts are integers, so the two paths are bit-equal by
    construction (pinned in tests/test_graph.py); the per-level Spark
    jobs of the distributed loop are pure scheduler overhead on small
    graphs. Above the bound the level-synchronous loop below runs
    unchanged — the 100 TB path never collects an SF-scaled edge list.

    Distributed path: level-synchronous frontier expansion — per level,
    one join of the frontier against the edge list (shuffle sized to
    the frontier's out-edges) and one anti-join against the visited
    set; the frontier and visited frames follow the checkpoint
    discipline (visited is referenced twice per level — dedupe + union
    — so its plan is truncated each level like PageRank's ranks).
    Driver state is one emptiness scalar per level; iteration count is
    O(graph diameter).

    Node ids compare (and return) as STRINGS: sources and both edge
    endpoints are cast identically, so numeric ids never fall into
    Spark's string-vs-number DOUBLE coercion (which collapses distinct
    ids above 2^53).
    """
    e = edges.select(
        F.col(src_col).cast("string").alias("src"),
        F.col(dst_col).cast("string").alias("dst"),
    ).distinct().persist()
    # one-job adaptive probe (r15, the cluster_pairs pattern):
    # limit(bound+1) answers the gate AND delivers the rows — BFS hop
    # counts are insensitive to adjacency order
    probe = e.limit(driver_solve_max_edges + 1).collect()
    if len(probe) <= driver_solve_max_edges:
        try:
            adj: dict[str, list[str]] = {}
            for r in probe:
                adj.setdefault(r["src"], []).append(r["dst"])
        finally:
            e.unpersist()
        srcs = [
            r["node"]
            for r in sources.select(
                F.col(sources.columns[0]).cast("string").alias("node")
            )
            .distinct()
            .collect()
        ]
        dist: dict[str, int] = {s: 0 for s in srcs}
        frontier = list(dist)
        level = 0
        while frontier:
            level += 1
            if level > max_iter:
                raise RuntimeError(f"BFS did not exhaust in {max_iter} levels")
            nxt: list[str] = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = level
                        nxt.append(v)
            frontier = nxt
        return edges.sparkSession.createDataFrame(
            sorted(dist.items()), "node string, dist int"
        )
    try:
        visited = (
            sources.select(F.col(sources.columns[0]).cast("string").alias("node"))
            .distinct()
            .withColumn("dist", F.lit(0))
            .localCheckpoint()
        )
        frontier = visited.select("node").localCheckpoint()
        for level in range(1, max_iter + 1):
            nxt = (
                frontier.join(e, frontier.node == e.src)
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(visited.select("node"), "node", "left_anti")
                .localCheckpoint()
            )
            if nxt.isEmpty():
                break
            visited = visited.unionByName(
                nxt.withColumn("dist", F.lit(level))
            ).localCheckpoint()
            frontier = nxt
        else:
            raise RuntimeError(f"BFS did not exhaust in {max_iter} levels")
    finally:
        e.unpersist()
    return visited.select("node", F.col("dist").cast("int").alias("dist"))


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    driver_solve_max_edges: int = 500_000,
) -> DataFrame:
    """Weighted PageRank over a directed edge list, fixed ``n_iter``
    power iterations (the production form: a fixed sweep count, not a
    float-convergence driver loop).

    → (node STRING, rank DOUBLE); ranks sum to 1.0 (dangling-node mass
    is redistributed uniformly each iteration, the standard
    correction). BREAKING NOTE (r14): node ids are cast to STRING like
    :func:`bfs_distances` — both adaptive paths return one type.
    Callers joining the rank frame back to a numeric-id frame must
    cast their side explicitly (``F.col(id).cast("string")``) or
    re-cast ``node`` back, or the join silently runs under Spark's
    string-vs-number DOUBLE coercion.

    ADAPTIVE: edge lists at most ``driver_solve_max_edges`` rows after
    folding solve driver-side in numpy (see the inline note); larger
    graphs run the distributed loop: per iteration, contribution =
    rank · w/out_w per edge, one groupBy shuffle on the destination;
    dangling mass is a SCALAR (one-row aggregate collected) folded
    into the teleport term — never a node-sized join. Ranks persist
    per iteration and the previous frontier unpersists only after the
    next one materializes (SURVEY §6b-4 frontier discipline).
    """
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = (
        edges.select(
            F.col(src_col).cast("string").alias("src"),
            F.col(dst_col).cast("string").alias("dst"),
            w.alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .persist()
    )
    # ADAPTIVE physical strategy (r14, the greedy_earliest_survivors
    # pattern): when the folded edge list fits under the bound, the
    # power iteration runs DRIVER-SIDE in numpy with the identical
    # update rule — the per-sweep Spark jobs (join + groupBy + two
    # checkpoint materializations) are pure scheduler overhead on small
    # graphs. Float sums accumulate in edge order instead of Spark's
    # partition order; both are within the reduction-order noise the
    # operator already carries (rows-only registration; the numpy
    # reference in tests/test_graph.py agrees to <=1e-9 with BOTH).
    # Above the bound the distributed loop runs unchanged — the 100 TB
    # path never collects an SF-scaled edge list.
    n_edges = e.count()
    if n_edges == 0:
        e.unpersist()
        return edges.sparkSession.createDataFrame([], "node string, rank double")
    if n_edges <= driver_solve_max_edges:
        import numpy as np

        try:
            rows = e.collect()
        finally:
            e.unpersist()
        node_list = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
        idx = {v: i for i, v in enumerate(node_list)}
        n = len(node_list)
        m = len(rows)
        src_i = np.fromiter((idx[r["src"]] for r in rows), dtype=np.int64, count=m)
        dst_i = np.fromiter((idx[r["dst"]] for r in rows), dtype=np.int64, count=m)
        wv = np.fromiter((float(r["w"]) for r in rows), dtype=np.float64, count=m)
        out_w = np.zeros(n)
        np.add.at(out_w, src_i, wv)
        # Degenerate-input alignment (r15, ADVICE r14): a src whose
        # weights sum to 0 gets p = NULL in the distributed loop (the
        # non-ANSI divide) — its contributions are silently dropped —
        # yet it is NOT in the distributed dangling set (it has edge
        # rows). Mirror both facts exactly: zero contribution (not
        # NaN), and dangling = "no out-edge at all", never out_w == 0.
        denom = out_w[src_i]
        p = np.divide(wv, denom, out=np.zeros_like(wv), where=denom != 0.0)
        dangling = np.ones(n, dtype=bool)
        dangling[src_i] = False
        rank = np.full(n, 1.0 / n)
        for _ in range(n_iter):
            contrib = np.zeros(n)
            np.add.at(contrib, dst_i, rank[src_i] * p)
            dm = float(rank[dangling].sum())
            rank = (1.0 - damping) / n + (damping / n) * dm + damping * contrib
        return edges.sparkSession.createDataFrame(
            [(v, float(rank[idx[v]])) for v in node_list],
            "node string, rank double",
        )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # normalized edge transition weights: one frame reused every sweep
    trans = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .persist()
    )
    trans.count()
    e.unpersist()

    # dangling node set (no out-edges) is loop-invariant: compute once
    dang = nodes.join(
        trans.select("src").distinct(), nodes.node == F.col("src"), "left_anti"
    ).persist()
    dang.count()

    # each sweep references `ranks` TWICE (contributions + dangling
    # mass), so a persist-only frontier would double the LOGICAL plan
    # per iteration — exponential analyzer cost by sweep 10 even though
    # the data is cached. An eager localCheckpoint truncates the plan
    # to a cached-scan every sweep (constant-size plans; the linear-
    # growth operators in hierarchy.py get away with persist because
    # they reference their frontier once).
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    for _ in range(n_iter):
        contrib = (
            ranks.join(trans, ranks.node == trans.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("in_rank"))
        )
        # dangling mass = rank sitting on no-out-edge nodes: a 1-row
        # aggregate folded in as a broadcast, redistributed uniformly
        # (keeps sum(rank) == 1) — in-plan, no driver collect per sweep
        dmass = ranks.join(dang, "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .join(F.broadcast(dmass))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping / n) * F.col("__dm")
                    + F.lit(damping) * F.coalesce("in_rank", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    # release the loop-invariant inputs; checkpointed blocks are GC'd
    # by the context cleaner
    nodes.unpersist()
    trans.unpersist()
    dang.unpersist()
    return ranks
