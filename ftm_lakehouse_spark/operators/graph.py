"""Graph-shaped operators: parent-chain / transitive-closure resolution.

Reference J5 (/root/reference/ftm_lakehouse/repository/documents.py:
53-86): folder path construction walks ``parent`` references up the
tree in Python, cycle-guarded. The Spark form is POINTER DOUBLING
(recursive doubling / path halving): every chain carries (cursor,
resolved segment, steps), and each round joins the chain table with
ITSELF, so a chain absorbs its cursor's ENTIRE resolved segment —
consumed ancestors double per round, rounds = O(log depth) instead of
O(depth). Each round is one shuffle equi-join on the cursor key; the
node table is never broadcast (the one-hop-per-round formulation
broadcasts the full edge set per round, which is both more rounds AND
a 100 TB non-starter)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resolve_parent_chains", "pagerank_fixed_point"]


def resolve_parent_chains(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    name_col: str = "name",
    max_depth: int = 32,
    sep: str = "/",
) -> DataFrame:
    """Resolve each node's full path by walking parent references.

    Returns (id, path, depth, is_cycle). Pointer doubling: the state
    row for node n is (cursor, path, depth) with the invariant
    ``full_path(n) = full_path(cursor) + sep + path`` and
    ``full_depth(n) = full_depth(cursor) + depth + 1`` (cursor NULL ⇒
    path/depth are final). One round joins state with itself on the
    cursor key, so a chain absorbs everything its cursor has already
    resolved — after k rounds every chain has consumed ≥ 2^k − 1
    ancestors, and ⌈log₂(max_depth+1)⌉ + 1 rounds settle everything
    the cap allows. A DANGLING cursor (parent id not in the node set)
    closes the chain as a root with one counted step — the lineage-cut
    contract the sf1 sweep pinned against DuckDB's recursive CTE
    (which silently DROPS dangling chains; see tools/gen_sf10x.py).
    Cycle members (and chains leading into a cycle) can never reach a
    NULL cursor; their depth doubles per round, crosses ``max_depth``
    within the same round budget, and is flagged ``is_cycle`` —
    mirroring the reference's visited-set guard. Each round
    localCheckpoints: the self-join would otherwise both recompute the
    whole history per round (turning O(log d) rounds back into
    O(d·log d) work) and build an exponentially nested plan."""
    state = nodes.select(
        F.col(id_col).alias("_nid"),
        F.col(parent_col).alias("_cursor"),
        F.col(name_col).alias("path"),
        F.lit(0).alias("depth"),
        F.lit(False).alias("is_cycle"),
    ).localCheckpoint(eager=True)
    rounds = max(1, (max_depth + 1).bit_length()) + 1
    is_open = F.col("_cursor").isNotNull() & ~F.col("is_cycle")
    for _ in range(rounds):
        if not state.filter(is_open).take(1):
            break
        closed = state.filter(~is_open)
        jump = state.select(
            F.col("_nid").alias("_cursor"),
            F.col("_cursor").alias("_next"),
            F.col("path").alias("_jseg"),
            F.col("depth").alias("_jdepth"),
        )
        new_depth = F.col("depth") + F.coalesce(F.col("_jdepth"), F.lit(0)) + 1
        stepped = (
            state.filter(is_open)
            .join(jump, "_cursor", "left")
            .select(
                "_nid",
                F.col("_next").alias("_cursor"),
                # concat_ws skips the NULL _jseg of a dangling cursor
                F.concat_ws(sep, F.col("_jseg"), F.col("path")).alias("path"),
                new_depth.alias("depth"),
                (F.col("_next").isNotNull() & (new_depth >= max_depth)).alias(
                    "is_cycle"
                ),
            )
        )
        state = closed.unionByName(stepped).localCheckpoint(eager=True)
    return state.select(F.col("_nid").alias(id_col), "path", "depth", "is_cycle")


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = 1_000_000_000_000,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank in integer fixed-point arithmetic: ranks are scaled to
    ``scale`` and every update uses only integer multiply / sum /
    floor-div, so the result is EXACTLY reproducible on any engine —
    no float-summation order sensitivity (the reason this variant
    exists: a float PageRank cannot hash-match across engines, a
    fixed-point one must). Update per node:

        r' = ((100-d) * scale) // (100 * N) + (d * sum(r[src] // deg[src])) // 100

    with d = ``damping_pct`` (default 85, i.e. 0.85).

    Requires every node to have at least one outgoing edge (symmetrize
    the edge set for undirected graphs — the caller owns dangling-mass
    policy). Returns (node, rank) with rank still scaled.

    Scale shape: deg is one groupBy of the edge list; each iteration
    is one join of the current rank vector onto edges (both sides
    hash-partitioned on the node key — AQE reuses the layout) plus one
    groupBy(dst). Rounds are O(iterations), independent of corpus
    size. The loop-invariant relations (edge list and the per-node
    degree table) are materialized ONCE up front — edges typically
    arrive as a derived plan (a distinct over a join, here), and
    leaving them lazy re-runs that derivation every iteration (the
    same repeated-subtree trap the pretrain pipeline hit; measured
    ~2× on the gate). On a cluster this is persist(MEMORY_AND_DISK)
    or a lakehouse materialization; rank-vector lineage is truncated
    every few rounds on long runs.
    """
    if iterations > 1:
        # the edge list is the BIG invariant (at two decades above the
        # test scale it is ~100M derived rows): persist DISK_ONLY so
        # materializing it never competes with the iteration joins for
        # execution memory — localCheckpoint's MEMORY_AND_DISK default
        # OOMed a 16 GB local driver at sf10 while DISK_ONLY sails
        # through; on a cluster this is the same call (or a lakehouse
        # materialization). The persist is LAZY: the deg/nodes
        # checkpoint below materializes it in the SAME pass that
        # computes the degrees, instead of a standalone count() that
        # paid one extra full read of the edge set (round-13, §1.2).
        from pyspark import StorageLevel

        edges = edges.persist(StorageLevel.DISK_ONLY)
    deg = edges.groupBy(src_col).agg(F.count("*").alias("_deg"))
    # the per-node table is small (one row per node) — memory is fine
    nodes = deg.select(F.col(src_col).alias("node"), "_deg").localCheckpoint(
        eager=True
    )
    # N (node count) and the edge count are TWO scalars: fold both to
    # the driver in one tiny job over the materialized node table so
    # ``base`` and the seed rank become literals — the
    # broadcast-crossJoin alternative re-attaches a
    # BroadcastNestedLoopJoin + broadcast exchange to EVERY iteration's
    # plan for a single number (round-12, guide §2.4). Same integer
    # arithmetic, identical ranks.
    head = nodes.agg(
        F.count("*").alias("_n"), F.sum("_deg").alias("_e")
    ).first()
    n, n_edges = head["_n"], head["_e"] or 0
    if iterations > 1 and n_edges >= 50_000_000:
        # Data-adaptive layout (round-7 sf100 fix): when the edge list
        # is large, re-persist it partitioned on the JOIN key (src) —
        # a distinct leaves it on (src, dst), so every iteration's
        # edges⋈ranks join would re-shuffle the WHOLE edge list per
        # round (3 × ~25 GB at sf100, the disk killer).
        # InMemoryTableScan preserves outputPartitioning + ordering, so
        # after the one re-layout pass the iterations move only the
        # rank vector. Below the threshold the ranks side broadcasts
        # and the edge layout is irrelevant — skip the extra pass
        # (measured 3× on the sf0.1 gate if applied unconditionally).
        from pyspark import StorageLevel

        n_shuf = int(
            edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        old = edges
        edges = (
            old.repartition(n_shuf, src_col)
            .sortWithinPartitions(src_col)
            .persist(StorageLevel.DISK_ONLY)
        )
        edges.count()
        old.unpersist()
    if n == 0:
        # empty edge set ⇒ no nodes: return an empty (node, rank) frame
        # (the pre-r12 broadcast-crossJoin form's behavior) instead of
        # dividing by zero below (ADVICE r12)
        return nodes.select("node", F.col("_deg").cast("long").alias("rank")).limit(0)
    base = F.lit((100 - damping_pct) * scale // (100 * n))
    # Join strategy per iteration (round-13, guide §3.1): n is already
    # a driver scalar, so the decision is made HERE, not left to size
    # estimates — Catalyst cannot see through the iterative
    # nodes⋈sums subtree and planned every iteration as a SortMergeJoin
    # that re-shuffled the ENTIRE persisted edge set (verified:
    # Exchange over InMemoryTableScan per iteration in the r13 before
    # plan, and the iteration stages serialized onto one AQE-coalesced
    # task). Below ~1M nodes (≈64 MB at ~64 B/row, the same
    # executor-memory budget as the session's adaptive broadcast
    # threshold) the rank vector is broadcast explicitly: edges never
    # move, each iteration is one map-side BHJ + one small groupBy
    # shuffle. Past the boundary the SMJ path stands, where the ≥50M
    # edge re-layout above already keeps the edge side shuffle-free.
    hint = F.broadcast if n <= 1_000_000 else (lambda df: df)
    ranks = nodes.select("node", "_deg", F.lit(scale // n).alias("rank"))
    for i in range(iterations):
        contribs = edges.join(hint(ranks), edges[src_col] == ranks.node).select(
            F.col(dst_col).alias("node"),
            F.expr("div(rank, _deg)").alias("_c"),
        )
        sums = contribs.groupBy("node").agg(F.sum("_c").alias("_s"))
        ranks = nodes.join(hint(sums), "node", "left").select(
            "node",
            "_deg",
            (
                base + F.expr(f"div({damping_pct} * coalesce(_s, 0), 100)")
            ).alias("rank"),
        )
        if iterations > 8 and i % 4 == 3:  # pragma: no cover - long runs only
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank")
