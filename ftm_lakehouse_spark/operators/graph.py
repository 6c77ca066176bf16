"""Graph-shaped operators: parent-chain / transitive-closure resolution.

Reference J5 (/root/reference/ftm_lakehouse/repository/documents.py:
53-86): folder path construction walks ``parent`` references up the
tree in Python, cycle-guarded. The Spark form is an iterative
self-join — each round extends every chain by one hop; rounds =
O(max depth), each a broadcast-ed equi-join when the edge set is
dimension-sized (folder tables are), a shuffle join otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resolve_parent_chains"]


def resolve_parent_chains(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    name_col: str = "name",
    max_depth: int = 32,
    sep: str = "/",
) -> DataFrame:
    """Resolve each node's full path by walking parent references.

    Returns (id, path, depth, is_cycle). Iterates until no chain grows
    or ``max_depth`` (the cycle guard — anything still unresolved at
    the cap is flagged, mirroring the reference's visited-set guard).
    """
    edges = nodes.select(
        F.col(id_col).alias("_nid"),
        F.col(parent_col).alias("_parent"),
        F.col(name_col).alias("_name"),
    )
    chains = edges.select(
        "_nid",
        F.col("_parent").alias("_cursor"),
        F.col("_name").alias("path"),
        F.lit(0).alias("depth"),
        F.lit(False).alias("is_cycle"),
    )
    parents = edges.select(
        F.col("_nid").alias("_cursor"),
        F.col("_parent").alias("_next"),
        F.col("_name").alias("_pname"),
    )
    for depth in range(1, max_depth + 1):
        open_chains = chains.filter(F.col("_cursor").isNotNull() & ~F.col("is_cycle"))
        if not open_chains.take(1):
            break
        closed = chains.filter(F.col("_cursor").isNull() | F.col("is_cycle"))
        stepped = (
            open_chains.join(F.broadcast(parents), "_cursor", "left")
            .select(
                "_nid",
                F.col("_next").alias("_cursor"),
                F.concat_ws(sep, F.col("_pname"), F.col("path")).alias("path"),
                F.lit(depth).alias("depth"),
                (F.lit(depth >= max_depth) & F.col("_next").isNotNull()).alias("is_cycle"),
            )
        )
        chains = closed.unionByName(stepped)
        # localCheckpoint keeps the lineage from growing per iteration
        # (iterative self-joins otherwise build O(depth)-deep plans)
        if depth % 8 == 0:
            chains = chains.localCheckpoint(eager=True)
    return chains.select(
        F.col("_nid").alias(id_col), "path", "depth", "is_cycle"
    )
