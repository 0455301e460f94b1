"""Hierarchy (tree) traversal operators.

The reference traverses the mst_group / stock-group / cost-centre /
godown trees with recursive CTEs (reference
reports/mssql/group-tree-parent-child.sql:4-9 and
group-tree-children-parent.sql:4-9, capped `option (maxrecursion 500)`).
Spark has no recursive CTE, so we iterate: one frontier⋈edges join per
tree level. The loop is driver-side but the *data* never leaves the
cluster; iterations = tree height (single digits for account charts),
and the edge set is broadcast when small — so each level is a
map-side-only stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(edges: DataFrame, max_depth: int = 32,
                       broadcast_edges: bool = True) -> DataFrame:
    """All (node, ancestor, depth) pairs reachable by following child→parent.

    ``edges`` must have columns ``child`` and ``parent``; one row per direct
    edge. Equivalent to the recursive CTE::

        WITH RECURSIVE cl AS (
          SELECT child AS node, parent AS ancestor, 1 AS depth FROM edges
          UNION ALL
          SELECT cl.node, e.parent, cl.depth+1 FROM cl JOIN edges e ON cl.ancestor = e.child
        ) SELECT * FROM cl

    Scale shape: per level one equi-join frontier(ancestor)⋈edges(child).
    With ``broadcast_edges`` the join is shuffle-free regardless of frontier
    size (edge tables — group trees — are dimension-sized). Depth bound
    ``max_depth`` replaces the reference's maxrecursion 500 guard; traversal
    stops as soon as a frontier is empty.
    """
    up = edges.select(F.col("child").alias("_e_child"), F.col("parent").alias("_e_parent"))
    if broadcast_edges:
        up = F.broadcast(up)

    frontier = edges.select(F.col("child").alias("node"),
                            F.col("parent").alias("ancestor"),
                            F.lit(1).cast("int").alias("depth"))
    levels = [frontier]
    for _ in range(max_depth - 1):
        frontier = (frontier.join(up, frontier.ancestor == F.col("_e_child"))
                    .select(F.col("node"), F.col("_e_parent").alias("ancestor"),
                            (F.col("depth") + F.lit(1)).cast("int").alias("depth")))
        # localCheckpoint would cut lineage for very deep trees; business
        # hierarchies are < 10 levels so plain lazy union is fine.
        if frontier.isEmpty():
            break
        levels.append(frontier)

    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def tree_paths(nodes: DataFrame, name_col: str = "name",
               parent_col: str = "parent", root_marker: str = "",
               max_depth: int = 32) -> DataFrame:
    """(name, path, depth) for every node, path = root/.../name.

    DataFrame equivalent of the reference's parent-child tree listing
    (reports/mssql/group-tree-parent-child.sql): starts at roots
    (parent == ``root_marker``) and joins children on parent=name per level.
    """
    base = nodes.select(F.col(name_col).alias("name"), F.col(parent_col).alias("parent"))
    frontier = (base.filter(F.col("parent") == root_marker)
                    .select("name", F.col("name").alias("path"),
                            F.lit(1).cast("int").alias("depth")))
    levels = [frontier]
    children = F.broadcast(base.select(F.col("name").alias("_c_name"),
                                       F.col("parent").alias("_c_parent")))
    for _ in range(max_depth - 1):
        frontier = (frontier.join(children, frontier.name == F.col("_c_parent"))
                    .select(F.col("_c_name").alias("name"),
                            F.concat_ws("/", F.col("path"), F.col("_c_name")).alias("path"),
                            (F.col("depth") + F.lit(1)).cast("int").alias("depth")))
        if frontier.isEmpty():
            break
        levels.append(frontier)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
