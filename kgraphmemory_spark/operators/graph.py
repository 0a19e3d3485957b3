"""Graph analytics over the materialized relation edges — BFS shortest
hops and fixed-iteration PageRank.

The reference walks its graph one SPARQL hop at a time (entity -> frame ->
slot traversals, `kgraph_frame_bridge.py:300-366`); whole-graph iterative
analytics don't exist there because pyoxigraph has no iteration primitive.
On Spark both are join-agg loops over the GraphFrames-style edge
DataFrame the pipeline materializes (`subj`/`obj` of `kg.relations`) —
the same shape `connected_components` (cc.py) already uses for
canonicalization.

Scale notes (shared by both loops):
- every round/iteration ends in `localCheckpoint` — without it the plan
  doubles per round and Catalyst analysis time, not the data, becomes the
  bottleneck;
- edges are cached once and reused every round; the per-round shuffle is
  keyed on the frontier/rank node id, so AQE's skew split covers hub
  nodes;
- BFS carries only the FRONTIER through the loop (visited nodes leave the
  join), so a round costs O(|frontier| x avg-degree), not O(|V|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shortest_hops(
    edges: DataFrame,
    sources: list[str],
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 15,
) -> DataFrame:
    """Directed BFS hop distance from ``sources`` -> DataFrame
    ``(node string, hops int)`` for every node reachable within
    ``max_hops`` (sources themselves at 0).  Frontier expansion, one
    join + anti-join per level, O(diameter) rounds.
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst")).distinct().cache()
    visited = spark.createDataFrame(
        [(s, 0) for s in sources], "node string, hops int").localCheckpoint()
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (frontier.join(e, frontier.node == e.src)
               .select(F.col("dst").alias("node")).distinct()
               .join(visited, "node", "left_anti")
               .withColumn("hops", F.lit(hop))
               .localCheckpoint())
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    e.unpersist()
    return visited


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 1,
) -> DataFrame:
    """Fixed-iteration PageRank -> ``(node string, pr double)`` with
    GraphX ``staticPageRank`` semantics: rank(0) = 1.0 for every node,
    rank(t+1) = (1 - damping) + damping * sum(in-neighbor rank(t) /
    out-degree) — dangling mass is NOT redistributed (matches GraphX; the
    registry oracle unrolls the identical recurrence in SQL).

    Each iteration: ranks join the (src, dst, outdeg)-annotated edge
    table on src (one keyed shuffle), partial+final hash agg by dst, left
    join back onto the node universe so rank-sinks keep receiving the
    (1 - damping) base.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().cache())
    ann = e.distinct().join(
        e.distinct().groupBy("src").agg(
            F.count(F.lit(1)).cast("double").alias("outdeg")),
        "src").cache()
    ranks = nodes.withColumn("pr", F.lit(1.0)).localCheckpoint()
    for it in range(1, iterations + 1):
        contrib = (ranks.join(ann, ranks.node == ann.src)
                   .groupBy(F.col("dst").alias("node"))
                   .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("c")))
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node",
                         (F.lit(1.0 - damping)
                          + F.lit(damping) * F.coalesce("c", F.lit(0.0))
                          ).alias("pr")))
        if it % checkpoint_every == 0 or it == iterations:
            ranks = ranks.localCheckpoint()
    nodes.unpersist()
    ann.unpersist()
    return ranks
