"""Connected components over an edge DataFrame — the canonicalization core.

Alternating large-star / small-star (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14): converges in O(log n) rounds, every
round is plain groupBy/join — shuffle-friendly, no driver-side graph.  The
reference has no CC (closest analog is URI-dedup); the north rule requires
it for entity canonicalization on a GraphFrames-style edge DataFrame.

Scale notes:
- per-round `localCheckpoint` truncates lineage (mandatory — the plan
  otherwise doubles every round);
- convergence detected by an order-insensitive checksum
  (sum of xxhash64(u,v)) + edge count — one cheap agg per round instead of
  an exceptAll diff;
- labels are strings (entity URIs); min = lexicographic, matching
  `semantics.canonical_map`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _checksum(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).cast("decimal(38,0)").alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """→ DataFrame(node string, component string) for every node that
    appears in ``edges``; component = lexicographic min node id of the CC.
    Callers union in their isolated nodes (component = self) afterwards.
    """
    raw = edges.select(F.col(src).cast("string").alias("u"),
                       F.col(dst).cast("string").alias("v"))
    all_nodes = (
        raw.select(F.explode(F.array("u", "v")).alias("node"))
        .where(F.col("node").isNotNull()).distinct()
    )
    e = raw.where(
        F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v"))
    )
    # symmetric closure once up front; stars keep orientation afterwards
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    e = e.localCheckpoint(eager=True)

    prev = (-1, 0)
    for _ in range(max_iter):
        # -- large star: for each u, link every neighbor v > u to
        #    m = min(neighborhood ∪ {u})
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u").agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m"))
        )
        e = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # -- small star: orient edges high→low, link every low neighbor
        #    (and u itself) to the min
        lo = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins = lo.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            lo.join(mins, "u")
            .select(F.col("v").alias("n"), F.col("m"))
            .union(mins.select(F.col("u").alias("n"), F.col("m")))
            .where(F.col("n") != F.col("m"))
            .select(F.col("n").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        e = e.localCheckpoint(eager=True)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur

    # after convergence every edge is (node → component-min); nodes that
    # only appeared in self-loops / singleton inputs map to themselves
    comp = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return (
        all_nodes.join(comp, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


def canonical_mapping(entities: DataFrame, same_as: DataFrame,
                      id_col: str = "entity_id") -> DataFrame:
    """entity_id → canonical_id for ALL entities (isolated → self).

    ``same_as`` must have columns (src, dst); only pairs where both
    endpoints exist in ``entities`` fire — mirrors
    ``semantics.canonical_map``.
    """
    ids = entities.select(F.col(id_col)).distinct()
    live = (
        same_as.join(ids.withColumnRenamed(id_col, "src"), "src", "left_semi")
        .join(ids.withColumnRenamed(id_col, "dst"), "dst", "left_semi")
    )
    comp = connected_components(live, "src", "dst")
    return (
        ids.join(comp, ids[id_col] == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("canonical_id"),
        )
    )
