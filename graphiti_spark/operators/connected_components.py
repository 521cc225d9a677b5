"""Iterative connected components (SURVEY §2.6 G1).

Deterministic analog of the reference's driver-side UnionFind +
compress_uuid_map (utils/bulk_utils.py:377-414): connected components
over duplicate pairs, canonical = lexicographically smallest uuid in
the component (bulk_utils.py:392-396 — string min matches exactly).

Distributed as iterative min-label propagation (the GraphFrames
connectedComponents recipe): label(v) ← min(label(v), min label of
neighbors) until fixpoint. Convergence is monotone; iterations ≈ graph
diameter. Dedupe components are alias clusters (diameter ≤ ~3), so
this loop is short; `localCheckpoint()` every iteration truncates
lineage so plans don't grow. For pathological long-chain graphs swap
in the large-star/small-star variant (O(log n) rounds) — not needed
for alias clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Below this many duplicate pairs the component graph fits comfortably on
# the driver and a single union-find pass beats the iterative join loop's
# per-round job overhead (the reference is always driver-side:
# bulk_utils.py:377-414). Above it, the distributed min-label loop runs.
DRIVER_CC_MAX_PAIRS = 2_000_000


def _driver_union_find(pairs_rows) -> list[tuple[str, str]]:
    """Union-find with path compression; canonical = lexicographic min."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs_rows:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by canonical-min so the root IS the component id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(n, find(n)) for n in parent]


def connected_components(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    driver_max_pairs: int = DRIVER_CC_MAX_PAIRS,
) -> DataFrame:
    """pairs(src, dst) undirected → (node, component) with component =
    lexicographically smallest node id in the component.

    Auto strategy: small pair sets collect to the driver for one exact
    union-find pass; large ones run the iterative min-label loop."""
    spark = pairs.sparkSession
    # single action: fetch up to the driver cap + 1; only past the cap do
    # we pay for the distributed loop (which recomputes pairs once more)
    probe = pairs.select(src, dst).distinct().limit(driver_max_pairs + 1).collect()
    if len(probe) <= driver_max_pairs:
        out = _driver_union_find([(r[0], r[1]) for r in probe])
        if not out:
            return spark.createDataFrame([], "node string, component string")
        return spark.createDataFrame(out, "node string, component string")
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.a, "left")
            .select(
                "node",
                F.least(F.col("component"), F.col("nbr_component")).alias("component"),
                F.col("component").alias("old"),
            )
        )
        changed = new_labels.filter(F.col("component") != F.col("old")).limit(1).count()
        labels = new_labels.drop("old").localCheckpoint()
        if changed == 0:
            break
    return labels


def uuid_map_from_pairs(pairs: DataFrame, group_col: str = "group_id") -> DataFrame:
    """duplicate pairs(src, dst, group_id) → uuid_map(raw_uuid,
    canonical_uuid, group_id). Nodes not in any pair are absent (callers
    coalesce to identity, mirroring compress_uuid_map which only maps
    touched uuids)."""
    comps = connected_components(pairs)
    groups = (
        pairs.select(F.col("src").alias("node"), group_col)
        .union(pairs.select(F.col("dst").alias("node"), group_col))
        .distinct()
    )
    return comps.join(groups, "node").select(
        F.col("node").alias("raw_uuid"),
        F.col("component").alias("canonical_uuid"),
        F.col(group_col),
    )
