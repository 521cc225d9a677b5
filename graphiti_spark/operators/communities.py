"""Community detection & summarization (SURVEY §2.6 G2-G6).

Reference: weighted label propagation over the entity co-occurrence
projection (community_operations.py:28-122) — every node starts as its
own community; each iteration a node adopts the neighbor community
with the highest summed edge weight, ties broken by the LARGER
community id (`max`, community_operations.py:101-105), and only moves
when the winning score > 1; iterate to fixpoint. Then a hierarchical
pairwise summary reduce (community_operations.py:151-190) names each
community — here a deterministic concatenate-truncate summarizer
(LLM pluggable per §7.0).

Spark shape: the projection is one groupBy count; each LPA round is
join → groupBy(node, community) sum(weight) → window argmax → update.
localCheckpoint per round cuts lineage (same pattern as G1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark import ids


def community_projection(edges: DataFrame) -> DataFrame:
    """G3: weighted undirected adjacency — count(r) per neighbor pair
    within group (community_operations.py:48-62)."""
    pairs = edges.select(
        "group_id",
        F.least("source_node_uuid", "target_node_uuid").alias("a"),
        F.greatest("source_node_uuid", "target_node_uuid").alias("b"),
    ).filter(F.col("a") != F.col("b"))
    return pairs.groupBy("group_id", "a", "b").agg(F.count(F.lit(1)).alias("weight"))


def label_propagation(projection: DataFrame, max_iter: int = 20) -> DataFrame:
    """G2 → (group_id, node, community)."""
    adj = (
        projection.select("group_id", F.col("a").alias("node"), F.col("b").alias("nbr"), "weight")
        .union(
            projection.select("group_id", F.col("b").alias("node"), F.col("a").alias("nbr"), "weight")
        )
        .localCheckpoint()
    )
    labels = (
        adj.select("group_id", "node").distinct().withColumn("community", F.col("node")).localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_labels = adj.join(
            labels.select(F.col("node").alias("nbr"), F.col("community").alias("nbr_comm")),
            "nbr",
        )
        votes = nbr_labels.groupBy("group_id", "node", "nbr_comm").agg(
            F.sum("weight").alias("score")
        )
        w = Window.partitionBy("node").orderBy(F.desc("score"), F.desc("nbr_comm"))
        winner = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("score") > 1))  # score>1 rule (:101-105)
            .select("node", F.col("nbr_comm").alias("new_comm"))
        )
        updated = labels.join(winner, "node", "left").select(
            "group_id",
            "node",
            F.coalesce("new_comm", "community").alias("community"),
            F.col("community").alias("old"),
        )
        changed = updated.filter(F.col("community") != F.col("old")).limit(1).count()
        labels = updated.drop("old").localCheckpoint()
        if changed == 0:
            break
    return labels


def build_communities(
    edges: DataFrame, nodes: DataFrame, run_ts: str
) -> tuple[DataFrame, DataFrame]:
    """G4/G6: full rebuild → (communities, community_membership) tables.

    Community summary = names of members joined '; ' (sorted, truncated
    250 chars — deterministic reduce analog of the hierarchical pairwise
    LLM summarize, community_operations.py:151-190); community name =
    first member name + ' & co' when multiple."""
    labels = label_propagation(community_projection(edges))
    members = labels.join(
        nodes.select(F.col("uuid").alias("node"), F.col("name").alias("member_name")), "node"
    )
    agg = members.groupBy("group_id", "community").agg(
        F.sort_array(F.collect_set("member_name")).alias("member_names"),
        F.sort_array(F.collect_set("node")).alias("member_uuids"),
    )
    communities = agg.select(
        ids.community_uuid(F.col("group_id"), F.col("community")).alias("uuid"),
        F.when(F.size("member_names") > 1, F.concat(F.element_at("member_names", 1), F.lit(" & co")))
        .otherwise(F.element_at("member_names", 1))
        .alias("name"),
        "group_id",
        F.substring(F.concat_ws("; ", "member_names"), 1, 250).alias("summary"),
        F.lit(run_ts).cast("timestamp").alias("created_at"),
        "member_uuids",
    )
    membership = communities.select(
        F.col("uuid").alias("community_uuid"),
        "group_id",
        "created_at",
        F.explode("member_uuids").alias("entity_uuid"),
    ).select(
        ids._md5_concat(F.lit("cmm"), F.col("group_id"), F.col("community_uuid"), F.col("entity_uuid")).alias("uuid"),
        F.col("community_uuid").alias("source_node_uuid"),
        F.col("entity_uuid").alias("target_node_uuid"),
        "group_id",
        "created_at",
    )
    return communities.drop("member_uuids"), membership


def determine_entity_community(
    node_uuid: str, membership: DataFrame, edges: DataFrame
) -> DataFrame:
    """G5: existing community, else the mode of neighbors' communities
    (community_operations.py:228-284)."""
    existing = membership.filter(F.col("target_node_uuid") == node_uuid).select(
        F.col("source_node_uuid").alias("community_uuid")
    )
    nbrs = edges.filter(
        (F.col("source_node_uuid") == node_uuid) | (F.col("target_node_uuid") == node_uuid)
    ).select(
        F.when(F.col("source_node_uuid") == node_uuid, F.col("target_node_uuid"))
        .otherwise(F.col("source_node_uuid"))
        .alias("nbr")
    )
    nbr_comms = nbrs.join(
        membership.select(F.col("target_node_uuid").alias("nbr"), F.col("source_node_uuid").alias("community_uuid")),
        "nbr",
    )
    mode = (
        nbr_comms.groupBy("community_uuid")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.desc("community_uuid"))
        .limit(1)
        .select("community_uuid")
    )
    return existing.limit(1).union(mode).limit(1)
