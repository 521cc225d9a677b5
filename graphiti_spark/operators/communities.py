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


def update_communities(
    communities: DataFrame,
    membership: DataFrame,
    edges: DataFrame,
    new_nodes: DataFrame,
    run_ts: str,
) -> tuple[DataFrame, DataFrame]:
    """Incremental G6: `update_community` on ingest
    (community_operations.py:287-311) — no full rebuild.

    For every node in `new_nodes(uuid, name, summary, group_id)` not
    already a member, join the plurality community among its RELATES_TO
    neighbors (ties broken by larger community uuid, matching the LPA
    tie rule); nodes with no communal neighbor are left alone (the
    reference returns ([], []) in that case). Touched communities get
    the deterministic pairwise-summarize update (summarize_pair analog:
    new members' summaries folded in sorted order ahead of the old
    summary, 250-char truncate) and a regenerated '<first> & co' name.

    All set-at-once dataflow: one neighbor join + one window argmax +
    one membership union + one community-row merge — the batch analog
    of the reference's per-entity loop."""
    mem = membership.select(
        F.col("target_node_uuid").alias("entity_uuid"),
        F.col("source_node_uuid").alias("community_uuid"),
    )
    cand = new_nodes.select("uuid", "name", "summary", "group_id").join(
        mem.select(F.col("entity_uuid").alias("uuid")).distinct(), "uuid", "left_anti"
    )
    und = edges.select(
        F.col("source_node_uuid").alias("node"), F.col("target_node_uuid").alias("nbr")
    ).union(
        edges.select(
            F.col("target_node_uuid").alias("node"), F.col("source_node_uuid").alias("nbr")
        )
    )
    votes = (
        cand.join(und, cand.uuid == und.node)
        .join(mem, und.nbr == mem.entity_uuid)
        .groupBy("uuid", "name", "summary", "group_id", "community_uuid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("uuid").orderBy(F.desc("n"), F.desc("community_uuid"))
    winners = (
        votes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn", "n")
    )
    new_membership = winners.select(
        ids._md5_concat(
            F.lit("cmm"), F.col("group_id"), F.col("community_uuid"), F.col("uuid")
        ).alias("uuid"),
        F.col("community_uuid").alias("source_node_uuid"),
        F.col("uuid").alias("target_node_uuid"),
        "group_id",
        F.lit(run_ts).cast("timestamp").alias("created_at"),
    )
    joined = winners.groupBy("community_uuid").agg(
        F.concat_ws("; ", F.sort_array(F.collect_set(F.coalesce("summary", "name")))).alias(
            "new_member_summary"
        )
    )
    updated = (
        communities.join(
            joined.withColumnRenamed("community_uuid", "uuid"), "uuid", "left"
        )
        .withColumn(
            "summary",
            F.when(
                F.col("new_member_summary").isNotNull(),
                F.substring(
                    F.concat_ws("; ", "new_member_summary", "summary"), 1, 250
                ),
            ).otherwise(F.col("summary")),
        )
        .withColumn(
            "name",
            F.when(
                F.col("new_member_summary").isNotNull(),
                F.concat(F.split_part(F.col("summary"), F.lit("; "), F.lit(1)), F.lit(" & co")),
            ).otherwise(F.col("name")),
        )
        .drop("new_member_summary")
    )
    return updated, membership.unionByName(new_membership)


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
