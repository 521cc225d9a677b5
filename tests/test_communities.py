"""Tests for G2-G6 community detection (SURVEY §2.6).

Deterministic micro-graph: two 3-cliques joined by a single bridge
edge. Weighted LPA (score>1 rule, max-community tie-break —
community_operations.py:77-122) must keep the cliques in separate
communities because the bridge contributes weight 1 which fails the
score>1 move rule.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark.operators import communities as comm


def _edges(spark):
    # clique A: a1-a2, a2-a3, a1-a3 (doubled → weight 2 per pair)
    # clique B: b1-b2, b2-b3, b1-b3 (doubled)
    # bridge: a1-b1 (once → weight 1)
    rows = []
    for s, t in [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
                 ("b1", "b2"), ("b2", "b3"), ("b1", "b3")]:
        rows += [("g", s, t), ("g", s, t)]
    rows.append(("g", "a1", "b1"))
    return spark.createDataFrame(
        rows, "group_id string, source_node_uuid string, target_node_uuid string"
    )


def test_projection_weights(spark):
    proj = comm.community_projection(_edges(spark)).toPandas()
    w = {(r.a, r.b): r.weight for r in proj.itertuples()}
    assert w[("a1", "a2")] == 2
    assert w[("a1", "b1")] == 1


def test_label_propagation_separates_cliques(spark):
    labels = comm.label_propagation(comm.community_projection(_edges(spark))).toPandas()
    by_node = labels.set_index("node")["community"]
    assert len(set(by_node[["a1", "a2", "a3"]])) == 1
    assert len(set(by_node[["b1", "b2", "b3"]])) == 1
    # the weight-1 bridge cannot move a node (score > 1 rule)
    assert by_node["a1"] != by_node["b1"]


def test_build_communities_tables(spark):
    edges = _edges(spark)
    nodes = spark.createDataFrame(
        [("g", n, n.upper()) for n in ["a1", "a2", "a3", "b1", "b2", "b3"]],
        "group_id string, uuid string, name string",
    )
    communities, membership = comm.build_communities(edges, nodes, "2025-06-01 00:00:00")
    cpdf = communities.toPandas()
    mpdf = membership.toPandas()
    assert len(cpdf) == 2
    assert len(mpdf) == 6
    # summary is the sorted member-name join; name = first member + ' & co'
    row = cpdf.sort_values("summary").iloc[0]
    assert row["summary"] == "A1; A2; A3"
    assert row["name"] == "A1 & co"


def test_determine_entity_community(spark):
    edges = _edges(spark)
    nodes = spark.createDataFrame(
        [("g", n, n.upper()) for n in ["a1", "a2", "a3", "b1", "b2", "b3"]],
        "group_id string, uuid string, name string",
    )
    communities, membership = comm.build_communities(edges, nodes, "2025-06-01 00:00:00")
    # existing member → its own community
    got = comm.determine_entity_community("a2", membership, edges).toPandas()
    expected = membership.filter(F.col("target_node_uuid") == "a2").toPandas()
    assert got.iloc[0, 0] == expected.iloc[0]["source_node_uuid"]
    # new node adjacent to clique B → mode of neighbor communities
    edges2 = edges.union(
        spark.createDataFrame(
            [("g", "x9", "b1"), ("g", "x9", "b2")],
            "group_id string, source_node_uuid string, target_node_uuid string",
        )
    )
    got2 = comm.determine_entity_community("x9", membership, edges2).toPandas()
    b_comm = membership.filter(F.col("target_node_uuid") == "b1").toPandas().iloc[0]["source_node_uuid"]
    assert got2.iloc[0, 0] == b_comm
