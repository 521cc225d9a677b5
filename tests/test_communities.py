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


def _ref_pair(left: str, right: str) -> str:
    """Plain-python mirror of communities.summarize_pair."""
    segs: list[str] = []
    for s in left.split("; ") + right.split("; "):
        if s not in segs:
            segs.append(s)
    return "; ".join(segs)[:250]


def _ref_reduce(summaries: list[str]) -> str:
    """Reference build_community halving loop (community_operations.py:
    155-176): odd-one-out popped from the END before pairing and
    appended after; first half zipped with second half."""
    summaries = list(summaries)
    length = len(summaries)
    while length > 1:
        odd = None
        if length % 2 == 1:
            odd = summaries.pop()
            length -= 1
        new = [
            _ref_pair(l, r)
            for l, r in zip(summaries[: length // 2], summaries[length // 2 :])
        ]
        if odd is not None:
            new.append(odd)
        summaries = new
        length = len(summaries)
    return summaries[0]


def test_hierarchical_summarize_matches_reference_tree(spark):
    """The Spark halving reduce must produce the exact string the
    reference's pair-tree produces for every community size — the tree
    ORDER is visible in the segment order (a flat sorted concat would
    give S0; S1; S2... instead)."""
    sizes = [1, 2, 3, 5, 7, 8]
    rows = [
        ("g", f"c{size}", i, f"S{size}_{i}") for size in sizes for i in range(size)
    ]
    members = spark.createDataFrame(
        rows, "group_id string, community string, idx int, summary string"
    )
    got = {
        r.community: r.summary
        for r in comm.hierarchical_summarize(members).collect()
    }
    for size in sizes:
        expected = _ref_reduce([f"S{size}_{i}" for i in range(size)])
        assert got[f"c{size}"] == expected, f"size {size}"
    # sanity: order is tree order, not flat order, once size > 4
    assert got["c7"] == "S7_0; S7_3; S7_2; S7_5; S7_1; S7_4; S7_6"


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


def test_update_communities_incremental(spark):
    """Incremental G6 (community_operations.py:287-311): a new node
    adjacent to clique B joins B's community without a rebuild; the
    community summary folds the new member in and the name regenerates;
    an isolated new node is a no-op."""
    edges = _edges(spark)
    nodes = spark.createDataFrame(
        [("g", n, n.upper()) for n in ["a1", "a2", "a3", "b1", "b2", "b3"]],
        "group_id string, uuid string, name string",
    )
    communities, membership = comm.build_communities(edges, nodes, "2025-06-01 00:00:00")
    edges2 = edges.union(
        spark.createDataFrame(
            [("g", "x9", "b1"), ("g", "x9", "b2"), ("g", "z1", "z2")],
            "group_id string, source_node_uuid string, target_node_uuid string",
        )
    )
    new_nodes = spark.createDataFrame(
        [("x9", "X9", "X9", "g"), ("z1", "Z1", "Z1", "g")],
        "uuid string, name string, summary string, group_id string",
    )
    comms2, mem2 = comm.update_communities(
        communities, membership, edges2, new_nodes, "2025-06-02 00:00:00"
    )
    m2 = mem2.toPandas()
    b_comm = membership.filter(F.col("target_node_uuid") == "b1").toPandas().iloc[0][
        "source_node_uuid"
    ]
    added = m2[m2.target_node_uuid == "x9"]
    assert len(added) == 1 and added.iloc[0]["source_node_uuid"] == b_comm
    # z1 has no communal neighbor -> not added (reference no-op path)
    assert (m2.target_node_uuid == "z1").sum() == 0
    c2 = comms2.toPandas().set_index("uuid")
    assert c2.loc[b_comm, "summary"].startswith("X9; ")
    assert c2.loc[b_comm, "name"] == "X9 & co"
    # untouched community unchanged
    a_comm = membership.filter(F.col("target_node_uuid") == "a1").toPandas().iloc[0][
        "source_node_uuid"
    ]
    assert c2.loc[a_comm, "summary"] == "A1; A2; A3"
    # an already-member node gets no second membership edge, and
    # re-folding unchanged summaries is a no-op (segment dedupe)
    comms3, mem3 = comm.update_communities(
        comms2, mem2, edges2, nodes.select("uuid", "name", F.col("name").alias("summary"), "group_id"), "2025-06-03 00:00:00"
    )
    assert mem3.count() == mem2.count()
    c3 = comms3.toPandas().set_index("uuid")
    assert c3.loc[a_comm, "summary"] == "A1; A2; A3"
    assert c3.loc[a_comm, "name"] == "A1 & co"


def test_update_communities_refreshes_existing_member(spark):
    """Reference is_new=False path (community_operations.py:287-311):
    an entity already in a community still re-summarizes it — no new
    HAS_MEMBER edge, but the fresh summary folds in ahead of the old
    one and the name regenerates from the updated summary."""
    edges = _edges(spark)
    nodes = spark.createDataFrame(
        [("g", n, n.upper()) for n in ["a1", "a2", "a3", "b1", "b2", "b3"]],
        "group_id string, uuid string, name string",
    )
    communities, membership = comm.build_communities(edges, nodes, "2025-06-01 00:00:00")
    refreshed = spark.createDataFrame(
        [("b1", "B1", "B1 leads the guild", "g")],
        "uuid string, name string, summary string, group_id string",
    )
    comms2, mem2 = comm.update_communities(
        communities, membership, edges, refreshed, "2025-06-02 00:00:00"
    )
    assert mem2.count() == membership.count()
    b_comm = membership.filter(F.col("target_node_uuid") == "b1").toPandas().iloc[0][
        "source_node_uuid"
    ]
    c2 = comms2.toPandas().set_index("uuid")
    assert c2.loc[b_comm, "summary"].startswith("B1 leads the guild; ")
    assert c2.loc[b_comm, "name"] == "B1 leads the guild & co"


def test_lpa_oscillation_converges_via_async_fallback():
    """r3 advice: a single pair with weight ≥ 2 makes the synchronous
    adoption rule swap labels forever (a 2-cycle); the async fallback
    must detect the cap and settle both nodes into one community
    instead of silently returning an unconverged labeling."""
    from graphiti_spark.operators.communities import _lpa_py

    out = dict(_lpa_py([("a", "b", 2)], max_iter=10))
    assert set(out) == {"a", "b"}
    assert out["a"] == out["b"]  # one community, converged
