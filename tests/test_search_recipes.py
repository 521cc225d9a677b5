"""Tests for the top-level search() orchestration (SURVEY §2.11)."""

from __future__ import annotations

import pytest

from graphiti_spark import transcripts as tr
from graphiti_spark.operators import search_recipes as sr
from graphiti_spark.plans import pipeline as pl


@pytest.fixture(scope="module")
def tables(spark):
    t = tr.synthesize_transcripts(spark, n_convs=8, turns_per_conv=10)
    tabs = pl.build_graph(t, with_embeddings=True)
    return {k: v.localCheckpoint() for k, v in tabs.items()}


def test_combined_hybrid_rrf(spark, tables):
    out = sr.search(tables, "Alice works at Acme")
    edges = out["edges"].toPandas()
    nodes = out["nodes"].toPandas()
    eps = out["episodes"].toPandas()
    assert 0 < len(edges) <= sr.DEFAULT_SEARCH_LIMIT
    assert 0 < len(nodes) <= sr.DEFAULT_SEARCH_LIMIT
    assert 0 < len(eps) <= sr.DEFAULT_SEARCH_LIMIT
    # top edge should be a works-at fact mentioning Alice or Acme
    top = tables["edges"].toPandas().set_index("uuid").loc[edges.iloc[0]["uuid"]]
    assert ("Alice" in top["fact"]) or ("Acme" in top["fact"])


def test_recipe_selection_and_limits(spark, tables):
    out = sr.search(tables, "likes", config="edge_hybrid_rrf", limit=3)
    assert set(out) == {"edges"}
    assert len(out["edges"].toPandas()) <= 3


def test_center_node_switches_to_node_distance(spark, tables):
    nodes = tables["nodes"].toPandas()
    center = nodes.sort_values("uuid").iloc[0]["uuid"]
    out = sr.search(tables, "works at", center_node_uuid=center)
    edges = out["edges"].toPandas()
    if len(edges) == 0:
        pytest.skip("no candidates near this center")
    # node_distance scores are ascending {0.1, 1.0, 1e9}
    assert set(edges["score"]).issubset({0.1, 1.0, 1e9})
    assert list(edges["score"]) == sorted(edges["score"])


def test_mmr_recipe(spark, tables):
    out = sr.search(tables, "Alice", config="node_hybrid_mmr", limit=5)
    pdf = out["nodes"].toPandas()
    assert 0 < len(pdf) <= 5


@pytest.fixture(scope="module")
def tables_with_communities(spark, tables):
    from graphiti_spark.functions import embeddings as embf
    from graphiti_spark.operators import communities as comm
    from graphiti_spark.plans import pipeline as pl

    communities, _ = comm.build_communities(
        tables["edges"], tables["nodes"], pl.RUN_TS
    )
    full = dict(tables)
    full["communities"] = embf.attach_embedding(
        communities, "name", "name_embedding"
    ).localCheckpoint()
    return full


def test_all_canned_recipes(spark, tables_with_communities):
    """Every named config of search_config_recipes.py:34-223 (16
    constants: 3 COMBINED, 5 EDGE, 5 NODE, 3 COMMUNITY) returns
    non-empty results for each of its configured objects within the
    limit. One unioned action keeps the suite fast; ranking ORDER per
    reranker is asserted separately below."""
    from pyspark.sql import functions as F

    tables = tables_with_communities
    center = tables["nodes"].orderBy("uuid").limit(1).collect()[0]["uuid"]
    assert len(sr.RECIPES) == 16  # 3 COMBINED + 5 EDGE + 5 NODE + 3 COMMUNITY
    parts = []
    expected = set()
    for recipe, cfg in sr.RECIPES.items():
        needs_center = "node_distance" in recipe
        out = sr.search(
            tables,
            "Alice works at Acme",
            config=recipe,
            center_node_uuid=center if needs_center else None,
            limit=5,
        )
        objs = {
            name
            for name, ocfg in [
                ("edges", cfg.edge), ("nodes", cfg.node),
                ("episodes", cfg.episode), ("communities", cfg.community),
            ]
            if ocfg is not None
        }
        assert set(out) == objs, recipe
        for name, df in out.items():
            expected.add((recipe, name))
            parts.append(
                df.select(
                    F.lit(recipe).alias("recipe"), F.lit(name).alias("object"),
                    "uuid", "score",
                )
            )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    pdf = u.toPandas()
    sizes = pdf.groupby(["recipe", "object"]).size()
    assert set(sizes.index) == expected  # every (recipe, object) non-empty
    assert (sizes <= 5).all()


def test_reranker_orderings(spark, tables_with_communities):
    """Ranking direction per reranker: descending for rrf / mmr /
    cross_encoder / episode_mentions(edges: provenance size), ascending
    for node_distance (closer = smaller)."""
    tables = tables_with_communities
    center = tables["nodes"].orderBy("uuid").limit(1).collect()[0]["uuid"]
    cases = [
        ("edge_hybrid_search_rrf", "edges", False),
        ("node_hybrid_search_mmr", "nodes", False),
        ("community_hybrid_search_cross_encoder", "communities", False),
        ("edge_hybrid_search_episode_mentions", "edges", False),
        ("node_hybrid_search_node_distance", "nodes", True),
    ]
    for recipe, obj, ascending in cases:
        out = sr.search(
            tables, "Alice works at Acme", config=recipe,
            center_node_uuid=center if "node_distance" in recipe else None,
            limit=5,
        )
        scores = list(out[obj].toPandas()["score"])
        assert len(scores) > 0, recipe
        want = sorted(scores) if ascending else sorted(scores, reverse=True)
        assert scores == want, f"{recipe}/{obj}"


def test_node_distance_without_center_raises(spark, tables):
    with pytest.raises(ValueError):
        sr.search(tables, "Alice", config="node_hybrid_search_node_distance")


def test_bfs_seeds_from_other_methods_without_center(spark, tables):
    """r3 advice: with no center node, bfs origins derive from the
    bm25/cosine results (reference search.py:205-215, 313-322) instead
    of silently skipping bfs — and for EDGE search the bfs method
    contributes EDGE uuids (edges on BFS paths, search_utils.py:252-296),
    never node uuids."""
    out = sr.search(
        tables, "Alice works at Acme",
        config="edge_hybrid_search_cross_encoder", limit=10,
    )
    edges = out["edges"].toPandas()
    assert len(edges) > 0
    edge_uuids = set(tables["edges"].toPandas()["uuid"])
    assert set(edges["uuid"]) <= edge_uuids  # no phantom node uuids
    # node variant: candidates stay node uuids
    out_n = sr.search(
        tables, "Alice works at Acme",
        config="node_hybrid_search_cross_encoder", limit=10,
    )
    node_uuids = set(tables["nodes"].toPandas()["uuid"])
    assert set(out_n["nodes"].toPandas()["uuid"]) <= node_uuids


def test_collect_results_concurrent_matches_sequential(spark, tables):
    """VERDICT r3 #6: thread-pooled sub-search materialization returns
    the same rows as sequential collection."""
    out = sr.search(tables, "Alice works at Acme", limit=5)
    seq = {k: sorted((r["uuid"], round(r["score"], 9)) for r in df.collect())
           for k, df in out.items()}
    conc_raw = sr.collect_results(out)
    conc = {k: sorted((r["uuid"], round(r["score"], 9)) for r in rows)
            for k, rows in conc_raw.items()}
    assert seq == conc


def test_episode_mentions_without_mentions_raises(spark, tables):
    stripped = {k: v for k, v in tables.items() if k != "mentions"}
    with pytest.raises(ValueError):
        sr.search(
            stripped, "Alice", config="node_hybrid_search_episode_mentions"
        )
