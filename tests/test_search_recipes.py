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
