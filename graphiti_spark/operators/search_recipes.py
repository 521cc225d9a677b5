"""Top-level search orchestration (SURVEY §2.11).

Mirrors search/search.py:66-162: one query fans out per-object
sub-searches (edges / nodes / episodes / communities), each sub-search
fans out its methods (bm25 | cosine_similarity | bfs) at 2×limit,
uuid-dedups, reranks (rrf | mmr | cross_encoder | node_distance |
episode_mentions), and truncates to limit. The canned configs mirror
search/search_config_recipes.py:34-223; the default top-level recipe is
edge+node hybrid RRF, switching to node_distance when a center node is
given (graphiti.py:907-910).

Everything is DataFrame composition over the materialized graph tables
— the sub-searches are independent plans, so Spark schedules their
stages concurrently within one action (the reference's asyncio gather
becomes free DAG parallelism).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions import embeddings as embf
from graphiti_spark.operators import search as srch

DEFAULT_SEARCH_LIMIT = srch.DEFAULT_SEARCH_LIMIT


@dataclass(frozen=True)
class ObjectConfig:
    """One sub-search: which methods fan out and which reranker fuses."""

    methods: tuple[str, ...] = ("bm25", "cosine")  # bm25 | cosine | bfs
    reranker: str = "rrf"  # rrf | mmr | cross_encoder | node_distance | episode_mentions
    text_col: str = "fact"
    emb_col: str = "fact_embedding"


@dataclass(frozen=True)
class SearchConfig:
    edge: ObjectConfig | None = field(
        default_factory=lambda: ObjectConfig(text_col="fact", emb_col="fact_embedding")
    )
    node: ObjectConfig | None = field(
        default_factory=lambda: ObjectConfig(text_col="name", emb_col="name_embedding")
    )
    episode: ObjectConfig | None = field(
        default_factory=lambda: ObjectConfig(methods=("bm25",), text_col="content")
    )
    community: ObjectConfig | None = None
    limit: int = DEFAULT_SEARCH_LIMIT


def _edge(methods: tuple[str, ...] = ("bm25", "cosine"), reranker: str = "rrf") -> ObjectConfig:
    return ObjectConfig(methods, reranker, "fact", "fact_embedding")


def _node(methods: tuple[str, ...] = ("bm25", "cosine"), reranker: str = "rrf") -> ObjectConfig:
    return ObjectConfig(methods, reranker, "name", "name_embedding")


def _episode(reranker: str = "rrf") -> ObjectConfig:
    return ObjectConfig(("bm25",), reranker, "content", "no_embedding")


def _community(reranker: str = "rrf") -> ObjectConfig:
    return ObjectConfig(("bm25", "cosine"), reranker, "name", "name_embedding")


# The full canned-recipe surface of search_config_recipes.py:34-223,
# keyed by the reference constant names (lowercased): 3 COMBINED_*, 5
# EDGE_*, 5 NODE_*, 3 COMMUNITY_* configs. Method/reranker matrices
# mirror the reference line-for-line (e.g. only the cross-encoder
# variants add the bfs method; COMMUNITY_..._CROSS_ENCODER caps at 3).
RECIPES: dict[str, SearchConfig] = {
    "combined_hybrid_search_rrf": SearchConfig(
        edge=_edge(), node=_node(), episode=_episode(), community=_community()
    ),
    "combined_hybrid_search_mmr": SearchConfig(
        edge=_edge(reranker="mmr"),
        node=_node(reranker="mmr"),
        episode=_episode(),
        community=_community(reranker="mmr"),
    ),
    "combined_hybrid_search_cross_encoder": SearchConfig(
        edge=_edge(("bm25", "cosine", "bfs"), "cross_encoder"),
        node=_node(("bm25", "cosine", "bfs"), "cross_encoder"),
        episode=_episode("cross_encoder"),
        community=_community("cross_encoder"),
    ),
    "edge_hybrid_search_rrf": SearchConfig(edge=_edge(), node=None, episode=None),
    "edge_hybrid_search_mmr": SearchConfig(
        edge=_edge(reranker="mmr"), node=None, episode=None
    ),
    "edge_hybrid_search_node_distance": SearchConfig(
        edge=_edge(reranker="node_distance"), node=None, episode=None
    ),
    "edge_hybrid_search_episode_mentions": SearchConfig(
        edge=_edge(reranker="episode_mentions"), node=None, episode=None
    ),
    "edge_hybrid_search_cross_encoder": SearchConfig(
        edge=_edge(("bm25", "cosine", "bfs"), "cross_encoder"), node=None, episode=None
    ),
    "node_hybrid_search_rrf": SearchConfig(edge=None, node=_node(), episode=None),
    "node_hybrid_search_mmr": SearchConfig(
        edge=None, node=_node(reranker="mmr"), episode=None
    ),
    "node_hybrid_search_node_distance": SearchConfig(
        edge=None, node=_node(reranker="node_distance"), episode=None
    ),
    "node_hybrid_search_episode_mentions": SearchConfig(
        edge=None, node=_node(reranker="episode_mentions"), episode=None
    ),
    "node_hybrid_search_cross_encoder": SearchConfig(
        edge=None, node=_node(("bm25", "cosine", "bfs"), "cross_encoder"), episode=None
    ),
    "community_hybrid_search_rrf": SearchConfig(
        edge=None, node=None, episode=None, community=_community()
    ),
    "community_hybrid_search_mmr": SearchConfig(
        edge=None, node=None, episode=None, community=_community(reranker="mmr")
    ),
    "community_hybrid_search_cross_encoder": SearchConfig(
        edge=None, node=None, episode=None, community=_community("cross_encoder"), limit=3
    ),
}

# round-2 short names kept as aliases
_ALIASES = {
    "combined_hybrid_rrf": "combined_hybrid_search_rrf",
    "combined_hybrid_mmr": "combined_hybrid_search_mmr",
    "edge_hybrid_rrf": "edge_hybrid_search_rrf",
    "node_hybrid_rrf": "node_hybrid_search_rrf",
    "edge_hybrid_cross_encoder": "edge_hybrid_search_cross_encoder",
    "node_hybrid_mmr": "node_hybrid_search_mmr",
}


def resolve_recipe(name: str) -> SearchConfig:
    return RECIPES[_ALIASES.get(name, name)]


def _one_object(
    df: DataFrame,
    cfg: ObjectConfig,
    query: str,
    query_vec: list[float],
    limit: int,
    group_ids: list[str] | None,
    center_node_uuid: str | None,
    edges_for_rerank: DataFrame | None,
    mentions_for_rerank: DataFrame | None,
    object_name: str = "",
) -> DataFrame:
    fanout = 2 * limit  # candidate budget per method (search.py:183-201)
    parts: list[DataFrame] = []
    if "bm25" in cfg.methods:
        parts.append(
            srch.bm25_search(df, cfg.text_col, query, limit=fanout, group_ids=group_ids)
        )
    if "cosine" in cfg.methods and cfg.emb_col in df.columns:
        parts.append(
            srch.cosine_search(
                df, cfg.emb_col, query_vec, limit=fanout, min_score=0.0, group_ids=group_ids
            )
        )
    if "bfs" in cfg.methods and edges_for_rerank is not None:
        # origin seeding mirrors search.py:205-215 (edges) / 313-322
        # (nodes): with no explicit center, bfs seeds from the OTHER
        # methods' results — edge candidates' source nodes, or the
        # candidate node uuids themselves. Without center AND without
        # prior methods the reference's bfs returns [] (origins None).
        reach = None
        if center_node_uuid:
            reach = srch.bfs_neighborhood(edges_for_rerank, [center_node_uuid])
        elif parts:
            cand = parts[0]
            for p in parts[1:]:
                cand = cand.unionByName(p)
            if object_name == "edges":
                origins = (
                    cand.select("uuid")
                    .join(df.select("uuid", "source_node_uuid"), "uuid")
                    .select(F.col("source_node_uuid").alias("uuid"))
                )
            else:
                origins = cand.select("uuid")
            # checkpoint the seed set once — bfs_neighborhood's per-depth
            # frontier joins would otherwise recompute the bm25+cosine
            # sub-plans at every level
            reach = srch.bfs_neighborhood(
                edges_for_rerank, origins.distinct().localCheckpoint()
            )
        if reach is not None and object_name == "edges":
            # edge_bfs_search returns the EDGES on BFS paths
            # (search_utils.py:252-296): an edge is on a path when its
            # near endpoint is reached before max depth; rank by that
            # endpoint's distance
            parts.append(
                reach.withColumnRenamed("uuid", "source_node_uuid")
                .join(df.select("uuid", "source_node_uuid"), "source_node_uuid")
                .groupBy("uuid")
                .agg((1.0 / (1.0 + F.min("depth"))).alias("score"))
            )
        elif reach is not None:
            # node_bfs_search returns reached nodes (search_utils.py:396-436)
            parts.append(
                reach.filter(F.col("depth") > 0).select(
                    "uuid", (1.0 / F.col("depth")).alias("score")
                )
            )
    if not parts:
        return df.select("uuid").limit(0).withColumn("score", F.lit(0.0))

    def candidates_df() -> DataFrame:
        # uuid-dedup keeping each candidate's best method score
        # (search.py:219) — built only inside the reranker branches that
        # consume it; the default rrf path fuses `parts` directly and
        # never needs this aggregation in its plan
        fused_in = parts[0]
        for p in parts[1:]:
            fused_in = fused_in.unionByName(p)
        return fused_in.groupBy("uuid").agg(F.max("score").alias("score"))

    rr = cfg.reranker
    if rr == "node_distance" and (not center_node_uuid or edges_for_rerank is None):
        # reference raises SearchRerankerError when node_distance is
        # requested without a center node (search/search.py:326-330)
        raise ValueError("node_distance reranker requires center_node_uuid")
    if rr == "node_distance":
        candidates = candidates_df()
        if object_name == "edges":
            # edges rank by their SOURCE node's distance to the center
            # (search.py:264-270): edge uuid → source node → distance
            src_map = df.select("uuid", F.col("source_node_uuid").alias("nuuid"))
            node_scores = srch.node_distance_rerank(
                candidates.join(src_map, "uuid").select(F.col("nuuid").alias("uuid")).distinct(),
                edges_for_rerank,
                center_node_uuid,
                far_score=1e9,
            ).withColumnRenamed("uuid", "nuuid")
            return (
                candidates.join(src_map, "uuid")
                .join(node_scores, "nuuid")
                .select("uuid", node_scores["score"].alias("score"))
                .orderBy(F.asc("score"), F.asc("uuid"))
                .limit(limit)
            )
        out = srch.node_distance_rerank(
            candidates, edges_for_rerank, center_node_uuid, far_score=1e9
        )
        return out.limit(limit)
    if rr == "episode_mentions":
        if object_name == "edges":
            # the reference's episode_mentions reranker for EDGES sorts
            # by provenance size len(edge.episodes) (search.py:271-272)
            with_prov = candidates_df().select("uuid").join(
                df.select("uuid", "episodes"), "uuid"
            )
            return srch.edge_provenance_rerank(with_prov, limit=limit).select("uuid", "score")
        if mentions_for_rerank is None:
            # consistent with node_distance: a missing prerequisite
            # raises instead of silently degrading to RRF (r3 advice)
            raise ValueError(
                "episode_mentions reranker requires a mentions table"
            )
        return srch.episode_mentions_rerank(
            candidates_df().select("uuid"), mentions_for_rerank
        ).limit(limit)
    if rr == "mmr":
        with_vec = candidates_df().join(df.select("uuid", cfg.emb_col), "uuid")
        return srch.mmr_rerank(with_vec, cfg.emb_col, query_vec).limit(limit)
    if rr == "cross_encoder":
        with_text = candidates_df().select("uuid").join(df.select("uuid", cfg.text_col), "uuid")
        return srch.cross_encoder_rank(with_text, cfg.text_col, query, limit=limit)
    # default: RRF over the per-method ranked lists (search.py:219-274)
    return srch.rrf(parts).limit(limit)


def search(
    tables: dict[str, DataFrame],
    query: str,
    config: str | SearchConfig = "combined_hybrid_rrf",
    group_ids: list[str] | None = None,
    center_node_uuid: str | None = None,
    query_vec: list[float] | None = None,
    limit: int | None = None,
) -> dict[str, DataFrame]:
    """graphiti.search_ analog over materialized tables
    {edges, nodes, episodes, mentions}. Returns per-object ranked
    (uuid, score) DataFrames. When a center node is given the edge
    reranker switches to node_distance (graphiti.py:907-910)."""
    cfg = resolve_recipe(config) if isinstance(config, str) else config
    limit = limit or cfg.limit
    if query_vec is None:
        query_vec = [float(x) for x in embf.embed_texts_np(
            __import__("pandas").Series([query.replace("\n", " ")])
        )[0]]

    edges = tables.get("edges")
    mentions = tables.get("mentions")
    out: dict[str, DataFrame] = {}
    plan = [
        ("edges", cfg.edge, edges),
        ("nodes", cfg.node, tables.get("nodes")),
        ("episodes", cfg.episode, tables.get("episodes")),
        ("communities", cfg.community, tables.get("communities")),
    ]
    for name, ocfg, df in plan:
        if ocfg is None or df is None:
            continue
        eff = ocfg
        if name == "edges" and center_node_uuid:
            eff = ObjectConfig(
                methods=ocfg.methods, reranker="node_distance",
                text_col=ocfg.text_col, emb_col=ocfg.emb_col,
            )
        out[name] = _one_object(
            df, eff, query, query_vec, limit, group_ids,
            center_node_uuid, edges, mentions, object_name=name,
        )
    return out


def collect_results(
    results: dict[str, DataFrame], action=None
) -> dict[str, list]:
    """Materialize the per-object sub-search results CONCURRENTLY.

    The reference runs the four object sub-searches under one
    semaphore_gather (search/search.py:92-145); submitting each
    DataFrame's action from its own thread gives the Spark scheduler
    all sub-search jobs at once, overlapping one job's driver phase
    (planning/scheduling) with another's executor work — the same
    treatment pipeline.force_outputs gives the output sinks. Results
    are identical to sequential collection (each plan is independent);
    only the wall clock changes."""
    from concurrent.futures import ThreadPoolExecutor

    action = action or (lambda df: df.collect())
    if not results:
        return {}
    with ThreadPoolExecutor(max_workers=len(results)) as pool:
        futs = {name: pool.submit(action, df) for name, df in results.items()}
        return {name: f.result() for name, f in futs.items()}
