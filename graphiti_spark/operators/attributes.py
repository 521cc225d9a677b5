"""Entity attribute / summary hydration (SURVEY §2.2 E5).

Reference: `extract_attributes_from_node(s)` builds, per entity, a
summary of at most 250 words from the episodes that mention it, plus
typed attribute values (graphiti_core/utils/maintenance/
node_operations.py:293-378; prompt contract prompts/extract_nodes.py:
250-309 — "Summaries must be no longer than 250 words"). The
reference groups an entity's mention episodes and prompts a small
model; here the deterministic analog concatenates the entity's
mention contexts in chronological order and truncates at the same
250-word budget, entirely with JVM-side column expressions (no UDF).

Dataflow: mentions ⋈ episodes (equi-join on episode_uuid, shuffles on
the join key only) → groupBy entity → sorted collect → word-truncate.
At scale the groupBy shuffles on (group_id, entity) which is the same
partitioning the dedupe stage already produced, and per-entity context
is bounded by `max_contexts` before concatenation so a hot entity
(mentioned in millions of turns) cannot blow up a single reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUMMARY_MAX_WORDS = 250  # prompts/extract_nodes.py:250-309
MAX_CONTEXTS = 20  # bound per-entity state (hot-entity guard)


def node_summaries(
    mentions_with_uuid: DataFrame,
    episodes: DataFrame,
    max_words: int = SUMMARY_MAX_WORDS,
    max_contexts: int = MAX_CONTEXTS,
) -> DataFrame:
    """Per raw entity: chronological digest of its mention contexts.

    Input: mentions (episode_uuid, group_id, entity_uuid, entity_name),
    episodes (uuid, content, valid_at). Output one row per
    (group_id, entity_uuid) with `summary` (≤ max_words words) and
    `n_contexts` (total mentions, pre-truncation).
    """
    ctx = mentions_with_uuid.join(
        episodes.select(
            F.col("uuid").alias("episode_uuid"), "content", "valid_at"
        ),
        "episode_uuid",
    )
    digest = (
        ctx.groupBy("group_id", "entity_uuid", "entity_name")
        .agg(
            # deterministic order: sort the collected structs by
            # (valid_at, episode_uuid) — Spark collect_list order is
            # otherwise nondeterministic (SURVEY §4 determinism note)
            F.sort_array(
                F.collect_list(F.struct("valid_at", "episode_uuid", "content"))
            ).alias("ctxs"),
            F.count(F.lit(1)).cast("bigint").alias("n_contexts"),
        )
        .withColumn("ctxs", F.slice("ctxs", 1, max_contexts))
        .withColumn(
            "joined",
            F.array_join(F.transform("ctxs", lambda c: c["content"]), " "),
        )
        .withColumn(
            "summary",
            F.array_join(
                F.slice(
                    F.filter(F.split("joined", " "), lambda w: w != F.lit("")),
                    1,
                    max_words,
                ),
                " ",
            ),
        )
    )
    return digest.select(
        "group_id",
        F.col("entity_uuid").alias("uuid"),
        F.col("entity_name").alias("name"),
        "summary",
        "n_contexts",
    )


def orphan_entities(mentions: DataFrame, id_col: str = "entity_uuid") -> DataFrame:
    """S8/A4: entities mentioned by exactly one episode — the cascade
    candidates of `remove_episode` (graphiti.py:1036-1042: a node is
    deleted with the episode iff that episode is its only mention).

    One partial-aggregated groupBy; no join needed."""
    return (
        mentions.groupBy("group_id", id_col)
        .agg(F.countDistinct("episode_uuid").cast("bigint").alias("n_episodes"))
        .filter(F.col("n_episodes") == 1)
    )


def get_by_cursor(
    df: DataFrame, cursor: str, limit: int, id_col: str = "uuid"
) -> DataFrame:
    """S9 pagination: `uuid < cursor ORDER BY uuid DESC LIMIT n`
    (nodes.py:221-241). TakeOrderedAndProject — no full sort at scale."""
    return df.filter(F.col(id_col) < cursor).orderBy(F.desc(id_col)).limit(limit)
