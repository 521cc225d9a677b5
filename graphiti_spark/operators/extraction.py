"""Mention & triple extraction operators (SURVEY §2.2 E1/E3/E7).

The reference runs one LLM call per episode (node_operations.py:67-173,
edge_operations.py:110-244) bounded by an asyncio semaphore of 20
(helpers.py:37). Here extraction is a `mapInPandas` over the episodes
DataFrame: Arrow-batched, vectorized regex inside the batch, no per-row
Python from Spark's perspective, parallelism = Spark tasks. The rule
engine (graphiti_spark.rules) is pluggable — an `Extractor` is any
pandas-batch function with the same signature, so an LLM-backed
implementation slots in without changing the dataflow (§2.12).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark import ids, rules

TRIPLES_SCHEMA = (
    "episode_uuid string, group_id string, subj_name string, pred string, "
    "obj_name string, fact string, valid_at timestamp, invalid_at timestamp"
)
MENTIONS_SCHEMA = (
    "episode_uuid string, group_id string, entity_name string, mention_order long"
)

# An Extractor maps a pandas batch of episodes to a pandas batch of
# extraction rows — the deterministic analog of LLMClient.generate_response
# (llm_client/client.py:90-111).
Extractor = Callable[[pd.DataFrame], pd.DataFrame]


def _split_content(pdf: pd.DataFrame) -> pd.DataFrame:
    """Recover (role, text) from message content "role: text" —
    speaker is the part before the colon (prompts/extract_nodes.py:105)."""
    parts = pdf["content"].fillna("").str.split(": ", n=1, expand=True)
    pdf = pdf.copy()
    pdf["role"] = parts[0]
    pdf["text"] = parts[1] if parts.shape[1] > 1 else ""
    return pdf


def extract_triples(
    episodes: DataFrame, extractor: Extractor = rules.extract_triples_pdf
) -> DataFrame:
    """E3: episodes → one row per (subj, pred, obj, fact, valid_at,
    invalid_at). Output is already exploded (mapInPandas yields the
    variable-length result rows directly — no array<struct> detour)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = _split_content(pdf)
            yield extractor(pdf[["uuid", "group_id", "text", "valid_at"]])

    src = episodes.select("uuid", "group_id", "content", "valid_at")
    return src.mapInPandas(run, schema=TRIPLES_SCHEMA)


def extract_mentions(
    episodes: DataFrame, extractor: Extractor = rules.extract_mentions_pdf
) -> DataFrame:
    """E1: episodes → mention rows (speaker first, mention_order stable)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = _split_content(pdf)
            out = extractor(pdf[["uuid", "group_id", "role", "text"]])
            out["mention_order"] = out["mention_order"].astype("int64")
            yield out

    src = episodes.select("uuid", "group_id", "content")
    return src.mapInPandas(run, schema=MENTIONS_SCHEMA)


def extract_triples_mixed(episodes: DataFrame) -> DataFrame:
    """E3 across episode types: per-source extractor dispatch mirroring
    the reference's three prompt families (prompts/extract_nodes.py:
    82 message, 163 text, 131 json; edge prompts share the episode
    content the same way). Input episodes carry (uuid, group_id,
    source, role, text, valid_at) — `text` is the raw utterance for
    message/text and the JSON document string for json episodes. One
    mapInPandas; the dispatch is a pandas mask inside the batch, so
    mixed corpora stay a single scan with no per-source shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            src = pdf["source"].fillna("message")
            base = pdf[["uuid", "group_id", "text", "valid_at"]]
            parts = [
                rules.extract_triples_pdf(base[src != "json"]),
                rules.extract_triples_pdf(
                    base[src == "json"], rule_set=rules.JSON_TRIPLE_RULES
                ),
            ]
            yield pd.concat(parts, ignore_index=True)

    src = episodes.select("uuid", "group_id", "source", "text", "valid_at")
    return src.mapInPandas(run, schema=TRIPLES_SCHEMA)


def extract_mentions_mixed(episodes: DataFrame) -> DataFrame:
    """E1 across episode types. `message` episodes extract the speaker
    first (role column); `text`/`json` episodes have role='' so the
    speaker branch never fires (extract_text/extract_json prompts have
    no speaker rule)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            src = pdf["source"].fillna("message")
            base = pdf[["uuid", "group_id", "role", "text"]]
            parts = [
                rules.extract_mentions_pdf(base[src != "json"]),
                rules.extract_mentions_pdf(
                    base[src == "json"], rule_set=rules.JSON_RULES
                ),
            ]
            out = pd.concat(parts, ignore_index=True)
            out["mention_order"] = out["mention_order"].astype("int64")
            yield out

    src = episodes.select("uuid", "group_id", "source", "role", "text")
    return src.mapInPandas(run, schema=MENTIONS_SCHEMA)


# Reference default: reflexion off (helpers.py:38). Raising it turns on
# the find-what-you-missed loop below, exactly like the reference's
# MAX_REFLEXION_ITERATIONS env knob.
MAX_REFLEXION_ITERATIONS = 0


def extract_mentions_reflexive(
    episodes: DataFrame,
    extractor: Extractor = rules.extract_mentions_pdf,
    reflector: Extractor = rules.reflexion_mentions_pdf,
    max_iterations: int = MAX_REFLEXION_ITERATIONS,
) -> DataFrame:
    """E2: extract_nodes with the reflexion loop
    (node_operations.py:46-64, loop 111-143): after the first pass, ask
    the reflector which entities were missed given the names already
    found; fold the misses in and repeat until none are found or the
    iteration budget is spent. Default budget 0 — a single pass,
    bit-identical to extract_mentions (reference parity).

    Each round is one groupBy(episode) collect_set + one mapInPandas;
    the loop terminates early via a limit(1).count() probe on a lazily
    checkpointed miss set (at most `max_iterations` probes)."""
    mentions = extract_mentions(episodes, extractor)
    if max_iterations <= 0:
        return mentions
    src = episodes.select("uuid", "group_id", "content")
    for _ in range(max_iterations):
        found = mentions.groupBy(F.col("episode_uuid").alias("uuid")).agg(
            F.collect_set("entity_name").alias("found_names")
        )
        ctx = src.join(found, "uuid", "left")

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = _split_content(pdf)
                out = reflector(pdf[["uuid", "group_id", "role", "text", "found_names"]])
                out["mention_order"] = out["mention_order"].astype("int64")
                yield out

        extra = ctx.mapInPandas(run, schema=MENTIONS_SCHEMA).localCheckpoint(eager=False)
        if extra.limit(1).count() == 0:
            break
        mentions = mentions.unionByName(extra)
    return mentions


def extract_triples_reflexive(
    episodes: DataFrame,
    extractor: Extractor = rules.extract_triples_pdf,
    reflector: Extractor = rules.reflexion_triples_pdf,
    max_iterations: int = MAX_REFLEXION_ITERATIONS,
) -> DataFrame:
    """E4: extract_edges with the missed-facts reflexion loop
    (edge_operations.py:157-184; prompt extract_edges.py:130-155).
    Default budget 0 = single pass (reference parity)."""
    triples = extract_triples(episodes, extractor)
    if max_iterations <= 0:
        return triples
    src = episodes.select("uuid", "group_id", "content", "valid_at")
    for _ in range(max_iterations):
        found = triples.groupBy(F.col("episode_uuid").alias("uuid")).agg(
            F.collect_set("fact").alias("found_facts")
        )
        ctx = src.join(found, "uuid", "left")

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = _split_content(pdf)
                yield reflector(pdf[["uuid", "group_id", "text", "valid_at", "found_facts"]])

        extra = ctx.mapInPandas(run, schema=TRIPLES_SCHEMA).localCheckpoint(eager=False)
        if extra.limit(1).count() == 0:
            break
        triples = triples.unionByName(extra)
    return triples


def mentions_with_entity_uuid(mentions: DataFrame) -> DataFrame:
    """Attach the candidate (pre-canonicalization) entity uuid —
    content-derived, so within-batch exact-name dedupe is free."""
    return mentions.withColumn(
        "entity_uuid", ids.entity_uuid(F.col("group_id"), F.col("entity_name"))
    )


def triples_with_uuids(triples: DataFrame) -> DataFrame:
    """Attach subj/obj candidate entity uuids + provenance edge uuid."""
    return (
        triples.withColumn("subj_uuid", ids.entity_uuid(F.col("group_id"), F.col("subj_name")))
        .withColumn("obj_uuid", ids.entity_uuid(F.col("group_id"), F.col("obj_name")))
        .withColumn(
            "edge_uuid",
            ids.edge_uuid(
                F.col("group_id"),
                F.col("episode_uuid"),
                F.col("subj_name"),
                F.col("pred"),
                F.col("obj_name"),
            ),
        )
    )
