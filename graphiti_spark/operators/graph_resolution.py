"""Cross-batch resolution against the EXISTING graph (SURVEY §3.2
step 9; reference graphiti.py:722-812 + node_operations.py:176-290).

The reference's add_episode_bulk, after within-batch dedupe, resolves
each batch's nodes against the already-materialized graph: J1 hybrid
candidates (word-overlap ∪ cosine ≥ 0.8 name similarity against the
existing node table — search_utils.py:640-731, bulk_utils.py:208) and
the J5 dedupe verdict; matched extracted nodes adopt the EXISTING
node's uuid (the extracted object is discarded in favor of the graph's
node — node_operations.py:238-266), extending the batch uuid_map.

Without this, an alias pair split across two ingestion runs ("Alice"
in run 1, "Alice Smith" in run 2) never merges — the #1 semantic
divergence for incremental users (VERDICT r1).

Scale shape: the match is a token-posting equi-join keyed on
(group_id, token) between the batch's distinct entities and the
existing nodes of the SAME groups only (left-semi pre-filter) — the
existing side is group-partition-pruned, so an incremental batch
touching k groups never scans the other 10^12-scale groups' nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions import embeddings as emb
from graphiti_spark.functions import text as tx

NODE_COSINE_THRESHOLD = 0.8  # reference bulk_utils.py:208


def match_existing(
    batch_entities: DataFrame,
    existing_nodes: DataFrame,
    use_embedding_block: bool = False,
) -> DataFrame:
    """J1+J5 against the graph: batch entity surfaces
    (group_id, entity_uuid, entity_name) × existing nodes
    (uuid, name, group_id[, name_embedding]) → matches
    (group_id, raw_uuid, existing_uuid).

    Every *surface* in the batch probes (any alias form matching an
    existing node merges its whole within-batch component). Verdict =
    the same deterministic rule as within-batch dedupe: lowercased
    name equality, or first-token equality + token-subset alias rule.
    A probe matching several existing nodes takes the smallest uuid
    (deterministic; the reference takes the first LLM-listed candidate,
    which is ordering-dependent — we pin it, SURVEY §4.5)."""
    probe = batch_entities.select(
        "group_id",
        F.col("entity_uuid").alias("raw_uuid"),
        F.col("entity_name").alias("raw_name"),
        tx.tokens(F.col("entity_name")).alias("raw_toks"),
    )
    # group-partition pruning: only existing nodes of touched groups
    ex = (
        existing_nodes.join(
            probe.select("group_id").distinct(), "group_id", "left_semi"
        )
        .select(
            "group_id",
            F.col("uuid").alias("existing_uuid"),
            F.col("name").alias("ex_name"),
            tx.tokens(F.col("name")).alias("ex_toks"),
        )
        # self-echo guard: a re-ingested batch finds its own nodes; the
        # identity match is a no-op handled by coalesce downstream
    )
    p = probe.withColumn("tok", F.explode("raw_toks"))
    x = ex.withColumn("tok", F.explode("ex_toks"))
    # drop the join key then distinct(): remaining columns are identical
    # per (group, raw, existing) pair, and distinct() stays in
    # HashAggregate (dropDuplicates(subset) falls back to SortAggregate
    # on first(string) buffers)
    cand = p.join(x, ["group_id", "tok"]).drop("tok").distinct()
    if use_embedding_block:
        pe = probe.withColumn("embedding", emb.embed_udf(F.col("raw_name"))).withColumn(
            "band", emb.sim_bands(F.col("embedding"))
        )
        xe = ex.withColumn("embedding", emb.embed_udf(F.col("ex_name"))).withColumn(
            "band", emb.sim_bands(F.col("embedding"))
        )
        ecand = (
            pe.join(xe, ["group_id", "band"])
            .filter(emb.dot(pe.embedding, xe.embedding) >= NODE_COSINE_THRESHOLD)
            .select(
                "group_id", "raw_uuid", "raw_name", "raw_toks",
                "existing_uuid", "ex_name", "ex_toks",
            )
        )
        cand = cand.select(ecand.columns).unionByName(ecand).distinct()
    exact = F.lower(F.col("raw_name")) == F.lower(F.col("ex_name"))
    first_tok_eq = F.element_at("raw_toks", 1) == F.element_at("ex_toks", 1)
    subset = (F.size(F.array_except("raw_toks", "ex_toks")) == 0) | (
        F.size(F.array_except("ex_toks", "raw_toks")) == 0
    )
    # exact-name matches outrank alias-rule matches; ties break on the
    # smallest existing uuid (struct min orders lexicographically)
    matched = cand.filter(exact | (first_tok_eq & subset)).withColumn(
        "rank", F.when(exact, F.lit(0)).otherwise(F.lit(1))
    )
    return (
        matched.groupBy("group_id", "raw_uuid")
        .agg(F.min(F.struct("rank", "existing_uuid")).alias("m"))
        .select("group_id", "raw_uuid", F.col("m.existing_uuid").alias("existing_uuid"))
    )


def extend_uuid_map(
    uuid_map: DataFrame, entities: DataFrame, matches: DataFrame
) -> DataFrame:
    """Compose the within-batch uuid_map with cross-batch matches.

    The existing node ALWAYS wins (the reference keeps the graph's
    node and discards the extracted one, node_operations.py:238-266) —
    unlike within-batch canonicalization, which takes the
    lexicographic min. Composition: a match on ANY surface of a
    within-batch component remaps the whole component; when several
    surfaces of one component match different existing nodes, the
    smallest existing uuid wins (deterministic tie-break).

    Returns uuid_map rows (raw_uuid, canonical_uuid, group_id)
    covering every raw uuid whose canonical differs from itself."""
    # each raw surface's within-batch canonical (identity when unmapped)
    raws = entities.select("group_id", F.col("entity_uuid").alias("raw_uuid"))
    within = (
        raws.join(uuid_map.select("raw_uuid", "canonical_uuid"), "raw_uuid", "left")
        .withColumn("within_canon", F.coalesce("canonical_uuid", "raw_uuid"))
        .select("group_id", "raw_uuid", "within_canon")
    )
    # component-level existing target: min existing uuid over the
    # component's matching surfaces
    comp_target = (
        within.join(matches, ["group_id", "raw_uuid"])
        .groupBy("group_id", "within_canon")
        .agg(F.min("existing_uuid").alias("existing_uuid"))
    )
    composed = (
        within.join(comp_target, ["group_id", "within_canon"], "left")
        .select(
            "raw_uuid",
            F.coalesce("existing_uuid", "within_canon").alias("canonical_uuid"),
            "group_id",
        )
        .filter(F.col("raw_uuid") != F.col("canonical_uuid"))
    )
    return composed


def merge_node_payloads(
    batch_nodes: DataFrame, existing_nodes: DataFrame
) -> DataFrame:
    """Node updates for the incremental merge, preserving existing
    identity: for uuids already in the graph, the existing name /
    embedding / created_at win (the reference keeps the graph node and
    only hydrates attributes, node_operations.py:238-266 +
    graphiti.py:683-720); summaries and alias attributes union."""
    ex = existing_nodes.select(
        F.col("uuid"),
        F.col("name").alias("ex_name"),
        F.col("summary").alias("ex_summary"),
        F.col("attributes").alias("ex_attributes"),
        F.col("name_embedding").alias("ex_embedding"),
        F.col("created_at").alias("ex_created_at"),
    )
    merged = (
        batch_nodes.join(ex, "uuid", "left")
        .withColumn(
            "summary",
            F.when(
                F.col("ex_summary").isNotNull()
                & (F.col("ex_summary") != F.col("summary")),
                F.concat_ws(
                    "; ",
                    F.array_sort(
                        F.array_distinct(
                            F.concat(
                                F.split(F.col("ex_summary"), "; "),
                                F.split(F.col("summary"), "; "),
                            )
                        )
                    ),
                ),
            ).otherwise(F.col("summary")),
        )
        .withColumn(
            "attributes",
            F.when(
                F.col("ex_attributes").isNotNull(),
                F.map_zip_with(
                    F.col("ex_attributes"),
                    F.col("attributes"),
                    lambda k, v1, v2: F.when(
                        v1.isNotNull() & v2.isNotNull() & (v1 != v2),
                        F.concat_ws(
                            "|",
                            F.array_sort(
                                F.array_distinct(
                                    F.concat(F.split(v1, "\\|"), F.split(v2, "\\|"))
                                )
                            ),
                        ),
                    ).otherwise(F.coalesce(v2, v1)),
                ),
            ).otherwise(F.col("attributes")),
        )
        .withColumn("name", F.coalesce("ex_name", "name"))
        .withColumn("name_embedding", F.coalesce("ex_embedding", "name_embedding"))
        .withColumn("created_at", F.coalesce("ex_created_at", "created_at"))
        .drop("ex_name", "ex_summary", "ex_attributes", "ex_embedding", "ex_created_at")
    )
    return merged.select(batch_nodes.columns)
