"""Edge resolution: pointer rewrite, dedupe, bi-temporal invalidation
(SURVEY §2.3 P4, §2.4 J6/J7, §2.5 T1-T3).

Batch semantics (the reference's own bulk model, graphiti.py:554-831):

1. resolve_edge_pointers (bulk_utils.py:420-427): rewrite endpoints
   through uuid_map — two broadcast-able left joins + coalesce.
2. Edge dedupe (edge_operations.py:378-436 verdict `duplicate_facts`):
   deterministic analog — edges with identical directed
   (group_id, src, dst, pred) are the same fact; the earliest
   (valid_at asc nulls last, then episode_uuid — explicit sort keys
   per SURVEY §4.5) row's uuid/fact win and provenance episode lists
   union (reference appends episodes to the existing edge,
   edge_operations.py:428-436).
3. Temporal invalidation — the pure interval rules of
   resolve_edge_contradictions (edge_operations.py:345-375,474-488)
   replayed as window expressions. Contradiction sources for an
   asserted edge e = (g, s, o, p, valid_at=v):
     * termination statements of the same directed triple with
       invalid_at > v (date rule prompts/extract_edges.py:117-124);
     * antonym-predicate assertions (LIKES ↔ DISLIKES,
       test_temporal_operations_int.py:96-264) on the same (g, s, o)
       with valid_at > v.
   e.invalid_at := min over both sources (T1 from the older edge's
   view / T2 from the newer edge's view — one symmetric batch rule);
   T3: any edge with invalid_at set gets expired_at = run_ts
   (edge_operations.py:471-472).

Everything below is joins + window aggregates on keys that include
group_id — shuffles stay partition-pruned per conversation group and
AQE splits skewed groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark import rules
from graphiti_spark.functions import embeddings as emb
from graphiti_spark.functions import text as tx


def resolve_edge_pointers(triples: DataFrame, uuid_map: DataFrame) -> DataFrame:
    """P4 — rewrite subj_uuid/obj_uuid via canonical map; identity when
    unmapped. uuid_map is small relative to triples → broadcast."""
    m = F.broadcast(uuid_map.select("raw_uuid", "canonical_uuid"))
    t = (
        triples.join(m.withColumnRenamed("raw_uuid", "subj_uuid"), "subj_uuid", "left")
        .withColumn("subj_uuid", F.coalesce("canonical_uuid", "subj_uuid"))
        .drop("canonical_uuid")
    )
    return (
        t.join(m.withColumnRenamed("raw_uuid", "obj_uuid"), "obj_uuid", "left")
        .withColumn("obj_uuid", F.coalesce("canonical_uuid", "obj_uuid"))
        .drop("canonical_uuid")
    )


def relevant_edge_pairs(triples: DataFrame) -> DataFrame:
    """J2/J4-edge candidate generation: pairs of extracted edges sharing
    the same endpoints in either direction whose facts word-overlap.

    Reference: get_relevant_edges constrains candidates to the same
    undirected endpoint pair (search_utils.py:734-800 — "same endpoints
    (either direction)"), and the bulk blocking rule accepts a pair on
    fact word-overlap (bulk_utils.py:297,313-337; the cosine≥0.6
    alternative is the embedding block, dedupe.candidate_pairs-style).

    The equi-join key (group_id, least(subj,obj), greatest(subj,obj))
    bounds the pair space before any similarity math — this is the
    reference's own join pruning, and at scale it is one shuffle on a
    composite key that AQE skew-splits for hot entity pairs.
    Returns (group_id, src, dst, overlap) with src < dst (edge uuids).
    """
    e = triples.select(
        "group_id",
        F.col("edge_uuid").alias("uuid"),
        F.least("subj_uuid", "obj_uuid").alias("e1"),
        F.greatest("subj_uuid", "obj_uuid").alias("e2"),
        tx.tokens(F.col("fact")).alias("toks"),
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.group_id") == F.col("b.group_id"))
            & (F.col("a.e1") == F.col("b.e1"))
            & (F.col("a.e2") == F.col("b.e2"))
            & (F.col("a.uuid") < F.col("b.uuid")),
        )
        .withColumn("overlap", F.size(F.array_intersect("a.toks", "b.toks")))
        .filter(F.col("overlap") > 0)
        .select(
            F.col("a.group_id").alias("group_id"),
            F.col("a.uuid").alias("src"),
            F.col("b.uuid").alias("dst"),
            F.col("overlap").cast("bigint").alias("overlap"),
        )
    )


def _antonym_col(pred):
    expr = F.lit(None).cast("string")
    for p, q in rules.ANTONYMS.items():
        expr = F.when(pred == p, F.lit(q)).otherwise(expr)
    return expr


def resolve_edges(
    triples: DataFrame, run_ts: str, with_embeddings: bool = True
) -> DataFrame:
    """triples (post pointer-rewrite, columns episode_uuid group_id
    subj_uuid obj_uuid subj_name pred obj_name fact valid_at invalid_at
    edge_uuid) → canonical bi-temporal edges (schemas.EDGES)."""
    key = ["group_id", "subj_uuid", "obj_uuid", "pred"]

    asserted = triples.filter(F.col("valid_at").isNotNull())
    terminations = triples.filter(
        F.col("invalid_at").isNotNull() & F.col("valid_at").isNull()
    )

    # -- 2. dedupe identical directed facts: first-win with explicit order.
    # PHYSICAL NOTE: expressed as window + rn=1 filter, NOT
    # groupBy(min_by(string)) — string-valued aggregation buffers force
    # Spark's SortAggregate fallback (HashAggregate needs fixed-width
    # buffers), which re-sorts the whole exchange; the ordered window
    # needs the same single sort and the frame aggregates piggyback on
    # it (measured via event-log profile, BENCH.md r2).
    w = Window.partitionBy(*key).orderBy(
        F.col("valid_at").asc_nulls_last(), F.col("episode_uuid").asc()
    )
    wf = Window.partitionBy(*key)  # full-partition frame, same clustering
    merged = (
        asserted.withColumn("rn", F.row_number().over(w))
        .withColumn("episodes", F.sort_array(F.collect_set("episode_uuid").over(wf)))
        .withColumn("min_valid", F.min("valid_at").over(wf))
        .filter(F.col("rn") == 1)
        .select(
            *key,
            F.col("edge_uuid").alias("uuid"),
            "fact",
            F.col("min_valid").alias("valid_at"),
            "episodes",
            "subj_name",
            "obj_name",
        )
    )

    # -- 3a. termination statements: min invalid_at later than valid_at
    wt = Window.partitionBy(*key).orderBy(F.col("edge_uuid").asc())
    wtf = Window.partitionBy(*key)
    term_agg = (
        terminations.withColumn("rn", F.row_number().over(wt))
        .withColumn("term_times", F.sort_array(F.collect_list("invalid_at").over(wtf)))
        .withColumn("term_episodes", F.sort_array(F.collect_set("episode_uuid").over(wtf)))
        .filter(F.col("rn") == 1)
        .select(
            *key,
            "term_times",
            "term_episodes",
            F.col("edge_uuid").alias("term_uuid"),
            F.col("fact").alias("term_fact"),
            F.col("subj_name").alias("term_subj_name"),
            F.col("obj_name").alias("term_obj_name"),
        )
    )
    with_term = merged.join(
        term_agg.drop("term_subj_name", "term_obj_name"), key, "left"
    ).withColumn(
        "term_invalid_at",
        F.array_min(F.filter(F.col("term_times"), lambda t: t > F.col("valid_at"))),
    )

    # -- 3b. antonym assertions on the same (group, subj, obj)
    antonyms = merged.select(
        "group_id",
        "subj_uuid",
        "obj_uuid",
        _antonym_col(F.col("pred")).alias("pred"),
        F.col("valid_at").alias("anto_valid_at"),
    ).filter(F.col("pred").isNotNull())
    anto_w = Window.partitionBy(*key).orderBy("anto_valid_at")
    anto_agg = antonyms.groupBy(*key).agg(
        F.sort_array(F.collect_list("anto_valid_at")).alias("anto_times")
    )
    resolved = (
        with_term.join(anto_agg, key, "left")
        .withColumn(
            "anto_invalid_at",
            F.array_min(F.filter(F.col("anto_times"), lambda t: t > F.col("valid_at"))),
        )
        .withColumn("invalid_at", F.least("term_invalid_at", "anto_invalid_at"))
    )

    # -- termination statements are edges too (fact with invalid_at set,
    #    valid_at NULL — they expire immediately per T3); display names
    #    ride along from the rn=1 row (no extra aggregate or join)
    term_edges = term_agg.select(
        *key,
        F.col("term_uuid").alias("uuid"),
        F.col("term_fact").alias("fact"),
        F.lit(None).cast("timestamp").alias("valid_at"),
        F.col("term_episodes").alias("episodes"),
        F.element_at("term_times", 1).alias("invalid_at"),
        F.col("term_subj_name").alias("subj_name"),
        F.col("term_obj_name").alias("obj_name"),
    )

    all_edges = resolved.select(
        *key, "uuid", "fact", "valid_at", "episodes", "invalid_at", "subj_name", "obj_name"
    ).unionByName(term_edges)

    # -- T3 + final projection to schemas.EDGES
    out = (
        all_edges.withColumn(
            "expired_at",
            F.when(F.col("invalid_at").isNotNull(), F.lit(run_ts).cast("timestamp")),
        )
        .select(
            "uuid",
            F.col("subj_uuid").alias("source_node_uuid"),
            F.col("obj_uuid").alias("target_node_uuid"),
            F.col("pred").alias("name"),
            "fact",
            "group_id",
            "episodes",
            F.lit(run_ts).cast("timestamp").alias("created_at"),
            "expired_at",
            "valid_at",
            "invalid_at",
            F.col("subj_name"),
            F.col("obj_name"),
        )
    )
    if with_embeddings:
        out = emb.attach_embedding(out, "fact", "fact_embedding")
    else:
        out = out.withColumn("fact_embedding", F.lit(None).cast("array<float>"))
    return out.withColumn(
        "attributes", F.lit(None).cast("map<string,string>")
    )
