"""Community detection & summarization (SURVEY §2.6 G2-G6).

Reference: weighted label propagation over the entity co-occurrence
projection (community_operations.py:28-122) — every node starts as its
own community; each iteration a node adopts the neighbor community
with the highest summed edge weight, ties broken by the LARGER
community id (`max`, community_operations.py:101-105), and only moves
when the winning score > 1; iterate to fixpoint. Then the hierarchical
pairwise summary reduce (build_community, community_operations.py:
151-190): while >1 summary remains, pop the LAST as odd-one-out when
the count is odd, zip the first half with the second half, summarize
each pair, append the odd-one-out, repeat; the community name is a
description of the final summary (generate_summary_description,
:138-148) — the SAME derivation on the full-rebuild and incremental
paths. Here `summarize_pair` is a deterministic segment-merge
(split on '; ', left segments first, dedupe, truncate — idempotent,
so re-folding an existing member is a no-op) and
`summary_description` takes the first segment (+ ' & co' when the
summary holds several segments); an LLM summarizer is pluggable per
§7.0.

Spark shape: the projection is one groupBy count; each LPA round is
join → groupBy(node, community) sum(weight) → window argmax → update;
each summary-reduce round is one window count + one groupBy merge —
ceil(log2(max community size)) rounds total, exactly the reference's
tree depth. localCheckpoint per round cuts lineage (same pattern as
G1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark import ids

# char-budget analog of the reference's "under 250 words" prompt cap
# (prompts/summarize_nodes.py summarize_pair), applied per pair merge
SUMMARY_MAX_CHARS = 250


def community_projection(edges: DataFrame) -> DataFrame:
    """G3: weighted undirected adjacency — count(r) per neighbor pair
    within group (community_operations.py:48-62)."""
    pairs = edges.select(
        "group_id",
        F.least("source_node_uuid", "target_node_uuid").alias("a"),
        F.greatest("source_node_uuid", "target_node_uuid").alias("b"),
    ).filter(F.col("a") != F.col("b"))
    return pairs.groupBy("group_id", "a", "b").agg(F.count(F.lit(1)).alias("weight"))


def _lpa_py(pairs, max_iter: int = 50) -> list[tuple[str, str]]:
    """The reference label_propagation loop, verbatim semantics
    (community_operations.py:77-122): every node starts as its own
    community (integer id = position in sorted node order — the
    deterministic stand-in for the reference's dict-enumeration order);
    each synchronous round a node adopts the neighbor community with
    the highest summed edge weight, ties to the LARGER community id;
    when the winning score is ≤ 1 it takes max(candidate, current)
    (:101-105); stop when a round changes nothing. Returns
    (node, community) with community = the uuid owning the final
    integer id (unique per community).

    The reference loops to fixpoint with no cap; synchronous LPA can
    oscillate (a 2-cycle of labelings never converges), so a silent
    max_iter truncation would return an unconverged labeling while
    claiming parity (r3 advice). If the synchronous loop exhausts
    max_iter, fall back to ASYNCHRONOUS update order (apply each
    node's adoption in place, sorted node order): with in-place
    updates a round that changes nothing is a true fixpoint of the
    same adoption rule, and the update is monotone enough in practice
    to settle within a few rounds; if even that fails to converge,
    raise rather than return a wrong labeling."""
    from collections import defaultdict

    nbrs: dict[str, list[tuple[str, int]]] = defaultdict(list)
    for a, b, w in pairs:
        nbrs[a].append((b, w))
        nbrs[b].append((a, w))
    nodes = sorted(nbrs)
    comm = {u: i for i, u in enumerate(nodes)}

    def adopt(u: str, labels: dict[str, int]) -> int:
        cand: dict[int, int] = defaultdict(int)
        for v, w in nbrs[u]:
            cand[labels[v]] += w
        lst = sorted(((c, k) for k, c in cand.items()), reverse=True)
        rank, best = lst[0] if lst else (0, -1)
        return best if best != -1 and rank > 1 else max(best, labels[u])

    converged = False
    for _ in range(max_iter):
        new = {u: adopt(u, comm) for u in nodes}
        if new == comm:
            converged = True
            break
        comm = new
    if not converged:
        # async fallback: in-place updates — a no-change sweep here is
        # a genuine fixpoint of the identical adoption rule
        for _ in range(max_iter):
            changed = False
            for u in nodes:
                nc = adopt(u, comm)
                if nc != comm[u]:
                    comm[u] = nc
                    changed = True
            if not changed:
                converged = True
                break
    if not converged:
        raise RuntimeError(
            f"label propagation failed to converge within {max_iter} "
            f"synchronous + {max_iter} asynchronous rounds "
            f"({len(nodes)} nodes)"
        )
    return [(u, nodes[comm[u]]) for u in nodes]


def label_propagation(projection: DataFrame) -> DataFrame:
    """G2 → (group_id, node, community).

    Community detection is group-scoped (the projection joins on
    group_id; communities never cross groups), so LPA runs like the
    dedupe union-find: pack each group's weighted pair list into one
    row, run the reference's exact loop per row inside an Arrow-batched
    pandas_udf, explode back. One shuffle, no driver-side iteration.
    (An earlier iterative join-loop implementation was abandoned: each
    round's localCheckpoint leaf inherits origin stats in Spark 4
    (LogicalRDD.fromDataset), and join sizeInBytes stats are PRODUCTS,
    so per-round stat values double in bit-width and the stats visitor
    ends up multiplying million-bit BigIntegers — the driver appears
    hung after ~15 rounds. Executor-side packing removes the loop from
    the plan entirely.)"""
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    ret_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("node", T.StringType()),
                T.StructField("community", T.StringType()),
            ]
        )
    )

    def _lpa_rows_fn(prs):
        return prs.apply(
            lambda ps: [
                {"node": n, "community": c}
                for n, c in _lpa_py((p["x"], p["y"], p["w"]) for p in ps)
            ]
        )

    _lpa_rows_fn.__annotations__ = {"prs": pd.Series, "return": pd.Series}
    _lpa_rows = F.pandas_udf(ret_type)(_lpa_rows_fn)

    packed = projection.groupBy("group_id").agg(
        F.collect_list(
            F.struct(F.col("a").alias("x"), F.col("b").alias("y"), F.col("weight").alias("w"))
        ).alias("prs")
    )
    return packed.select("group_id", F.explode(_lpa_rows(F.col("prs"))).alias("nc")).select(
        "group_id", F.col("nc.node").alias("node"), F.col("nc.community").alias("community")
    )


def summarize_pair(left: Column, right: Column) -> Column:
    """Deterministic `summarize_pair` analog (community_operations.py:
    123-135): merge the '; '-separated segments of both summaries, left
    segments first, drop repeats, truncate to the per-pair budget.
    Idempotent — folding a summary into one that already contains its
    segments changes nothing (the analog of the LLM producing a stable
    combined summary)."""
    segs = F.array_distinct(F.concat(F.split(left, "; "), F.split(right, "; ")))
    return F.substring(F.concat_ws("; ", segs), 1, SUMMARY_MAX_CHARS)


def summary_description(summary: Column) -> Column:
    """Deterministic `generate_summary_description` analog
    (community_operations.py:138-148): 1-phrase community name derived
    from the summary — its first segment, '& co'-suffixed when the
    summary covers several segments. Used by BOTH build_communities and
    update_communities, as the reference uses the same LLM prompt on
    both paths."""
    first = F.split_part(summary, F.lit("; "), F.lit(1))
    return F.when(F.size(F.split(summary, "; ")) > 1, F.concat(first, F.lit(" & co"))).otherwise(
        first
    )


def hierarchical_summarize(members: DataFrame, max_iter: int = 32) -> DataFrame:
    """G4 pairwise halving reduce (build_community,
    community_operations.py:155-176) over `members(group_id, community,
    idx, summary)` with idx dense 0..L-1 per community.

    Per round, for a community of size L: the last element is carried
    as odd-one-out when L is odd (reference pops it before pairing and
    appends it after, :157-159,170-171), element i of the first half
    pairs with element half+i of the second half (`zip(summaries[:L/2],
    summaries[L/2:])`, :164-167), and each pair merges via
    summarize_pair. One window count + one groupBy per round;
    ceil(log2(max L)) rounds. Returns (group_id, community, summary).
    """
    df = members.select("group_id", "community", "idx", "summary")
    wc = Window.partitionBy("group_id", "community")
    for _ in range(max_iter):
        sized = df.withColumn("L", F.count(F.lit(1)).over(wc)).localCheckpoint()
        if sized.filter(F.col("L") > 1).limit(1).count() == 0:
            break
        leven = F.col("L") - F.col("L") % 2
        half = (leven / 2).cast("int")
        assigned = sized.withColumn(
            "side",
            F.when(F.col("idx") >= leven, F.lit("odd"))
            .when(F.col("idx") < half, F.lit("l"))
            .otherwise(F.lit("r")),
        ).withColumn(
            "idx",
            F.when(F.col("idx") >= leven, half)
            .when(F.col("idx") < half, F.col("idx"))
            .otherwise(F.col("idx") - half),
        )
        merged = assigned.groupBy("group_id", "community", "idx").agg(
            F.max(F.when(F.col("side") == "l", F.col("summary"))).alias("l"),
            F.max(F.when(F.col("side") == "r", F.col("summary"))).alias("r"),
            F.max(F.when(F.col("side") == "odd", F.col("summary"))).alias("odd"),
        )
        df = merged.select(
            "group_id",
            "community",
            "idx",
            F.when(
                F.col("l").isNotNull() & F.col("r").isNotNull(), summarize_pair(F.col("l"), F.col("r"))
            )
            .otherwise(F.coalesce("odd", "l", "r"))
            .alias("summary"),
        )
    return df.filter(F.col("idx") == 0).select("group_id", "community", "summary")


def build_communities(
    edges: DataFrame, nodes: DataFrame, run_ts: str
) -> tuple[DataFrame, DataFrame]:
    """G4/G6: full rebuild → (communities, community_membership) tables.

    Member summaries (summary column when `nodes` carries one, else the
    member name) are reduced with the hierarchical pairwise halving of
    build_community (community_operations.py:151-190) in uuid order
    (the reference reduces in cluster-collect order, which Cypher does
    not pin; uuid order is the deterministic stand-in), and the
    community name is summary_description(final summary) — same
    derivation as the incremental path."""
    labels = label_propagation(community_projection(edges))
    member_summary = (
        F.coalesce(F.col("member_summary"), F.col("member_name"))
        if "summary" in nodes.columns
        else F.col("member_name")
    )
    node_cols = [F.col("uuid").alias("node"), F.col("name").alias("member_name")]
    if "summary" in nodes.columns:
        node_cols.append(F.col("summary").alias("member_summary"))
    members = labels.join(nodes.select(*node_cols), "node").withColumn(
        "member_summary", member_summary
    )
    ordered = members.withColumn(
        "idx",
        F.row_number().over(
            Window.partitionBy("group_id", "community").orderBy("node")
        )
        - 1,
    ).select("group_id", "community", "idx", F.col("member_summary").alias("summary"))
    summaries = hierarchical_summarize(ordered)
    agg = members.groupBy("group_id", "community").agg(
        F.sort_array(F.collect_set("node")).alias("member_uuids"),
    )
    communities = agg.join(summaries, ["group_id", "community"]).select(
        ids.community_uuid(F.col("group_id"), F.col("community")).alias("uuid"),
        summary_description(F.col("summary")).alias("name"),
        "group_id",
        "summary",
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

    Nodes in `new_nodes(uuid, name, summary, group_id)` already holding
    a membership keep their community and only refresh its summary (the
    reference's is_new=False path still calls summarize_pair and saves,
    community_operations.py:287-311); the rest join the plurality
    community among their RELATES_TO neighbors (ties broken by larger
    community uuid, matching the LPA tie rule) and add a HAS_MEMBER
    edge; nodes with no communal neighbor are left alone (the reference
    returns ([], []) in that case). Touched communities fold the
    affected nodes' summaries ahead of the old summary via
    summarize_pair (entity-first argument order as in update_community)
    and regenerate the name with summary_description — the same
    derivation build_communities uses, so incremental names stay
    consistent with the full-rebuild rule. summarize_pair dedupes
    segments, so re-passing an existing member is a no-op.

    All set-at-once dataflow: one membership join + one neighbor join +
    one window argmax + one membership union + one community-row merge
    — the batch analog of the reference's per-entity loop."""
    mem = membership.select(
        F.col("target_node_uuid").alias("entity_uuid"),
        F.col("source_node_uuid").alias("community_uuid"),
    )
    nn = new_nodes.select("uuid", "name", "summary", "group_id")
    existing = nn.join(
        mem.select(F.col("entity_uuid").alias("uuid"), "community_uuid").distinct(), "uuid"
    )
    cand = nn.join(
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
    joined = (
        winners.select("community_uuid", "name", "summary")
        .unionByName(existing.select("community_uuid", "name", "summary"))
        .groupBy("community_uuid")
        .agg(
            F.concat_ws("; ", F.sort_array(F.collect_set(F.coalesce("summary", "name")))).alias(
                "new_member_summary"
            )
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
                summarize_pair(F.col("new_member_summary"), F.col("summary")),
            ).otherwise(F.col("summary")),
        )
        .withColumn(
            "name",
            F.when(
                F.col("new_member_summary").isNotNull(), summary_description(F.col("summary"))
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
