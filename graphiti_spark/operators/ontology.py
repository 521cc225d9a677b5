"""Typed entities & edges — the reference's `entity_types` /
`edge_types` / `edge_type_map` surface (SURVEY §2.12).

Reference semantics replicated deterministically:
  * `entity_types`: user-supplied Pydantic models classify extracted
    entities and drive typed attribute extraction
    (graphiti.py:362-366, node_operations.py:293-378). Validation
    rejects custom fields shadowing protected ones
    (utils/ontology_utils/entity_types_utils.py:19-33).
  * `excluded_entity_types`: mentions classified into an excluded type
    never become nodes; edges touching them are dropped
    (node_operations.py:145-173, tests/test_entity_exclusion_int.py).
  * `edge_type_map: {(src_label, tgt_label): [edge types]}`: a resolved
    edge whose endpoint-label cross product hits a map entry and whose
    fact classifies as one of the allowed types is RENAMED to the fact
    type and gets typed attributes (edge_operations.py:274-301,444-462).

The LLM classifier is replaced by a deterministic rule table: an
entity's labels derive from the predicates it participates in (the
relational analog of "classify from episode context"), and fact types
derive from the predicate. Everything is column expressions and one
labels join — no UDFs, JVM-side end-to-end; the edge_type_map is a
literal when/otherwise chain (tiny ontology → no broadcast join
needed, stays inside whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# validation (entity_types_utils.py:19-33)

PROTECTED_NODE_FIELDS = {
    "uuid", "name", "group_id", "labels", "created_at",
    "summary", "attributes", "name_embedding",
}
PROTECTED_EDGE_FIELDS = {
    "uuid", "source_node_uuid", "target_node_uuid", "name", "fact",
    "group_id", "episodes", "created_at", "expired_at", "valid_at",
    "invalid_at", "attributes", "fact_embedding",
}


class EntityTypeValidationError(ValueError):
    pass


def validate_entity_types(entity_types: dict[str, list[str]]) -> None:
    """entity_types: {type_name: [custom attribute field names]}.
    Mirrors entity_types_utils.py:19-33: a custom field that shadows a
    protected node field is rejected."""
    for tname, fields in entity_types.items():
        for f in fields:
            if f in PROTECTED_NODE_FIELDS:
                raise EntityTypeValidationError(
                    f"entity type {tname!r}: field {f!r} shadows a protected field"
                )


def validate_edge_types(edge_types: dict[str, list[str]]) -> None:
    for tname, fields in edge_types.items():
        for f in fields:
            if f in PROTECTED_EDGE_FIELDS:
                raise EntityTypeValidationError(
                    f"edge type {tname!r}: field {f!r} shadows a protected field"
                )


# ---------------------------------------------------------------------------
# deterministic ontology (the classifier rule table)

# (predicate, endpoint-side, label): an entity gets `label` when it
# appears on `side` of an edge named `predicate`.
DEFAULT_LABEL_RULES: tuple[tuple[str, str, str], ...] = (
    ("WORKS_AT", "subj", "Person"),
    ("WORKS_AT", "obj", "Organization"),
    ("CEO_OF", "subj", "Person"),
    ("CEO_OF", "obj", "Organization"),
    ("LIVES_IN", "subj", "Person"),
    ("LIVES_IN", "obj", "City"),
    ("LIKES", "subj", "Person"),
    ("LIKES", "obj", "Person"),
    ("DISLIKES", "subj", "Person"),
    ("DISLIKES", "obj", "Person"),
)

# predicate → fact type (the deterministic analog of the LLM's
# `fact_type` classification, edge_operations.py:444-462)
DEFAULT_FACT_TYPES: dict[str, str] = {
    "WORKS_AT": "EMPLOYMENT",
    "CEO_OF": "LEADERSHIP",
    "LIVES_IN": "RESIDENCE",
    "LIKES": "SENTIMENT",
    "DISLIKES": "SENTIMENT",
}

# {(src_label, tgt_label): allowed fact types} (graphiti.py:460-465)
DEFAULT_EDGE_TYPE_MAP: dict[tuple[str, str], list[str]] = {
    ("Person", "Organization"): ["EMPLOYMENT", "LEADERSHIP"],
    ("Person", "City"): ["RESIDENCE"],
    ("Person", "Person"): ["SENTIMENT"],
}

DEFAULT_ENTITY_TYPES: dict[str, list[str]] = {
    "Person": ["first_name", "last_name"],
    "Organization": ["ceo"],
    "City": [],
}


def classify_nodes(
    nodes: DataFrame,
    edges: DataFrame,
    label_rules: tuple[tuple[str, str, str], ...] = DEFAULT_LABEL_RULES,
    entity_types: dict[str, list[str]] = DEFAULT_ENTITY_TYPES,
) -> DataFrame:
    """Fill `labels` (["Entity", ...sorted type labels]) and typed
    attributes. Label votes come from edge participation — one union
    of projections + one aggregate + one join, all keyed on the node
    uuid (group-local: edges never cross groups)."""
    validate_entity_types(entity_types)
    votes = None
    for pred, side, label in label_rules:
        col = "source_node_uuid" if side == "subj" else "target_node_uuid"
        v = (
            edges.filter(F.col("name") == pred)
            .select(F.col(col).alias("uuid"), F.lit(label).alias("label"))
        )
        votes = v if votes is None else votes.unionByName(v)
    if votes is None:
        return nodes
    node_labels = votes.groupBy("uuid").agg(
        F.array_sort(F.collect_set("label")).alias("type_labels")
    )
    typed = (
        nodes.join(node_labels, "uuid", "left")
        .withColumn(
            "labels",
            F.concat(
                F.array(F.lit("Entity")),
                F.coalesce("type_labels", F.array().cast("array<string>")),
            ),
        )
        .drop("type_labels")
    )
    # typed attribute fill (E5 analog, node_operations.py:293-378
    # routing): each entity type declared in DEFAULT_ENTITY_TYPES has
    # its own attribute family filled from graph context — Person gets
    # first/last name from the canonical name's tokens, Organization
    # gets its ceo from CEO_OF edge participation (deterministic min
    # over subject names); every typed node records entity_type = first
    # non-Entity label (deterministic: sorted order)
    org_ceo = (
        edges.filter(F.col("name") == "CEO_OF")
        .join(
            nodes.select(
                F.col("uuid").alias("source_node_uuid"), F.col("name").alias("ceo_name")
            ),
            "source_node_uuid",
        )
        .groupBy(F.col("target_node_uuid").alias("uuid"))
        .agg(F.min("ceo_name").alias("ceo"))
    )
    typed = typed.join(org_ceo, "uuid", "left")
    toks = F.split(F.trim(F.col("name")), "\\s+")
    # after "Entity"; null when untyped (try_: Spark 4 element_at throws
    # on out-of-bounds instead of returning null)
    primary = F.try_element_at("labels", F.lit(2))
    typed_attrs = F.when(
        primary == "Person",
        F.map_from_arrays(
            F.array(F.lit("entity_type"), F.lit("first_name"), F.lit("last_name")),
            F.array(
                primary,
                F.element_at(toks, 1),
                F.when(F.size(toks) > 1, F.element_at(toks, -1)).otherwise(F.lit("")),
            ),
        ),
    ).when(
        (primary == "Organization") & F.col("ceo").isNotNull(),
        F.map_from_arrays(
            F.array(F.lit("entity_type"), F.lit("ceo")), F.array(primary, F.col("ceo"))
        ),
    ).when(
        primary.isNotNull(),
        F.map_from_arrays(F.array(F.lit("entity_type")), F.array(primary)),
    )
    return typed.withColumn(
        "attributes",
        F.when(
            typed_attrs.isNotNull() & F.col("attributes").isNotNull(),
            F.map_concat("attributes", typed_attrs),
        )
        .when(typed_attrs.isNotNull(), typed_attrs)
        .otherwise(F.col("attributes")),
    ).drop("ceo")


def exclude_nodes(
    tables: dict[str, DataFrame], excluded_types: list[str]
) -> dict[str, DataFrame]:
    """excluded_entity_types semantics (node_operations.py:145-173):
    nodes classified into an excluded type are dropped along with every
    edge/mention touching them. `tables['nodes']` must already carry
    labels (classify_nodes)."""
    excluded_lit = F.array(*[F.lit(t) for t in excluded_types])
    doomed = tables["nodes"].filter(
        F.arrays_overlap("labels", excluded_lit)
    ).select("uuid")
    nodes = tables["nodes"].join(doomed, "uuid", "left_anti")
    edges = (
        tables["edges"]
        .join(doomed.withColumnRenamed("uuid", "source_node_uuid"), "source_node_uuid", "left_anti")
        .join(doomed.withColumnRenamed("uuid", "target_node_uuid"), "target_node_uuid", "left_anti")
    )
    out = {**tables, "nodes": nodes, "edges": edges}
    if "mentions" in tables:
        out["mentions"] = tables["mentions"].join(
            doomed.withColumnRenamed("uuid", "target_node_uuid"),
            "target_node_uuid",
            "left_anti",
        )
    return out


def type_edges(
    edges: DataFrame,
    typed_nodes: DataFrame,
    edge_type_map: dict[tuple[str, str], list[str]] = DEFAULT_EDGE_TYPE_MAP,
    fact_types: dict[str, str] = DEFAULT_FACT_TYPES,
    edge_types: dict[str, list[str]] | None = None,
) -> DataFrame:
    """edge_type_map routing (edge_operations.py:274-301): join each
    edge to its endpoints' labels; when any (src_label, tgt_label)
    combination allows the fact's classified type, rename the edge to
    the fact type and record {fact_type, predicate} attributes; edges
    with no matching entry keep their extracted predicate name
    (edge_operations.py:444-462 keeps the LLM name in that case)."""
    if edge_types is not None:
        validate_edge_types(edge_types)
    labels = typed_nodes.select("uuid", "labels")
    e = (
        edges.join(
            labels.withColumnRenamed("uuid", "source_node_uuid").withColumnRenamed(
                "labels", "src_labels"
            ),
            "source_node_uuid",
            "left",
        )
        .join(
            labels.withColumnRenamed("uuid", "target_node_uuid").withColumnRenamed(
                "labels", "tgt_labels"
            ),
            "target_node_uuid",
            "left",
        )
    )
    ft = F.lit(None).cast("string")
    for pred, t in sorted(fact_types.items()):
        ft = F.when(F.col("name") == pred, F.lit(t)).otherwise(ft)
    allowed = F.lit(False)
    for (sl, tl), fts in edge_type_map.items():
        allowed = allowed | (
            F.array_contains(F.coalesce("src_labels", F.array().cast("array<string>")), sl)
            & F.array_contains(F.coalesce("tgt_labels", F.array().cast("array<string>")), tl)
            & ft.isin(fts)
        )
    typed_attrs = F.map_from_arrays(
        F.array(F.lit("fact_type"), F.lit("predicate")),
        F.array(ft, F.col("name")),
    )
    return (
        e.withColumn("matched", allowed & ft.isNotNull())
        .withColumn(
            "attributes",
            F.when(
                F.col("matched") & F.col("attributes").isNotNull(),
                F.map_concat("attributes", typed_attrs),
            )
            .when(F.col("matched"), typed_attrs)
            .otherwise(F.col("attributes")),
        )
        .withColumn("name", F.when(F.col("matched"), ft).otherwise(F.col("name")))
        .drop("src_labels", "tgt_labels", "matched")
        .select(edges.columns)
    )
