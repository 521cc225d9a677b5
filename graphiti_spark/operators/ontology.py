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

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
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
    "Person": ["first_name", "last_name", "employer"],
    "Organization": ["ceo"],
    "City": [],
}


# ---------------------------------------------------------------------------
# generic attribute fill (E5): rule table keyed on (type, field)
#
# The reference hydrates *arbitrary* user-declared Pydantic attribute
# fields from episode context (node_operations.py:293-378 routes each
# typed node to a fill call whose response model is the user's type).
# The deterministic analog: a registry mapping (entity_type, field) to
# a fill rule; any field a user declares in `entity_types` is filled
# when a rule exists and left null otherwise (exactly the reference's
# behavior when the LLM returns nothing for a field). Two rule kinds
# cover the contexts the rule-engine extraction exposes:
#
#   * NameDerived — a pure Column function of the node's canonical
#     name (stays inside whole-stage codegen).
#   * EdgeDerived — deterministic min over the names of the OTHER
#     endpoint across edges named `predicate` where this node sits on
#     `node_side` ('subj' | 'obj'). All EdgeDerived rules fold into
#     ONE union + ONE aggregate + ONE left join keyed on the node
#     uuid, regardless of how many rules are registered.


@dataclass(frozen=True)
class NameDerived:
    fn: Callable[[Column], Column]


@dataclass(frozen=True)
class EdgeDerived:
    predicate: str
    node_side: str  # 'subj' | 'obj' — which side the typed node is on


_name_toks = lambda name: F.split(F.trim(name), "\\s+")

DEFAULT_ATTRIBUTE_RULES: dict[tuple[str, str], object] = {
    ("Person", "first_name"): NameDerived(lambda n: F.element_at(_name_toks(n), 1)),
    ("Person", "last_name"): NameDerived(
        lambda n: F.when(
            F.size(_name_toks(n)) > 1, F.element_at(_name_toks(n), -1)
        ).otherwise(F.lit(""))
    ),
    ("Person", "employer"): EdgeDerived("WORKS_AT", "subj"),
    ("Organization", "ceo"): EdgeDerived("CEO_OF", "obj"),
}


def _edge_attr_values(nodes: DataFrame, edges: DataFrame, key: str, rule: EdgeDerived) -> DataFrame:
    """(uuid, key, value): min other-endpoint canonical name per node."""
    uuid_col = "source_node_uuid" if rule.node_side == "subj" else "target_node_uuid"
    other_col = "target_node_uuid" if rule.node_side == "subj" else "source_node_uuid"
    return (
        edges.filter(F.col("name") == rule.predicate)
        .select(uuid_col, other_col)
        .join(
            nodes.select(F.col("uuid").alias(other_col), F.col("name").alias("_v")),
            other_col,
        )
        .groupBy(F.col(uuid_col).alias("uuid"))
        .agg(F.min("_v").alias("value"))
        .select("uuid", F.lit(key).alias("key"), "value")
    )


def classify_nodes(
    nodes: DataFrame,
    edges: DataFrame,
    label_rules: tuple[tuple[str, str, str], ...] = DEFAULT_LABEL_RULES,
    entity_types: dict[str, list[str]] = DEFAULT_ENTITY_TYPES,
    attribute_rules: dict[tuple[str, str], object] = DEFAULT_ATTRIBUTE_RULES,
) -> DataFrame:
    """Fill `labels` (["Entity", ...sorted type labels]) and typed
    attributes. Label votes come from edge participation — one union
    of projections + one aggregate + one join, all keyed on the node
    uuid (group-local: edges never cross groups).

    Attribute fill is generic (E5, node_operations.py:293-378): every
    field a user declares in `entity_types` is filled from the
    matching (type, field) entry in `attribute_rules`; declared fields
    with no rule stay absent from the map (the LLM-returned-nothing
    case). Registering a rule for a brand-new user-declared field —
    e.g. ("Person", "occupation") — makes it fill end-to-end with no
    other code change."""
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
    # typed attribute fill (E5, node_operations.py:293-378 routing):
    # resolve each declared (type, field) against the rule table.
    # All EdgeDerived rules fold into one union → one aggregate → one
    # left join (key "_edge_attrs" map keyed by "Type.field"); null
    # values are map_filter'd out so an unfillable field is simply
    # absent, matching the old per-family when-chain bit-for-bit.
    edge_rules = [
        (t, f, attribute_rules[(t, f)])
        for t, fields in sorted(entity_types.items())
        for f in fields
        if isinstance(attribute_rules.get((t, f)), EdgeDerived)
    ]
    if edge_rules:
        frames = [
            _edge_attr_values(nodes, edges, f"{t}.{f}", rule) for t, f, rule in edge_rules
        ]
        union = frames[0]
        for fr in frames[1:]:
            union = union.unionByName(fr)
        edge_attrs = union.groupBy("uuid").agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("key", "value")))
            ).alias("_edge_attrs")
        )
        typed = typed.join(edge_attrs, "uuid", "left")
    else:
        typed = typed.withColumn("_edge_attrs", F.lit(None).cast("map<string,string>"))

    def _value(tname: str, field: str) -> Column:
        rule = attribute_rules.get((tname, field))
        if rule is None:
            return F.lit(None).cast("string")
        if isinstance(rule, NameDerived):
            return rule.fn(F.col("name"))
        return F.try_element_at("_edge_attrs", F.lit(f"{tname}.{field}"))

    # after "Entity"; null when untyped (try_: Spark 4 element_at throws
    # on out-of-bounds instead of returning null)
    primary = F.try_element_at("labels", F.lit(2))
    typed_attrs = F.when(primary.isNull(), F.lit(None).cast("map<string,string>"))
    for tname, fields in sorted(entity_types.items()):
        keys = [F.lit("entity_type")] + [F.lit(f) for f in fields]
        vals = [primary] + [_value(tname, f) for f in fields]
        typed_attrs = typed_attrs.when(
            primary == tname,
            F.map_filter(F.map_from_arrays(F.array(*keys), F.array(*vals)), lambda k, v: v.isNotNull()),
        )
    # a label with no entity_types declaration still records its type
    typed_attrs = typed_attrs.otherwise(
        F.map_from_arrays(F.array(F.lit("entity_type")), F.array(primary))
    )
    return typed.withColumn(
        "attributes",
        F.when(
            typed_attrs.isNotNull() & F.col("attributes").isNotNull(),
            F.map_concat("attributes", typed_attrs),
        )
        .when(typed_attrs.isNotNull(), typed_attrs)
        .otherwise(F.col("attributes")),
    ).drop("_edge_attrs")


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


def validate_excluded_entity_types(
    excluded_entity_types: list[str] | None,
    entity_types: dict[str, list[str]] | None = None,
) -> bool:
    """Mirror of reference helpers.py:150-181: excluded type names must
    name an available type ('Entity' plus any declared custom types);
    raises ValueError listing the invalid names."""
    if not excluded_entity_types:
        return True
    available = {"Entity"} | set(entity_types or {})
    invalid = set(excluded_entity_types) - available
    if invalid:
        raise ValueError(
            f"Invalid excluded entity types: {sorted(invalid)}. "
            f"Available types: {sorted(available)}"
        )
    return True
