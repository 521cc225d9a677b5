"""Typed entities/edges + exclusion (reference entity_types /
edge_type_map semantics; tests/test_entity_exclusion_int.py analog)."""

from __future__ import annotations

import pandas as pd
import pytest

from graphiti_spark.operators import ontology as ont
from graphiti_spark.plans import pipeline as pl

TS = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _tdf(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "ts"])
    pdf["tool"] = ""
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(
        pdf[["conv_id", "turn_idx", "role", "text", "tool", "ts"]], schema=TS
    )


@pytest.fixture(scope="module")
def typed_tables(spark):
    t = _tdf(
        spark,
        [
            ("c1", 0, "user", "Alice works at Acme.", "2025-01-01 00:00:00"),
            ("c1", 1, "user", "Alice moved to Paris.", "2025-01-01 00:01:00"),
            ("c1", 2, "user", "Bob is the CEO of Globex.", "2025-01-01 00:02:00"),
            ("c1", 3, "user", "Alice likes Bob.", "2025-01-01 00:03:00"),
        ],
    )
    tables = pl.build_graph(t, with_embeddings=False)
    nodes = ont.classify_nodes(tables["nodes"], tables["edges"])
    # nodes_raw: pre-classification nodes for tests that re-classify
    # with custom rules (classify_nodes must see unclassified input —
    # attributes may not already carry entity_type)
    return {**tables, "nodes": nodes, "nodes_raw": tables["nodes"]}


def test_validation_rejects_protected_shadow():
    with pytest.raises(ont.EntityTypeValidationError):
        ont.validate_entity_types({"Person": ["uuid"]})
    with pytest.raises(ont.EntityTypeValidationError):
        ont.validate_edge_types({"EMPLOYMENT": ["fact"]})
    ont.validate_entity_types({"Person": ["first_name"]})  # fine


def test_classify_nodes_labels_and_attributes(typed_tables):
    n = typed_tables["nodes"].toPandas().set_index("name")
    assert list(n.loc["Alice", "labels"]) == ["Entity", "Person"]
    assert list(n.loc["Acme", "labels"]) == ["Entity", "Organization"]
    assert list(n.loc["Paris", "labels"]) == ["Entity", "City"]
    # Bob is both subject (CEO_OF → Person) and object of LIKES → Person
    assert list(n.loc["Bob", "labels"]) == ["Entity", "Person"]
    # untyped mention (speaker role) keeps bare Entity
    assert list(n.loc["user", "labels"]) == ["Entity"]
    attrs = n.loc["Alice", "attributes"]
    assert attrs["entity_type"] == "Person"
    assert attrs["first_name"] == "Alice" and attrs["last_name"] == ""
    # Organization attribute family (E5 breadth): ceo filled from
    # CEO_OF edge participation; an org without a CEO_OF edge has none
    g_attrs = n.loc["Globex", "attributes"]
    assert g_attrs["entity_type"] == "Organization"
    assert g_attrs["ceo"] == "Bob"
    a_attrs = n.loc["Acme", "attributes"]
    assert a_attrs["entity_type"] == "Organization"
    assert "ceo" not in a_attrs
    # EdgeDerived Person.employer: Alice WORKS_AT Acme; Bob doesn't work
    assert attrs["employer"] == "Acme"
    assert "employer" not in n.loc["Bob", "attributes"]


def test_user_declared_attribute_rule(typed_tables, spark):
    """VERDICT r3 #5: a brand-new user-declared (type, field) fills
    end-to-end once a rule is registered — no per-family code."""
    from pyspark.sql import functions as F

    tables = typed_tables
    rules = {
        **ont.DEFAULT_ATTRIBUTE_RULES,
        # name-derived custom field
        ("Person", "monogram"): ont.NameDerived(lambda nm: F.upper(F.substring(nm, 1, 1))),
        # edge-derived custom field on a new side: City.notable_resident
        ("City", "notable_resident"): ont.EdgeDerived("LIVES_IN", "obj"),
    }
    types = {
        "Person": ["first_name", "last_name", "employer", "monogram", "occupation"],
        "Organization": ["ceo"],
        "City": ["notable_resident"],
    }
    n = (
        ont.classify_nodes(tables["nodes_raw"], tables["edges"], entity_types=types,
                           attribute_rules=rules)
        .toPandas()
        .set_index("name")
    )
    attrs = n.loc["Alice", "attributes"]
    assert attrs["monogram"] == "A"
    # declared but no rule → absent (reference: LLM returned nothing)
    assert "occupation" not in attrs
    assert n.loc["Paris", "attributes"]["notable_resident"] == "Alice"


def test_type_edges_rename_and_routing(typed_tables):
    typed = ont.type_edges(typed_tables["edges"], typed_tables["nodes"]).toPandas()
    by_fact = typed.set_index("fact")["name"].to_dict()
    assert by_fact["Alice works at Acme"] == "EMPLOYMENT"
    assert by_fact["Bob is the CEO of Globex"] == "LEADERSHIP"
    assert by_fact["Alice lives in Paris"] == "RESIDENCE"
    assert by_fact["Alice likes Bob"] == "SENTIMENT"
    emp = typed[typed["name"] == "EMPLOYMENT"].iloc[0]
    assert emp["attributes"]["fact_type"] == "EMPLOYMENT"
    assert emp["attributes"]["predicate"] == "WORKS_AT"

    # a map without (Person, City) leaves RESIDENCE unrenamed
    partial = ont.type_edges(
        typed_tables["edges"],
        typed_tables["nodes"],
        edge_type_map={("Person", "Organization"): ["EMPLOYMENT", "LEADERSHIP"]},
    ).toPandas()
    assert partial.set_index("fact")["name"]["Alice lives in Paris"] == "LIVES_IN"


def test_excluded_entity_types(typed_tables):
    out = ont.exclude_nodes(typed_tables, ["Organization"])
    names = set(out["nodes"].toPandas()["name"])
    assert "Acme" not in names and "Globex" not in names
    assert "Alice" in names and "Paris" in names
    preds = set(out["edges"].toPandas()["name"])
    # edges touching excluded orgs dropped; others survive
    assert "WORKS_AT" not in preds and "CEO_OF" not in preds
    assert {"LIVES_IN", "LIKES"} <= preds
