"""Cross-batch resolution against the existing graph (graphiti.py:
722-812 semantics): alias surfaces arriving in later batches/runs must
merge onto the node the graph already holds."""

from __future__ import annotations

import pandas as pd
import pytest

from graphiti_spark import ids
from graphiti_spark.operators import graph_resolution as gr
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


def test_match_existing_and_extend(spark):
    entities = spark.createDataFrame(
        [
            ("c1", "u_alice_smith", "Alice Smith"),
            ("c1", "u_alice_q_smith", "Alice Q. Smith"),
            ("c1", "u_bob", "Bob"),
            ("c2", "u_alice2", "Alice"),  # other group: must not match c1
        ],
        "group_id string, entity_uuid string, entity_name string",
    )
    existing = spark.createDataFrame(
        [
            ("e_alice", "Alice", "c1"),
            ("e_carol", "Carol", "c1"),
        ],
        "uuid string, name string, group_id string",
    )
    m = gr.match_existing(entities, existing).toPandas()
    got = dict(zip(m["raw_uuid"], m["existing_uuid"]))
    # both Smith surfaces match existing "Alice" via the alias subset
    # rule; Bob matches nothing; c2's Alice is group-isolated
    assert got == {"u_alice_smith": "e_alice", "u_alice_q_smith": "e_alice"}

    # within-batch component (Alice Smith ≡ Alice Q. Smith) remaps as a
    # whole when any surface matches the graph
    uuid_map = spark.createDataFrame(
        [("u_alice_q_smith", "u_alice_smith", "c1")],
        "raw_uuid string, canonical_uuid string, group_id string",
    )
    matches = gr.match_existing(entities, existing)
    ext = gr.extend_uuid_map(uuid_map, entities, matches).toPandas()
    composed = dict(zip(ext["raw_uuid"], ext["canonical_uuid"]))
    assert composed == {
        "u_alice_smith": "e_alice",
        "u_alice_q_smith": "e_alice",
    }


def test_exact_match_outranks_alias(spark):
    entities = spark.createDataFrame(
        [("c1", "u_a", "Alice")],
        "group_id string, entity_uuid string, entity_name string",
    )
    # "AAA Alice Johnson" would sort before the exact node by uuid — the
    # exact-name match must still win
    existing = spark.createDataFrame(
        [("aaa_johnson", "Alice Johnson", "c1"), ("zzz_alice", "Alice", "c1")],
        "uuid string, name string, group_id string",
    )
    m = gr.match_existing(entities, existing).toPandas()
    assert dict(zip(m["raw_uuid"], m["existing_uuid"])) == {"u_a": "zzz_alice"}


def test_cross_batch_alias_merges(spark, tmp_path):
    out = str(tmp_path / "graph")
    batch1 = _tdf(
        spark,
        [
            ("c1", 0, "user", "Alice works at Acme.", "2025-01-01 00:00:00"),
            ("c1", 1, "user", "Carol likes Dave.", "2025-01-01 00:01:00"),
        ],
    )
    batch2 = _tdf(
        spark,
        [("c1", 2, "user", "Alice Smith moved to Paris.", "2025-01-02 00:00:00")],
    )
    pl.run_pipeline(spark, batch1, out, run_id="b1")
    pl.run_pipeline(spark, batch2, out, run_id="b2")

    alice_uuid = ids.py_entity_uuid("c1", "Alice")
    nodes = spark.read.parquet(f"{out}/nodes.parquet").toPandas()
    names = set(nodes["name"])
    # one merged node: batch 2's "Alice Smith" resolved onto batch 1's node
    assert "Alice" in names and "Alice Smith" not in names
    alice = nodes[nodes["name"] == "Alice"].iloc[0]
    assert alice["uuid"] == alice_uuid
    # alias surface recorded on the merged node
    assert "Alice Smith" in alice["summary"]

    edges = spark.read.parquet(f"{out}/edges.parquet").toPandas()
    moved = edges[edges["name"] == "LIVES_IN"].iloc[0]
    assert moved["source_node_uuid"] == alice_uuid
    assert moved["subj_name"] == "Alice Smith"  # surface text preserved

    # uuid_map extension row materialized for the cross-batch alias
    um = spark.read.parquet(f"{out}/uuid_map.parquet").toPandas()
    smith_uuid = ids.py_entity_uuid("c1", "Alice Smith")
    assert dict(zip(um["raw_uuid"], um["canonical_uuid"])).get(smith_uuid) == alice_uuid


def test_reingest_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "graph")
    batch = _tdf(
        spark,
        [
            ("c1", 0, "user", "Alice works at Acme.", "2025-01-01 00:00:00"),
            ("c1", 1, "user", "Alice Smith moved to Paris.", "2025-01-01 00:01:00"),
        ],
    )
    pl.run_pipeline(spark, batch, out, run_id="b1")
    n1 = spark.read.parquet(f"{out}/nodes.parquet").toPandas()
    e1 = spark.read.parquet(f"{out}/edges.parquet").toPandas()
    # replay the same batch under a new run_id: resolve-vs-existing must
    # map every node onto itself — no growth, no renames
    pl.run_pipeline(spark, batch, out, run_id="b2")
    n2 = spark.read.parquet(f"{out}/nodes.parquet").toPandas()
    e2 = spark.read.parquet(f"{out}/edges.parquet").toPandas()
    assert sorted(n1["uuid"]) == sorted(n2["uuid"])
    assert dict(zip(n1["uuid"], n1["name"])) == dict(zip(n2["uuid"], n2["name"]))
    assert sorted(e1["uuid"]) == sorted(e2["uuid"])
