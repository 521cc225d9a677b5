"""Table schemas for the bi-temporal property graph.

Mirrors the reference's Pydantic models (graphiti_core/nodes.py:81-157,
265-270, 399-401; graphiti_core/edges.py:44-49, 79-92, 169-188,
344-357) as explicit Spark StructTypes. Dynamic attribute bags are
map<string,string> (Arrow round-trips cleanly through pandas UDFs).
"""

from __future__ import annotations

from pyspark.sql import types as T

EMBEDDING_DIM = 64  # sandbox dim; reference uses 1024 (embedder/client.py:22)

# Primary input — BASELINE.json input_hint shape.
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# EpisodicNode — reference nodes.py:147-157.
EPISODES = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("source", T.StringType(), True),  # EpisodeType: message|json|text
        T.StructField("source_description", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("valid_at", T.TimestampType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("entity_edges", T.ArrayType(T.StringType()), True),
    ]
)

# EntityNode — reference nodes.py:265-270.
NODES = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("labels", T.ArrayType(T.StringType()), True),
        T.StructField("summary", T.StringType(), True),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("name_embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# EntityEdge (RELATES_TO triples, bi-temporal) — reference edges.py:169-188.
EDGES = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("source_node_uuid", T.StringType(), False),
        T.StructField("target_node_uuid", T.StringType(), False),
        T.StructField("name", T.StringType(), True),  # predicate, SCREAMING_SNAKE_CASE
        T.StructField("fact", T.StringType(), True),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("episodes", T.ArrayType(T.StringType()), True),  # provenance
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("expired_at", T.TimestampType(), True),  # transaction time
        T.StructField("valid_at", T.TimestampType(), True),  # event time
        T.StructField("invalid_at", T.TimestampType(), True),
        T.StructField("fact_embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# EpisodicEdge (MENTIONS) — reference edges.py:79-92.
MENTIONS = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("source_node_uuid", T.StringType(), False),  # episode uuid
        T.StructField("target_node_uuid", T.StringType(), False),  # entity uuid
        T.StructField("group_id", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# CommunityNode / CommunityEdge — reference nodes.py:399-401, edges.py:344-357.
COMMUNITIES = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("summary", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

COMMUNITY_MEMBERSHIP = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("source_node_uuid", T.StringType(), False),  # community uuid
        T.StructField("target_node_uuid", T.StringType(), False),  # entity uuid
        T.StructField("group_id", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# uuid_map — canonicalization output (reference bulk_utils.py:377-414).
UUID_MAP = T.StructType(
    [
        T.StructField("raw_uuid", T.StringType(), False),
        T.StructField("canonical_uuid", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
    ]
)

# Per-stage, per-partition lineage & metrics sidecar (north rule: resumability).
LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("group_bucket", T.IntegerType(), False),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("triple_count", T.LongType(), True),
        T.StructField("wall_sec", T.DoubleType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)
