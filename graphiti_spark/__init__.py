"""graphiti_spark — a PySpark-native knowledge-graph construction engine.

From-scratch reimplementation of the *semantics* of jayhansuh/graphiti
(reference at /root/reference, read-only) as declarative DataFrame
dataflow: transcripts → episodes → mention/triple extraction
(Arrow-batched pandas UDFs) → entity canonicalization (blocked pairwise
scoring + iterative connected components) → bi-temporal edge
resolution/invalidation → partitioned merge materialization → hybrid
search (BM25 / cosine / BFS + rerankers).

Nothing here is copied from the reference: the reference is an
asyncio + Neo4j/Cypher orchestration library; this engine is a Spark
job DAG. Reference file:line citations appear in docstrings so parity
can be audited.
"""

__version__ = "0.1.0"
