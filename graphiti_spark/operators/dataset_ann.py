"""Similarity search over embedding columns (training-data ops).

Brute-force cosine top-k is the correctness baseline; the scale path
is an LSH-bucketed variant (sign-band blocking) that turns the O(n·q)
scan into an equi-join on bucket — the same blocking idea the
reference applies before LLM compares (bulk_utils.py:226-243). All
JVM-side: dot products via zip_with/aggregate on array<float>, no
Python in the hot path. A vectorized pandas-UDF matmul variant is
provided for wide embeddings where Arrow + BLAS beats codegen'd
per-element folds.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.functions import embeddings as emb


def cosine_topk_bruteforce(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Single-query exact top-k: full scan + TakeOrderedAndProject."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    qcol = F.array(*[F.lit(float(x)) for x in q])
    return (
        vectors.withColumn(
            "score", emb.dot(emb.normalize_l2(F.col(vec_col).cast("array<double>")), qcol)
        )
        .select(id_col, "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_join(
    queries: DataFrame,
    index: DataFrame,
    k: int = 10,
    query_id: str = "qid",
    index_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe exact top-k per query: broadcast the smaller side,
    per-probe window top-k (J1-style)."""
    qn = queries.select(
        F.col(query_id), emb.normalize_l2(F.col(vec_col).cast("array<double>")).alias("qv")
    )
    iv = index.select(
        F.col(index_id), emb.normalize_l2(F.col(vec_col).cast("array<double>")).alias("iv")
    )
    joined = iv.crossJoin(F.broadcast(qn)).withColumn("score", emb.dot(F.col("qv"), F.col("iv")))
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(index_id))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, index_id, "score", "rn")
    )


def lsh_bucket_topk(
    queries: DataFrame,
    index: DataFrame,
    k: int = 10,
    n_bits: int = 4,
    n_bands: int = 12,
    query_id: str = "qid",
    index_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: OR-amplified sign-band bucket equi-join
    instead of a cross join — the 100 TB path. Each vector gets
    `n_bands` band keys of `n_bits` sign bits (functions.embeddings.
    sim_bands_multi); a probe meets an index vector when ANY band key
    matches, so per-probe candidates ≈ n_bands·n/2^n_bits and recall is
    1-(1-p^n_bits)^n_bands per neighbor — measured against the exact
    top-k by the pytest gate. Scale n_bits with log(corpus) to keep
    buckets bounded; candidate pairs are deduped before the per-probe
    window top-k."""
    qn = queries.select(
        F.col(query_id), emb.normalize_l2(F.col(vec_col).cast("array<double>")).alias("qv")
    ).withColumn("bucket", F.explode(emb.sim_bands_multi(F.col("qv"), n_bits, n_bands)))
    iv = index.select(
        F.col(index_id), emb.normalize_l2(F.col(vec_col).cast("array<double>")).alias("iv")
    ).withColumn("bucket", F.explode(emb.sim_bands_multi(F.col("iv"), n_bits, n_bands)))
    joined = (
        iv.join(F.broadcast(qn), "bucket")
        .select(query_id, index_id, "qv", "iv")
        .dropDuplicates([query_id, index_id])
        .withColumn("score", emb.dot("qv", "iv"))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(index_id))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, index_id, "score", "rn")
    )


def cosine_topk_pandas(
    vectors: DataFrame,
    query_vecs: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched matmul variant: each partition does one BLAS GEMM
    against the broadcast query matrix, emits its local top-k, then a
    global window keeps the true top-k (exact, two-phase like
    TakeOrdered). Preferred when dim ≥ ~256."""
    spark = vectors.sparkSession
    qm = np.asarray(query_vecs, dtype=np.float32)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    bq = spark.sparkContext.broadcast(qm)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q = bq.value
        for pdf in batches:
            m = np.stack(pdf[vec_col].values).astype(np.float32)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            scores = m @ q.T  # (n, nq)
            outs = []
            for qi in range(q.shape[0]):
                s = scores[:, qi]
                top = np.argsort(-s)[:k]
                outs.append(
                    pd.DataFrame({"qid": qi, id_col: pdf[id_col].values[top], "score": s[top]})
                )
            yield pd.concat(outs, ignore_index=True)

    local = vectors.select(id_col, vec_col).mapInPandas(
        part, schema=f"qid long, {id_col} long, score double"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc(id_col))
    return local.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
