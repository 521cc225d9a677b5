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


def _train_coarse_centroids(
    index: DataFrame,
    n_centroids: int,
    train_sample: int,
    iters: int,
    index_id: str,
    vec_col: str,
) -> np.ndarray:
    """Lloyd k-means on a bounded, deterministic sample (driver-side
    numpy) — the IVF coarse-quantizer training step. At 100 TB the
    quantizer is still trained on a sample of this size (standard IVF
    practice: the codebook must fit in memory and be broadcast), so the
    driver-side cost is constant in corpus size; `orderBy(id).limit(n)`
    plans as TakeOrderedAndProject, not a full sort. Spherical variant:
    vectors live on the unit sphere, assignment maximizes dot product,
    recomputed means are re-normalized."""
    rows = index.select(index_id, vec_col).orderBy(index_id).limit(train_sample).collect()
    X = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n_centroids = min(n_centroids, len(X))
    # deterministic init: evenly strided sample rows (no RNG — scripts
    # must stay reproducible across runs/resumes)
    C = X[np.linspace(0, len(X) - 1, n_centroids).astype(int)].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for ci in range(n_centroids):
            members = X[assign == ci]
            if len(members):  # empty cluster keeps its old centroid
                m = members.mean(axis=0)
                C[ci] = m / max(np.linalg.norm(m), 1e-12)
    return C.astype(np.float32)


def _assign_clusters(
    df: DataFrame, bc_codebook, id_name: str, nprobe: int, vec_col: str
) -> DataFrame:
    """(id, vec) → (id, cluster, v): each vector L2-normalized and
    assigned to its `nprobe` nearest broadcast-codebook centroids — one
    Arrow-batched GEMM per partition, no shuffle. Shared by ivf_topk
    (index/query assignment) and semdedup_pairs (cluster blocking)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cv = bc_codebook.value
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf[vec_col].values).astype(np.float32)
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            S = M @ Cv.T
            p = min(nprobe, S.shape[1])
            top = np.argsort(-S, axis=1)[:, :p]  # (n, p) cluster ids
            yield pd.DataFrame(
                {
                    id_name: np.repeat(pdf[id_name].values, p),
                    "cluster": top.ravel().astype(np.int32),
                    "v": np.repeat(list(M), p, axis=0).tolist(),
                }
            )

    return df.select(id_name, vec_col).mapInPandas(
        fn, schema=f"{id_name} long, cluster int, v array<float>"
    )


def semdedup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    n_probe: int = 1,
    train_sample: int = 4096,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup blocked by k-means
    clusters — candidate pairs exist only WITHIN a vector's coarse
    cluster(s), and pairs with cosine ≥ threshold come back as
    (src, dst, cos) with src < dst, the same shape as
    `dataset_dedup.embedding_dup_pairs`, so `dedup_resolve` composes
    for keep/drop verdicts. `n_probe > 1` assigns each vector to
    several nearest clusters, recovering pairs that straddle a cluster
    boundary at proportional candidate cost.

    Scale shape: codebook trained on a bounded deterministic sample
    (driver cost constant in corpus size), assignment is a broadcast-
    codebook GEMM per partition (no shuffle), and the quadratic is
    bounded per cluster by a cluster-keyed self-equi-join — with
    n_centroids ~ corpus/target_cluster_size the pair space is
    O(Σ cluster²), the published SemDeDup recipe, vs the exact path's
    O(n²). Recall vs the exact pairs is pytest-gated, not asserted.
    """
    C = _train_coarse_centroids(vectors, n_centroids, train_sample, iters, id_col, vec_col)
    bc = vectors.sparkSession.sparkContext.broadcast(C)
    assigned = _assign_clusters(vectors, bc, id_col, n_probe, vec_col)

    # Within-cluster scoring as one block-wise BLAS GEMM per cluster
    # (applyInPandas) instead of a self-join with an interpreted
    # zip_with fold — higher-order array functions don't enter codegen,
    # and on a 1k-member cluster the GEMM is ~15× faster. Row blocks of
    # 1024 cap peak memory at O(block × cluster) scores; per-group
    # memory is cluster_size × dim, which the n_centroids sizing rule
    # (~corpus / target_cluster_size) already bounds. float64 GEMM so
    # the threshold compare matches the exact baseline's double math.
    def score_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        M = np.stack(pdf["v"].to_numpy()[order]).astype(np.float64)
        srcs: list[np.ndarray] = []
        dsts: list[np.ndarray] = []
        coss: list[np.ndarray] = []
        B = 1024
        for s0 in range(0, len(ids), B):
            S = M[s0 : s0 + B] @ M.T  # vectors arrive normalized
            for r in range(S.shape[0]):
                i = s0 + r
                js = np.nonzero(S[r, i + 1 :] >= threshold)[0] + i + 1
                if len(js):
                    srcs.append(np.full(len(js), ids[i]))
                    dsts.append(ids[js])
                    coss.append(np.round(S[r, js], 4))
        if not srcs:
            return pd.DataFrame({"src": [], "dst": [], "cos": []}).astype(
                {"src": "int64", "dst": "int64", "cos": "float64"}
            )
        return pd.DataFrame(
            {
                "src": np.concatenate(srcs),
                "dst": np.concatenate(dsts),
                "cos": np.concatenate(coss),
            }
        )

    pairs = assigned.groupBy("cluster").applyInPandas(
        score_cluster, schema="src long, dst long, cos double"
    )
    # multi-probe can surface a pair in several shared clusters; the
    # score is deterministic, so distinct() folds the copies
    return pairs.dropDuplicates(["src", "dst"]) if n_probe > 1 else pairs


def ivf_topk(
    queries: DataFrame,
    index: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_sample: int = 4096,
    iters: int = 10,
    query_id: str = "qid",
    index_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer —
    the second scale path next to `lsh_bucket_topk`. Each index vector
    is assigned to its nearest of `n_centroids` broadcast centroids
    (one Arrow-batched GEMM per partition, no shuffle); each query
    probes its `n_probe` nearest lists. Candidate generation is then a
    bucket equi-join on cluster id and the final scores are exact
    cosine within the probed lists, so recall is governed by
    n_probe/n_centroids (pytest recall gate vs the exact top-k).

    Sizing at scale: n_centroids ~ sqrt(corpus) keeps lists ~sqrt(n)
    rows; per-probe candidates = n_probe·n/n_centroids vs the brute
    scan's n. Skewed lists (natural clusters) are shuffle-side AQE
    territory; the join's probe side is broadcast."""
    spark = index.sparkSession
    C = _train_coarse_centroids(index, n_centroids, train_sample, iters, index_id, vec_col)
    bc = spark.sparkContext.broadcast(C)

    iv = _assign_clusters(index, bc, index_id, 1, vec_col)
    qv = _assign_clusters(queries, bc, query_id, n_probe, vec_col)
    joined = (
        iv.join(F.broadcast(qv.withColumnRenamed("v", "qv")), "cluster")
        .dropDuplicates([query_id, index_id])  # a pair can meet in several probed lists
        .withColumn(
            "score", emb.dot(F.col("v").cast("array<double>"), F.col("qv").cast("array<double>"))
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(index_id))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, index_id, "score", "rn")
    )


def centroid_outliers(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
) -> DataFrame:
    """Embedding-space outlier scoring per group: the exact mean
    centroid of each group's vectors, then every vector's cosine to its
    own group centroid — the SemDeDup-adjacent curation analytic (low
    ``centroid_sim`` = off-cluster sample worth inspecting/dropping;
    also the drift monitor when groups are sources or time buckets).

    Scale shape: posexplode → groupBy(group, pos) mean with map-side
    partial combine, so the shuffle carries #groups × dim rows
    regardless of corpus size; the rebuilt centroid table (one array
    per group) is broadcast back and the cosine is a JVM-side
    zip_with/aggregate fold — the fact table is never shuffled. No
    UDFs, fully codegen'd.
    """
    v = vectors.select(
        id_col,
        group_col,
        F.transform(vec_col, lambda x: x.cast("double")).alias("_v"),
    )
    cent = (
        v.select(group_col, F.posexplode("_v").alias("_pos", "_val"))
        .groupBy(group_col, "_pos")
        .agg(F.avg("_val").alias("_c"))
        .groupBy(group_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_c"))), lambda s: s["_c"]
            ).alias("_cvec")
        )
    )
    sim = emb.dot(emb.normalize_l2(F.col("_v")), emb.normalize_l2(F.col("_cvec")))
    return (
        v.join(F.broadcast(cent), group_col)
        .select(id_col, group_col, F.round(sim, 4).alias("centroid_sim"))
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
