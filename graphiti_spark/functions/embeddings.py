"""Deterministic local embeddings + vector math (SURVEY §1.3, §2.9 F3/F4).

The reference calls a remote embedder (embedder/client.py:29-37,
dim 1024) and L2-normalizes at use (helpers.py:104-107). The sandbox
stand-in is a feature-hashed character-trigram embedding (crc32 —
process-stable, seed-free) computed in an Arrow-batched pandas UDF,
L2-normalized at creation so cosine == dot product. Pluggable: any
pandas_udf text→array<float> with the same signature slots in
(EmbedderClient contract, §2.12).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphiti_spark.schemas import EMBEDDING_DIM


def embed_texts_np(texts: pd.Series, dim: int = EMBEDDING_DIM) -> np.ndarray:
    """(n,) strings → (n, dim) float32, L2-normalized.

    Memoized per batch: the trigram loop runs once per *unique* string
    (entity names and templated facts are heavily repeated — Zipf — so
    this alone cuts UDF time by orders of magnitude on KG columns)."""
    vals = texts.fillna("").str.lower().to_numpy(dtype=object)
    uniq, inv = np.unique(vals, return_inverse=True)
    out = np.zeros((len(uniq), dim), dtype=np.float64)
    for i, t in enumerate(uniq):
        s = f"  {t} "  # pad so 1-2 char names still yield trigrams
        for j in range(len(s) - 2):
            h = zlib.crc32(s[j : j + 3].encode("utf-8"))
            out[i, h % dim] += 1.0 if (h >> 16) & 1 else -1.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out[inv].astype(np.float32)


@F.pandas_udf(T.ArrayType(T.FloatType()))
def embed_udf(texts: pd.Series) -> pd.Series:
    return pd.Series(list(embed_texts_np(texts)))


def attach_embedding(df, source_col: str, out_col: str):
    """Embed the DISTINCT values of `source_col` and join back — the
    embedding stage then does work proportional to the *vocabulary*,
    not the row count. The distinct side is usually far below the
    broadcast threshold, so the join back is a broadcast hash join (AQE
    demotes to shuffle join if a real corpus has a huge vocabulary, in
    which case distinct-first still caps repeated UDF work). Newlines
    are stripped pre-embedding (F8, nodes.py:274 / edges.py:193)."""
    key = f"__k_{out_col}"
    with_key = df.withColumn(
        key, F.regexp_replace(F.coalesce(F.col(source_col), F.lit("")), "\n", " ")
    )
    distinct = with_key.select(key).distinct().withColumn(out_col, embed_udf(F.col(key)))
    return with_key.join(distinct, key).drop(key)


def normalize_l2(col: Column) -> Column:
    """F3 — zero-safe L2 normalization as a builtin expression."""
    norm = F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when(norm > 0, F.transform(col, lambda x: x / norm)).otherwise(col)


def dot(a: Column, b: Column) -> Column:
    """F4 — cosine on pre-normalized vectors, JVM-side (no UDF)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def sim_bands_multi(col: Column, n_bits: int = 4, n_bands: int = 8) -> Column:
    """OR-amplified random-hyperplane LSH: `n_bands` band keys, band j
    reading sign bits from dims [j*n_bits, (j+1)*n_bits). Two vectors
    collide when ANY band key matches (explode + equi-join), so pair
    recall is 1-(1-p^n_bits)^n_bands for per-bit agreement p = 1-θ/π —
    the banding trick MinHash-LSH uses, applied to sign bits. Candidate
    volume per band is Σ bucket² with 2^n_bits buckets; scale n_bits
    with log(corpus) to keep buckets bounded. Returns array<string>
    of 'band:bucket' keys; requires n_bits*n_bands ≤ dim."""
    bands = []
    for j in range(n_bands):
        def bit(i: int, base: int = j * n_bits):
            return F.when(
                F.element_at(col, base + i + 1) >= 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
        expr = bit(0)
        for i in range(1, n_bits):
            expr = expr + bit(i)
        bands.append(F.concat_ws(":", F.lit(str(j)), expr.cast("string")))
    return F.array(*bands)


def sim_bands(col: Column, n_bits: int = 8) -> Column:
    """Random-hyperplane sign bucket for LSH blocking of cosine joins:
    vectors with cosine ≥ ~0.8 mostly agree on leading-dimension signs.
    Uses the first `n_bits` dimensions as the (deterministic) projection
    basis — adequate for hash embeddings whose dims are exchangeable."""
    bit = lambda i: F.when(F.element_at(col, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    expr = bit(0)
    for i in range(1, n_bits):
        expr = expr + bit(i)
    return expr
