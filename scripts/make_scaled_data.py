"""Deterministic scale-up of the driver testdata for at-scale benching
(VERDICT r4 #2: bench the flagships at sf1 = 10x sf0.1).

The driver ships sf{0.001,0.01,0.1} read-only; this script tiles
sf0.1 by an integer factor into a repo-local directory (never touching
/root/testdata), preserving the statistical shape that matters to each
flagship:

- events: replica r offsets event_id/user_id by r * (max+1) — per-user
  conversation lengths, turn templates (user_id%8 / event_id%8 derive
  the text), and timestamps are preserved per replica, so kg_pipeline
  sees 10x conversations of identical shape.
- documents: replica r > 0 suffixes every whitespace token with "xr{r}"
  — token/shingle/k-gram structure WITHIN a replica is bit-identical
  (duplicate families, span dups, Zipf token curve all preserved), and
  no token is shared ACROSS replicas, so near-dup cluster sizes do not
  inflate with the tiling factor and pair counts scale exactly
  linearly. No RNG anywhere: a re-run writes identical bytes.
- embeddings: replica r rotates each vector by r dimensions — norms and
  within-replica pairwise cosines unchanged; cross-replica cosines
  decorrelate.

Usage: python scripts/make_scaled_data.py [factor] [src_dir] [out_dir]
defaults: 10 /root/testdata/sf0.1 /root/repo/.data/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graphiti_spark.session import get_spark  # noqa: E402


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.data/sf1"
    spark = get_spark(app_name="make_scaled_data", master="local[32]",
                      shuffle_partitions=32)
    reps = spark.range(factor).select(F.col("id").alias("_r"))

    ev = spark.read.parquet(f"{src}/events.parquet")
    e_span, u_span = [
        r + 1 for r in ev.agg(F.max("event_id"), F.max("user_id")).first()
    ]
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("_r") * e_span).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("_r") * u_span).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32, "user_id")
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )

    docs = spark.read.parquet(f"{src}/documents.parquet")
    d_span = docs.agg(F.max("doc_id")).first()[0] + 1
    suffixed = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.concat(t, F.lit("xr"), F.col("_r").cast("string")),
        ),
        " ",
    )
    new_text = F.when(F.col("_r") == 0, F.col("text")).otherwise(suffixed)
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_r") * d_span).alias("doc_id"),
            new_text.alias("text"),
            "lang",
            "source",
            F.length(new_text).cast(docs.schema["n_chars"].dataType).alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )

    embs = spark.read.parquet(f"{src}/embeddings.parquet")
    v_span = embs.agg(F.max("vec_id")).first()[0] + 1
    dim = len(embs.first()["embedding"])
    rotated = F.concat(
        F.slice(F.col("embedding"), (F.col("_r") % dim) + 1, F.lit(dim)),
        F.slice(F.col("embedding"), F.lit(1), F.col("_r") % dim),
    )
    (
        embs.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("_r") * v_span).alias("vec_id"),
            rotated.alias("embedding"),
            "label",
        )
        .repartition(8)
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )

    for t in ("events", "documents", "embeddings"):
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
