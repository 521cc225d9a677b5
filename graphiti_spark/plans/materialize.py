"""Idempotent partitioned merge materialization (SURVEY §2.1 S3-S6).

The reference upserts row-by-row with Cypher `MERGE (n {uuid}) SET ...`
(models/nodes/node_db_queries.py:21-35, edge_db_queries.py:65-86) in
one transaction (bulk_utils.py:84-165). Spark-side the analog is
Iceberg/Delta `MERGE INTO` keyed on uuid; those catalogs aren't in
this sandbox image, so `merge_parquet` emulates MERGE with
updates-win anti-join + union and an atomic directory swap. Content-
derived uuids (ids.py) make the merge idempotent: re-running a batch
rewrites identical rows.

Tables are partitioned by `group_bucket = pmod(xxhash64(group_id), N)`
— at 10^12-turn scale this bounds partition count while keeping one
group's data co-located for the per-group joins; `valid_at` stays
sorted within files for min/max skipping (Z-order analog).

Every write appends a (run_id, stage, group_bucket, row_count,
triple_count, wall_sec) row per partition to the lineage sidecar —
the north rule's per-partition lineage + metrics; `resume` checks a
stage's _SUCCESS sentinel so any stage is restartable.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 32


def with_group_bucket(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    return df.withColumn(
        "group_bucket", F.pmod(F.xxhash64(F.col("group_id")), F.lit(n_buckets)).cast("int")
    )


def merge_parquet(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key: str = "uuid",
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """MERGE INTO emulation: updates win on `key`; atomic swap."""
    updates = with_group_bucket(updates.dropDuplicates([key]), n_buckets)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        kept = existing.join(updates.select(key), key, "left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    tmp = f"{path}.tmp-{_uuid.uuid4().hex[:8]}"
    if merged.isEmpty():
        # a partitioned write of an empty frame emits no schema footer;
        # write unpartitioned so the table stays readable
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    else:
        merged.write.mode("overwrite").partitionBy("group_bucket").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def record_lineage(
    spark: SparkSession,
    lineage_path: str,
    run_id: str,
    stage: str,
    df: DataFrame,
    wall_sec: float,
    triple_col: str | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
) -> int:
    """Append per-partition (group_bucket) row/triple counts for `stage`.
    Returns total rows (the action that materializes the stage)."""
    agg = [F.count(F.lit(1)).alias("row_count")]
    agg.append(
        (F.count(triple_col) if triple_col else F.count(F.lit(1))).alias("triple_count")
    )
    per_part = (
        with_group_bucket(df, n_buckets)
        .groupBy("group_bucket")
        .agg(*agg)
        .withColumn("run_id", F.lit(run_id))
        .withColumn("stage", F.lit(stage))
        .withColumn("wall_sec", F.lit(float(wall_sec)))
        .withColumn("created_at", F.current_timestamp())
        .select(
            "run_id", "stage", "group_bucket", "row_count", "triple_count", "wall_sec", "created_at"
        )
    )
    pdf = per_part.toPandas()
    spark.createDataFrame(
        pdf,
        schema="run_id string, stage string, group_bucket int, row_count long, "
        "triple_count long, wall_sec double, created_at timestamp",
    ).write.mode("append").parquet(lineage_path)
    return int(pdf["row_count"].sum()) if len(pdf) else 0


class StageTimer:
    def __init__(self):
        self.t0 = time.time()

    def lap(self) -> float:
        now = time.time()
        dt = now - self.t0
        self.t0 = now
        return dt
