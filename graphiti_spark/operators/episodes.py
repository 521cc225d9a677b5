"""Episode construction, windowing, retrieval (SURVEY §2.1 S1/S2).

Reference semantics:
  * EpisodicNode construction (graphiti.py:445-458): content for
    `message` episodes is "speaker: utterance" (nodes.py:55-58) —
    here `concat(role, ': ', text)`; valid_at = reference time (= ts).
  * retrieve_episodes (utils/maintenance/graph_data_operations.py:84-135):
    last-n by valid_at <= reference_time per group, chronological.
  * retrieve_previous_episodes_bulk (utils/bulk_utils.py:66-81,
    EPISODE_WINDOW_LEN=3 graph_data_operations.py:28): window of the 3
    preceding episodes per episode — a window frame, not a self-join.

All pure DataFrame ops: Catalyst pushes the group filter to the scan,
and the per-conversation window shuffles once on conv_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark import ids

EPISODE_WINDOW_LEN = 3  # reference graph_data_operations.py:28
DEFAULT_CREATED_AT = "2025-06-01 00:00:00"  # fixed transaction time for determinism


def build_episodes(transcripts: DataFrame, created_at: str = DEFAULT_CREATED_AT) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → episodes.

    group_id = conv_id (reference group_id partition key, helpers.py:124-147);
    uuid is content-derived for idempotent merges (ids.py).
    Per-turn text equality invariant: content == concat(role, ': ', text).
    """
    return transcripts.select(
        ids.episode_uuid(F.col("conv_id"), F.col("conv_id"), F.col("turn_idx")).alias("uuid"),
        F.concat_ws("-", F.col("conv_id"), F.col("turn_idx").cast("string")).alias("name"),
        F.col("conv_id").alias("group_id"),
        F.lit("message").alias("source"),
        F.when(F.col("tool") != "", F.concat(F.lit("tool:"), F.col("tool")))
        .otherwise(F.lit("transcript"))
        .alias("source_description"),
        F.concat(F.col("role"), F.lit(": "), F.col("text")).alias("content"),
        F.col("ts").alias("valid_at"),
        F.lit(created_at).cast("timestamp").alias("created_at"),
        F.lit(None).cast("array<string>").alias("entity_edges"),
        F.col("turn_idx"),  # kept for stable ordering; dropped at materialize
    )


def with_prev_context(episodes: DataFrame, window_len: int = EPISODE_WINDOW_LEN) -> DataFrame:
    """Attach `prev_uuids` / `prev_contents`: the preceding `window_len`
    episodes of the same conversation (S2). One shuffle on group_id;
    no self-join (reference fans out a query per episode)."""
    w = (
        Window.partitionBy("group_id")
        .orderBy("turn_idx")
        .rowsBetween(-window_len, -1)
    )
    return episodes.withColumn("prev_uuids", F.collect_list("uuid").over(w)).withColumn(
        "prev_contents", F.collect_list("content").over(w)
    )


def with_prev_context_salted(
    episodes: DataFrame,
    window_len: int = EPISODE_WINDOW_LEN,
    chunk: int = 8192,
) -> DataFrame:
    """EXACT salted form of `with_prev_context` for hot conversation
    keys (the north-star 10¹²-turn design point): a single 10⁶-turn
    conversation makes `with_prev_context`'s per-conversation window
    one giant sort partition that AQE cannot split. Because the lookback
    is a BOUNDED `window_len`-row frame, the window distributes exactly:
    salt each conversation into `chunk`-turn ranges, and carry the last
    `window_len` rows of each chunk into the next chunk's partition as
    context-only rows (dropped from the output after the window runs).
    The first rows of a chunk see exactly their true predecessors via
    the carried rows; deeper rows never reach them (ROWS frame).
    Identical output to the unsalted operator (pytest equivalence,
    including conversations spanning many chunks); overhead is
    window_len/chunk ≈ 0.04% duplicated rows.

    Requires dense per-conversation turn_idx (0..n-1), which
    `build_episodes` guarantees — the chunk boundary test is
    `turn_idx % chunk`, not a rank (a rank would itself need the
    unsalted window).

    The carry spans exactly ONE chunk back, so the equivalence holds
    only when `window_len < chunk` — enforced, not assumed (ADVICE r4):
    a small `chunk` (or huge `window_len`) would silently drop true
    predecessors otherwise."""
    if window_len >= chunk:
        raise ValueError(
            f"with_prev_context_salted requires window_len < chunk "
            f"(got window_len={window_len}, chunk={chunk}): the boundary "
            f"carry only spans one chunk back, so a larger window would "
            f"silently lose true predecessors — raise `chunk` or use the "
            f"unsalted with_prev_context"
        )
    chunk_col = F.floor(F.col("turn_idx") / chunk)
    main = episodes.withColumn("_chunk", chunk_col).withColumn("_carry", F.lit(False))
    carry = (
        episodes.filter((F.col("turn_idx") % chunk) >= chunk - window_len)
        .withColumn("_chunk", chunk_col + 1)
        .withColumn("_carry", F.lit(True))
    )
    u = main.unionByName(carry)
    w = (
        Window.partitionBy("group_id", "_chunk")
        .orderBy("turn_idx")
        .rowsBetween(-window_len, -1)
    )
    return (
        u.withColumn("prev_uuids", F.collect_list("uuid").over(w))
        .withColumn("prev_contents", F.collect_list("content").over(w))
        .filter(~F.col("_carry"))
        .drop("_chunk", "_carry")
    )


def retrieve_episodes(
    episodes: DataFrame,
    reference_time,
    last_n: int = 10,
    group_ids: list[str] | None = None,
    source: str | None = None,
) -> DataFrame:
    """S1: last-n episodes with valid_at <= reference_time per group,
    returned chronological (graph_data_operations.py:84-135)."""
    df = episodes.filter(F.col("valid_at") <= F.lit(reference_time).cast("timestamp"))
    if group_ids:
        df = df.filter(F.col("group_id").isin(group_ids))
    if source:
        df = df.filter(F.col("source") == source)
    w = Window.partitionBy("group_id").orderBy(F.desc("valid_at"), F.desc("uuid"))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= last_n)
        .drop("rn")
        .orderBy("group_id", "valid_at")
    )
