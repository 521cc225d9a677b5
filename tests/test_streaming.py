"""Structured Streaming incremental pipeline smoke."""

from __future__ import annotations

from graphiti_spark import transcripts as tr
from graphiti_spark.streaming import stream as st


def test_incremental_pipeline(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "graph")
    ckpt = str(tmp_path / "ckpt")

    t = tr.synthesize_transcripts(spark, n_convs=6, turns_per_conv=6)
    t.write.parquet(in_dir)

    s = st.stream_transcripts_from_dir(spark, in_dir)
    q = st.start_incremental_pipeline(s, out_dir, ckpt)
    q.awaitTermination(120)

    edges = spark.read.parquet(f"{out_dir}/edges.parquet")
    episodes = spark.read.parquet(f"{out_dir}/episodes.parquet")
    assert episodes.count() == 36
    assert edges.count() > 0

    # batch pipeline over the same input produces the same edge set
    from graphiti_spark.plans import pipeline as pl

    batch = pl.build_graph(t, with_embeddings=False)["edges"]
    got = {r["uuid"] for r in edges.select("uuid").collect()}
    exp = {r["uuid"] for r in batch.select("uuid").collect()}
    assert got == exp


def test_windowed_counts(spark, tmp_path):
    in_dir = str(tmp_path / "in2")
    tr.synthesize_transcripts(spark, n_convs=3, turns_per_conv=5).write.parquet(in_dir)
    s = st.stream_transcripts_from_dir(spark, in_dir)
    agg = st.windowed_turn_counts(s, "10 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("turn_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql("SELECT sum(n_turns) FROM turn_counts").first()[0]
    assert got == 15
