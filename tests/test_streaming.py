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


def test_stream_dedup_documents(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a re-delivered document in a later
    micro-batch is dropped; layout variants collapse to one fingerprint."""
    import datetime as _dt
    import time as _time

    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    schema = "doc_id long, text string, ts timestamp"
    base = _dt.datetime(2025, 1, 1)
    later = base + _dt.timedelta(minutes=1)
    b1 = [(1, "Hello,   World!", base), (2, "something else", base)]
    # doc 3 is a layout variant of doc 1 (same fingerprint), doc 4 fresh
    b2 = [(3, "hello world", later), (4, "brand new content", later)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(str(in_dir))
    _time.sleep(1.1)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(str(in_dir))

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    out = st.stream_dedup_documents(src, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("deduped_docs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select doc_id from deduped_docs").toPandas()
    assert sorted(got["doc_id"]) == [1, 2, 4]  # 3 suppressed by state

    # batch fingerprint agrees with the streaming one (shared expression)
    from graphiti_spark.operators import dataset_text as dtx

    fps = dtx.fingerprint(
        spark.createDataFrame(b1 + b2, schema)
    ).toPandas().set_index("doc_id")["fingerprint"]
    assert fps[1] == fps[3] and fps[1] != fps[2]


def test_stateful_new_entity_tracking(spark, tmp_path):
    """applyInPandasWithState: an entity is emitted exactly once per
    conversation even when its mentions span micro-batches."""
    import pandas as pd
    from graphiti_spark import transcripts as tr
    from graphiti_spark.schemas import TRANSCRIPTS
    from graphiti_spark.streaming import stream as st

    in_dir = tmp_path / "turns"
    in_dir.mkdir()
    base = pd.Timestamp("2025-01-01")
    mk = lambda rows: pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"turn_idx": "int32"})
    # batch 1: Alice + Acme appear; batch 2: Alice repeats, Bob is new
    b1 = mk([("c1", 0, "user", "Alice works at Acme.", "", base)])
    b2 = mk([
        ("c1", 1, "assistant", "Alice likes Bob.", "", base + pd.Timedelta(minutes=1)),
    ])
    import time as _time

    # append part files at the TOP level of in_dir (the file source does
    # not recurse into nested directories); distinct mtimes keep the
    # oldest-first processing order deterministic
    spark.createDataFrame(b1, schema=TRANSCRIPTS).coalesce(1).write.mode("append").parquet(str(in_dir))
    _time.sleep(1.1)
    spark.createDataFrame(b2, schema=TRANSCRIPTS).coalesce(1).write.mode("append").parquet(str(in_dir))

    src = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)  # force separate micro-batches
        .parquet(str(in_dir))
    )
    out = st.track_new_entities(src)
    q = (
        out.writeStream.format("memory")
        .queryName("new_entities")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from new_entities").toPandas()
    # exactly one row per entity; repeats across batches suppressed by state
    assert sorted(got["entity_name"]) == ["Acme", "Alice", "Bob", "assistant", "user"]
    assert len(got) == len(set(got["entity_name"]))
    firsts = got.set_index("entity_name")["first_turn_idx"]
    assert firsts["Acme"] == 0 and firsts["Bob"] == 1


def test_stream_neardedup_minhash(spark, tmp_path):
    """Streaming MinHash near-dedup: a near-duplicate arriving in a
    later micro-batch is dropped by the band store; within-batch
    near-dups resolve min-id-wins; a replayed text under a new id is
    dropped; fresh content passes."""
    import datetime as _dt
    import time as _time

    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    schema = "doc_id long, text string, ts timestamp"
    t0 = _dt.datetime(2025, 1, 1)
    base = "the quick brown fox jumps over the lazy dog and then naps all afternoon"
    near = base.replace("naps", "sleeps")  # near-dup of `base`
    b1 = [
        (1, base, t0),
        (2, "completely different content about spark sql engines", t0),
        (7, near, t0),  # within-batch near-dup of 1 -> min id 1 keeps
    ]
    b2 = [
        (3, base.replace("lazy", "idle"), t0 + _dt.timedelta(minutes=1)),  # near-dup of stored 1
        (4, "fresh and unrelated text about marine biology research", t0 + _dt.timedelta(minutes=1)),
    ]
    b3 = [
        (5, b2[1][1], t0 + _dt.timedelta(minutes=2)),  # replay of 4's text, new id
        (6, "another novel document on alpine geology surveys", t0 + _dt.timedelta(minutes=2)),
    ]
    for b in (b1, b2, b3):
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(str(in_dir))
        _time.sleep(1.1)

    src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(in_dir))
    out_dir = str(tmp_path / "neardedup")
    q = st.stream_neardedup_minhash(
        src, out_dir, str(tmp_path / "ckpt_nd"), band_width=2
    )
    q.awaitTermination(180)
    got = sorted(spark.read.parquet(f"{out_dir}/novel.parquet").toPandas()["doc_id"])
    assert got == [1, 2, 4, 6], got
    # the band store holds only surviving docs' bands
    store = spark.read.parquet(f"{out_dir}/band_store.parquet").toPandas()
    assert set(store.columns) == {"band", "h", "ts"} and len(store) == 4 * len(got)


def test_stream_curation(spark, tmp_path):
    """Streaming curation: low-quality docs are gated out, exact dups
    are dropped across micro-batches via the fingerprint store (and
    min-id-wins within a batch), survivors carry their deterministic
    shard, and a replayed text under a new id emits nothing."""
    import datetime as _dt
    import hashlib
    import time as _time

    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    schema = "doc_id long, text string, ts timestamp"
    t0 = _dt.datetime(2025, 1, 1)
    a = "The quick brown fox jumps over the lazy dog and naps in the sun."
    b = "Marine biology research covers the coastal ecosystems of the north."
    c = "Alpine geology surveys describe the slow uplift of the mountains."
    b1 = [
        (1, a, t0),
        (2, "#### 1234 !!!!", t0),               # fails the quality gate
        (7, "  " + a.upper() + "  ", t0),        # same fingerprint as 1 -> min id keeps
    ]
    b2 = [
        (3, a, t0 + _dt.timedelta(minutes=1)),   # exact dup of stored 1
        (4, b, t0 + _dt.timedelta(minutes=1)),
    ]
    b3 = [
        (5, b, t0 + _dt.timedelta(minutes=2)),   # replay of 4's text, new id
        (6, c, t0 + _dt.timedelta(minutes=2)),
    ]
    for batch in (b1, b2, b3):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode("append").parquet(str(in_dir))
        _time.sleep(1.1)

    src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(in_dir))
    out_dir = str(tmp_path / "curated_out")
    q = st.stream_curation(src, out_dir, str(tmp_path / "ckpt_cur"))
    q.awaitTermination(180)
    got = spark.read.parquet(f"{out_dir}/curated.parquet").toPandas()
    assert sorted(got.doc_id) == [1, 4, 6], sorted(got.doc_id)
    # shard is the pure-function md5 bucket (stable across batches)
    h = int(hashlib.md5(b"shuffle:1").hexdigest()[:8], 16)
    assert int(got.set_index("doc_id").loc[1, "shard"]) == h % 16
    store = spark.read.parquet(f"{out_dir}/fingerprint_store.parquet").toPandas()
    assert len(store) == 3 and set(store.columns) == {"fingerprint", "ts"}


def test_atomic_store_swap_and_fallback(spark, tmp_path):
    """The state-store commit is a temp+rename swap (ADVICE r4): a new
    generation replaces the old atomically, and if a crash lands between
    the two renames (live path gone, previous generation at .old) the
    reader falls back to the surviving generation instead of losing the
    dedup state."""
    import os

    from graphiti_spark.streaming import stream as st

    store = str(tmp_path / "store.parquet")
    g1 = spark.createDataFrame([("a",), ("b",)], "fingerprint string")
    st._atomic_store_swap(g1, store)
    assert st._store_read_path(store) == store
    assert sorted(
        r.fingerprint for r in spark.read.parquet(store).collect()
    ) == ["a", "b"]
    # second generation replaces the first; no .tmp/.old residue
    g2 = spark.createDataFrame([("a",), ("b",), ("c",)], "fingerprint string")
    st._atomic_store_swap(g2, store)
    assert spark.read.parquet(store).count() == 3
    assert not os.path.exists(store + ".tmp") and not os.path.exists(store + ".old")
    # simulate a crash between the two renames: live gone, .old present
    os.rename(store, store + ".old")
    assert st._store_read_path(store) == store + ".old"
    assert spark.read.parquet(st._store_read_path(store)).count() == 3
    # the next commit heals the store back to the live path
    st._atomic_store_swap(g2, store)
    assert st._store_read_path(store) == store
