"""Search layer: BM25, cosine, BFS, rerankers, filters."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators import search as srch


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_bm25_ranks_matching_docs(spark, docs):
    top = srch.bm25_search(docs, "text", "spark join", id_col="doc_id", limit=5).toPandas()
    assert len(top) == 5
    assert (top["score"] > 0).all()
    # every returned doc actually contains a query token
    ids = [int(x) for x in top["doc_id"]]
    texts = docs.filter(F.col("doc_id").isin(ids)).select("text").toPandas()["text"]
    assert all(("spark" in t.lower()) or ("join" in t.lower()) for t in texts)


def test_bm25_long_query_bails(spark, docs):
    q = " ".join(f"tok{i}" for i in range(200))  # > MAX_QUERY_LENGTH=128
    assert srch.bm25_search(docs, "text", q, id_col="doc_id").count() == 0


def test_cosine_search_self_top(spark, sf_dir):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "group_id", F.lit("g")
    )
    qv = [float(x) for x in embs.filter("vec_id = 7").first()["embedding"]]
    top = srch.cosine_search(embs, "embedding", qv, id_col="vec_id", limit=3, min_score=0.0).toPandas()
    assert int(top.iloc[0]["vec_id"]) == 7
    assert abs(top.iloc[0]["score"] - 1.0) < 1e-5


def test_bfs_depths(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "source_node_uuid string, target_node_uuid string",
    )
    got = srch.bfs_neighborhood(edges, ["a"]).toPandas().set_index("uuid")["depth"].to_dict()
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}  # e is depth 4 > MAX_SEARCH_DEPTH


def test_rrf_fusion(spark):
    l1 = spark.createDataFrame([("a", 3.0), ("b", 2.0), ("c", 1.0)], "uuid string, score double")
    l2 = spark.createDataFrame([("b", 9.0), ("a", 1.0)], "uuid string, score double")
    got = srch.rrf([l1, l2]).toPandas().set_index("uuid")["score"].to_dict()
    # a: ranks 0,1 → 1/1 + 1/2 = 1.5 ; b: ranks 1,0 → 1/2 + 1/1 = 1.5 ; c: 1/3
    assert abs(got["a"] - 1.5) < 1e-9 and abs(got["b"] - 1.5) < 1e-9
    assert abs(got["c"] - 1 / 3) < 1e-9


def test_node_distance_rerank(spark):
    edges = spark.createDataFrame(
        [("ctr", "n1"), ("n2", "ctr")], "source_node_uuid string, target_node_uuid string"
    )
    cands = spark.createDataFrame([("n1",), ("n2",), ("n3",), ("ctr",)], "uuid string")
    got = srch.node_distance_rerank(cands, edges, "ctr").toPandas()
    order = list(got["uuid"])
    assert order[0] == "ctr" and set(order[1:3]) == {"n1", "n2"} and order[3] == "n3"


def test_compile_filters(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pred = srch.compile_filters(
        date_filters={"ts": [[(">=", "2024-01-10 00:00:00")], [("<", "2024-01-20 00:00:00")]]}
    )
    got = ev.filter(pred).agg(F.min("ts"), F.max("ts")).first()
    assert str(got[0]) >= "2024-01-10" and str(got[1]) < "2024-01-20"


def test_mmr_single_pass_formula(spark):
    """Exact values of the reference's single-pass MMR
    (search_utils.py:966-1004): mmr = λ·sim(q,c) + (λ−1)·max_sim(c, others)."""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.01, 0.0]),
        (2, [0.6, 0.8, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = srch.mmr_rerank(df, "embedding", [1.0, 0.0, 0.0], id_col="vec_id").toPandas()
    scores = got.set_index("vec_id")["score"].to_dict()
    assert abs(scores[0] - 0.0) < 1e-9  # 0.5·1 − 0.5·max(1, 0.6)
    assert abs(scores[1] - 0.0) < 1e-9  # 0.5·1 − 0.5·max(1, 0.608)
    assert abs(scores[2] - (-0.004)) < 1e-9  # 0.5·0.6 − 0.5·0.608


def test_lucene_sanitize_golden(spark):
    """F1 golden pairs from the reference (tests/helpers_test.py:80-92),
    including the quirky uppercase O R N T A D escapes; the Column form
    must agree with the driver-side form."""
    from pyspark.sql import functions as F

    from graphiti_spark.functions import text as tx

    cases = [
        (
            'This has every escape character + - && || ! ( ) { } [ ] ^ " ~ * ? : \\ /',
            '\\This has every escape character \\+ \\- \\&\\& \\|\\| \\! \\( \\) \\{ \\} \\[ \\] \\^ \\" \\~ \\* \\? \\: \\\\ \\/',
        ),
        ("this has no escape characters", "this has no escape characters"),
    ]
    for q, want in cases:
        assert tx.lucene_sanitize(q) == want
    got = (
        spark.createDataFrame([(q,) for q, _ in cases], "q string")
        .select(tx.lucene_sanitize_col(F.col("q")).alias("s"))
        .toPandas()["s"]
        .tolist()
    )
    assert got == [want for _, want in cases]
