"""Training-data operators: dedup family, ANN, text analysis, multimodal."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators import dataset_ann as ann
from graphiti_spark.operators import dataset_dedup as ddp
from graphiti_spark.operators import dataset_text as dtx
from graphiti_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def toy_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog"),  # near dup
        (4, "completely different content about spark sql engines"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact(spark, toy_docs):
    got = ddp.dedup_exact(toy_docs).toPandas()
    dup = got[got.dup_count > 1]
    assert len(dup) == 1 and int(dup.iloc[0]["doc_id"]) == 1 and int(dup.iloc[0]["dup_count"]) == 2


def test_minhash_finds_near_dups(spark, toy_docs):
    pairs = ddp.minhash_pairs(toy_docs, threshold=0.5).toPandas()
    found = {(int(r.src), int(r.dst)) for r in pairs.itertuples()}
    assert (1, 2) in found  # identical → jaccard 1
    assert (1, 3) in found or (2, 3) in found  # near dup above 0.5
    assert not any(4 in p for p in found)


def test_jaccard_exact_values(spark, toy_docs):
    pairs = ddp.jaccard_pairs(toy_docs, threshold=0.1).toPandas()
    d = {(int(r.src), int(r.dst)): r.jaccard for r in pairs.itertuples()}
    assert abs(d[(1, 2)] - 1.0) < 1e-9
    # docs 1 & 3 share 7 of 9 distinct tokens → 7/9... sets: 1 has 8 distinct
    assert 0.5 < d[(1, 3)] < 1.0


def test_simhash_near_dups_close(spark, toy_docs):
    got = ddp.simhash(toy_docs).toPandas().set_index("doc_id")["simhash"].to_dict()
    assert got[1] == got[2]
    ham = bin(int(got[1]) ^ int(got[3])).count("1")
    ham_far = bin(int(got[1]) ^ int(got[4])).count("1")
    assert ham <= ham_far


def test_ann_exact_and_lsh_agree_on_easy_top1(spark, sf_dir):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = embs.filter("vec_id < 3").select(F.col("vec_id").alias("qid"), "embedding")
    exact = ann.cosine_topk_join(probes, embs, k=1).toPandas()
    # top-1 of each probe is itself
    assert (exact["qid"] == exact["vec_id"]).all()
    lsh = ann.lsh_bucket_topk(probes, embs, k=1).toPandas()
    assert (lsh["qid"] == lsh["vec_id"]).all()  # self always shares its bucket


def test_ann_pandas_matches_builtin(spark, sf_dir):
    import numpy as np

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = np.stack(embs.filter("vec_id < 2").toPandas()["embedding"].values)
    via_pandas = ann.cosine_topk_pandas(embs, q, k=5).toPandas()
    probes = embs.filter("vec_id < 2").select(F.col("vec_id").alias("qid"), "embedding")
    via_join = ann.cosine_topk_join(probes, embs, k=5).toPandas()
    for qi in range(2):
        a = set(via_pandas[via_pandas.qid == qi]["vec_id"].astype(int))
        b = set(via_join[via_join.qid == qi]["vec_id"].astype(int))
        assert a == b


def test_text_analysis(spark):
    rows = [
        (1, "The cat and the dog sat in a house. It is nice!"),
        (2, "der hund und die katze ist nicht da"),
        (3, "xyzzy qwerty"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lang = dtx.lang_id(df).toPandas().set_index("doc_id")["lang_pred"].to_dict()
    assert lang[1] == "en" and lang[2] == "de" and lang[3] == "unknown"
    q = dtx.quality_score(df).toPandas().set_index("doc_id")["quality"].to_dict()
    assert q[1] == 1.0 and q[3] < 1.0
    tc = dtx.token_counts(df).toPandas().set_index("doc_id")
    assert tc.loc[1, "ws_tokens"] == 12
    assert tc.loc[1, "subword_tokens"] == 14  # 12 alpha words + '.' + '!'


def test_fingerprint_normalization(spark):
    rows = [(1, "Hello,   World!"), (2, "hello world"), (3, "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = dtx.fingerprint(df).toPandas().set_index("doc_id")["fingerprint"].to_dict()
    assert fp[1] == fp[2] != fp[3]


def test_multimodal_plumbing(spark):
    media = mm.synth_media(spark, 12)
    feats = mm.extract_features(media).toPandas()
    assert len(feats) == 12
    assert all(len(f) == 16 for f in feats["feature"])
    # deterministic: same payload → same feature
    again = mm.extract_features(mm.synth_media(spark, 12)).toPandas()
    f1 = feats.sort_values("media_id")["feature"].apply(list).tolist()
    f2 = again.sort_values("media_id")["feature"].apply(list).tolist()
    assert f1 == f2
    plan = mm.frame_sample_plan(media).toPandas()
    assert (plan.groupby("media_id").size() > 0).all()


def test_real_decode_backend_raises():
    with pytest.raises(NotImplementedError):
        mm.real_decode_backend(b"xx", "image")
