"""Extraction & episode windowing vs the pure-pandas reference oracle.

BASELINE.md target: Spark pipeline and the rule-engine oracle must
agree exactly (P/R = 1.0 ≥ 0.95) on the (subj, pred, obj) multiset per
conversation, and per-turn text equality must hold under stable
(conv_id, turn_idx) ordering.
"""

from __future__ import annotations

import pandas as pd
import pytest

from graphiti_spark import rules, transcripts
from graphiti_spark.operators import episodes as ep_ops
from graphiti_spark.operators import extraction


def _triple_multiset(pdf: pd.DataFrame) -> list[tuple]:
    return sorted(
        (r.group_id, r.subj_name, r.pred, r.obj_name)
        for r in pdf.itertuples()
    )


def test_per_turn_text_equality(spark):
    tdf = transcripts.synthesize_transcripts(spark, n_convs=10, turns_per_conv=8)
    eps = ep_ops.build_episodes(tdf)
    joined = (
        eps.join(tdf, (eps.group_id == tdf.conv_id) & (eps.turn_idx == tdf.turn_idx))
        .selectExpr("content", "concat(role, ': ', text) AS expected")
        .toPandas()
    )
    assert len(joined) == tdf.count()
    assert (joined["content"] == joined["expected"]).all()


def test_triples_match_oracle(spark):
    pdf = transcripts.synthesize_transcripts_pdf(n_convs=30, turns_per_conv=10)
    tdf = spark.createDataFrame(pdf, schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
    eps = ep_ops.build_episodes(tdf)
    got = extraction.extract_triples(eps).toPandas()

    expected = transcripts.ground_truth_triples_pdf(pdf)
    assert _triple_multiset(got) == _triple_multiset(expected)
    # P/R == 1.0 by construction; sanity: non-trivial corpus
    assert len(expected) > 50


def test_mentions_speaker_first(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c1"],
            "turn_idx": pd.array([0, 1], dtype="int32"),
            "role": ["user", "assistant"],
            "text": ["Alice works at Acme.", "The weather is nice today."],
            "tool": ["", ""],
            "ts": pd.to_datetime(["2025-01-01 00:00:00", "2025-01-01 00:01:00"]),
        }
    )
    tdf = spark.createDataFrame(pdf, schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
    eps = ep_ops.build_episodes(tdf)
    got = extraction.extract_mentions(eps).toPandas().sort_values(["episode_uuid", "mention_order"])
    by_ep = got.groupby("episode_uuid")["entity_name"].apply(list).to_dict()
    lists = sorted(by_ep.values(), key=len)
    assert lists[0] == ["assistant"]  # speaker always extracted, even alone
    assert lists[1] == ["user", "Alice", "Acme"]  # speaker first, then subj, obj


def test_prev_episode_window(spark):
    tdf = transcripts.synthesize_transcripts(spark, n_convs=3, turns_per_conv=6)
    eps = ep_ops.with_prev_context(ep_ops.build_episodes(tdf))
    got = eps.selectExpr("group_id", "turn_idx", "size(prev_uuids) AS n_prev").toPandas()
    for r in got.itertuples():
        assert r.n_prev == min(r.turn_idx, 3)


def test_retrieve_episodes_last_n(spark):
    tdf = transcripts.synthesize_transcripts(spark, n_convs=2, turns_per_conv=10)
    eps = ep_ops.build_episodes(tdf)
    got = ep_ops.retrieve_episodes(eps, "2026-01-01 00:00:00", last_n=4).toPandas()
    assert (got.groupby("group_id").size() == 4).all()
    # chronological within group & equal to the LAST 4 turns
    for _, g in got.groupby("group_id"):
        assert list(g["turn_idx"]) == [6, 7, 8, 9]


def test_oracle_sql_matches_rules_on_duckdb():
    """The generated DuckDB oracle SQL reproduces the pandas rule engine."""
    import duckdb

    pdf = transcripts.synthesize_transcripts_pdf(n_convs=20, turns_per_conv=10)
    eps = pdf.rename(columns={"ts": "valid_at"}).copy()
    eps["uuid"] = eps["conv_id"] + ":" + eps["turn_idx"].astype(str)
    eps["group_id"] = eps["conv_id"]
    expected = rules.extract_triples_pdf(eps[["uuid", "group_id", "text", "valid_at"]])

    con = duckdb.connect()
    con.register("eps_src", eps[["uuid", "group_id", "text", "valid_at"]])
    sql = rules.triples_oracle_sql("eps AS (SELECT * FROM eps_src)")
    got = con.sql(sql).df()
    assert _triple_multiset(got) == _triple_multiset(expected)


def test_mixed_source_extraction(spark):
    """text/json episode families (prompts/extract_nodes.py:82,131,163):
    message episodes extract speaker+entities, text episodes entities
    only (no speaker), json episodes the represented name/works_at
    pair; a non-matching json note extracts nothing."""
    rows = [
        ("e1", "g", "message", "user", "Alice works at Acme.", "user: Alice works at Acme.", "2025-01-01 00:00:00"),
        ("e2", "g", "text", "", "Bob likes Carol.", "Bob likes Carol.", "2025-01-01 00:01:00"),
        ("e3", "g", "json", "", '{"name": "Dave Lee", "works_at": "Globex"}', '{"name": "Dave Lee", "works_at": "Globex"}', "2025-01-01 00:02:00"),
        ("e4", "g", "json", "", '{"note": "The weather is nice today."}', '{"note": "The weather is nice today."}', "2025-01-01 00:03:00"),
    ]
    eps = spark.createDataFrame(
        rows,
        "uuid string, group_id string, source string, role string, text string, content string, valid_at string",
    ).withColumn("valid_at", __import__("pyspark").sql.functions.col("valid_at").cast("timestamp"))
    men = extraction.extract_mentions_mixed(eps).toPandas()
    tri = extraction.extract_triples_mixed(eps).toPandas()

    by_ep = men.groupby("episode_uuid")["entity_name"].apply(set).to_dict()
    assert by_ep["e1"] == {"user", "Alice", "Acme"}
    assert by_ep["e2"] == {"Bob", "Carol"}  # no speaker for text source
    assert by_ep["e3"] == {"Dave Lee", "Globex"}
    assert "e4" not in by_ep
    # speaker is mention_order 0 only for the message episode
    assert men[men.episode_uuid == "e1"].set_index("entity_name")["mention_order"]["user"] == 0

    t = tri.set_index("episode_uuid")
    assert t.loc["e1", "pred"] == "WORKS_AT" and t.loc["e1", "obj_name"] == "Acme"
    assert t.loc["e2", "pred"] == "LIKES"
    assert t.loc["e3", "pred"] == "WORKS_AT" and t.loc["e3", "subj_name"] == "Dave Lee"
    assert "e4" not in t.index


def test_mixed_statement_escaping_spark_matches_duckdb(spark):
    """Spark's SQL parser unescapes backslashes inside string literals
    (so the regex \\. in MIXED_EPISODES_SELECT would become any-char .)
    while DuckDB keeps them literal; spark_escape_sql doubles them for
    the Spark-executed copy so both engines render identical episodes
    — including for adversarial text that only a literal dot rejects
    ('Alice works at Acme!' must become a json NOTE doc, not a
    works_at doc, in BOTH engines)."""
    import duckdb
    import pandas as pd

    tdf = pd.DataFrame(
        {
            "conv_id": ["c0"] * 4,
            "turn_idx": pd.array([0, 1, 2, 6], dtype="int32"),
            "role": ["user", "assistant", "user", "user"],
            "text": [
                "Alice works at Acme.",
                "Bob moved to Paris.",
                "Alice works at Acme!",  # %4==2 -> json branch, no final dot
                "Carol works at Globex.",  # %4==2 -> json works_at doc
            ],
            "ts": pd.to_datetime(["2025-01-01 00:00:00"] * 4),
        }
    )
    stmt = transcripts.MIXED_EPISODES_SELECT
    spark.createDataFrame(tdf).createOrReplaceTempView("transcripts")
    got_spark = (
        spark.sql(transcripts.spark_escape_sql(stmt))
        .orderBy("uuid")
        .toPandas()[["group_id", "source", "role", "text"]]
    )
    con = duckdb.connect()
    con.register("transcripts", tdf)
    got_duck = con.sql(f"SELECT * FROM ({stmt}) ORDER BY uuid").df()[
        ["group_id", "source", "role", "text"]
    ]
    pd.testing.assert_frame_equal(
        got_spark.reset_index(drop=True), got_duck.reset_index(drop=True)
    )
    texts = set(got_spark["text"])
    assert '{"note": "Alice works at Acme!"}' in texts
    assert '{"name": "Carol", "works_at": "Globex"}' in texts


def test_clean_input_strips_invisible_chars(spark):
    """F9 (_clean_input, llm_client/client.py:68-88): zero-width /
    control characters in transcript text and speaker names are removed
    at the rule-engine input boundary in every engine — the names and
    facts a dirty transcript produces are identical to a clean one's,
    and never carry invisible characters."""
    import duckdb
    import pandas as pd

    eps_pdf = pd.DataFrame(
        {
            "uuid": ["e1"],
            "group_id": ["g"],
            "role": ["us\x01er"],
            "text": ["Ali\u200bce works at Ac\u200dme\ufeff."],
            "valid_at": pd.to_datetime(["2025-01-01 00:00:00"]),
        }
    )
    bad = set("\u200b\u200c\u200d\ufeff\u2060")
    # pandas rule engine
    men = rules.extract_mentions_pdf(eps_pdf[["uuid", "group_id", "role", "text"]])
    tri = rules.extract_triples_pdf(eps_pdf[["uuid", "group_id", "text", "valid_at"]])
    assert set(men["entity_name"]) == {"user", "Alice", "Acme"}
    row = tri.iloc[0]
    assert [row["subj_name"], row["pred"], row["obj_name"]] == ["Alice", "WORKS_AT", "Acme"]
    for s in list(men["entity_name"]) + [row["fact"]]:
        assert not any(ord(c) < 32 or c in bad for c in s)
    # DuckDB oracle mirrors the cleaning
    con = duckdb.connect()
    con.register("eps_src", eps_pdf)
    got = con.sql(rules.mentions_oracle_sql("eps AS (SELECT * FROM eps_src)")).df()
    assert set(got["entity_name"]) == {"user", "Alice", "Acme"}
    got_t = con.sql(rules.triples_oracle_sql("eps AS (SELECT * FROM eps_src)")).df()
    assert list(got_t[["subj_name", "pred", "obj_name"]].iloc[0]) == [
        "Alice", "WORKS_AT", "Acme",
    ]
    # Spark mapInPandas path (content = "role: text")
    eps_spark = spark.createDataFrame(
        [("e1", "g", "us\x01er: Ali\u200bce works at Ac\u200dme\ufeff.", "2025-01-01 00:00:00")],
        "uuid string, group_id string, content string, valid_at string",
    ).withColumn(
        "valid_at", __import__("pyspark").sql.functions.col("valid_at").cast("timestamp")
    )
    men_s = extraction.extract_mentions(eps_spark).toPandas()
    assert set(men_s["entity_name"]) == {"user", "Alice", "Acme"}


def test_with_prev_context_salted_equivalence(spark):
    """Salted prev-context (hot-key chunking with boundary carry) is
    EXACTLY the unsalted window, including a conversation that spans
    many chunks and one that straddles a single boundary."""
    from graphiti_spark import transcripts as tr_mod  # noqa: F401  (import parity)

    rows = []
    for conv, n in (("hot", 57), ("short", 3), ("exact", 16)):
        for i in range(n):
            rows.append((conv, i, "user", f"{conv} says thing {i}", "", None))
    import datetime as _dt

    t0 = _dt.datetime(2025, 1, 1)
    rows = [(c, i, r, t, tool, t0 + _dt.timedelta(seconds=i)) for c, i, r, t, tool, _ in rows]
    tdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    eps = ep_ops.build_episodes(tdf)
    plain = ep_ops.with_prev_context(eps).toPandas().sort_values("uuid").reset_index(drop=True)
    salted = (
        ep_ops.with_prev_context_salted(eps, chunk=16)
        .toPandas()
        .sort_values("uuid")
        .reset_index(drop=True)
    )
    assert len(plain) == len(salted) == 76
    assert list(salted["uuid"]) == list(plain["uuid"])
    for col in ("prev_uuids", "prev_contents"):
        assert list(map(list, salted[col])) == list(map(list, plain[col]))


def test_with_prev_context_salted_rejects_big_window(spark):
    """The boundary carry spans exactly one chunk back, so the exact-
    equivalence contract requires window_len < chunk — enforced with a
    ValueError instead of silently losing predecessors (ADVICE r4)."""
    import datetime as _dt

    t0 = _dt.datetime(2025, 1, 1)
    tdf = spark.createDataFrame(
        [("c", i, "user", f"t{i}", "", t0 + _dt.timedelta(seconds=i)) for i in range(8)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    eps = ep_ops.build_episodes(tdf)
    with pytest.raises(ValueError, match="window_len < chunk"):
        ep_ops.with_prev_context_salted(eps, window_len=4, chunk=4)
