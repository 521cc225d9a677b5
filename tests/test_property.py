"""Property-based tests (hypothesis) for the pure-pandas rule engine —
no SparkSession needed, so these run fast and fuzz broadly.

The rule engine is the extraction oracle (SURVEY §7.0), so fuzzing it
directly also fuzzes the contract the Spark pipeline is held to.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphiti_spark import rules
from graphiti_spark.functions.embeddings import embed_texts_np

NAMES = st.sampled_from(["Alice", "Bob", "Carol King", "Acme", "Paris"])


@st.composite
def episode_frames(draw):
    n = draw(st.integers(0, 20))
    texts = draw(
        st.lists(
            st.one_of(
                st.text(max_size=60),
                st.builds(lambda a, b: f"{a} works at {b}.", NAMES, NAMES),
                st.builds(lambda a, b: f"{a} likes {b}.", NAMES, NAMES),
                st.builds(lambda a, b: f"{a} no longer works at {b}.", NAMES, NAMES),
            ),
            min_size=n,
            max_size=n,
        )
    )
    return pd.DataFrame(
        {
            "uuid": [f"ep{i}" for i in range(n)],
            "group_id": "g",
            "role": ["user"] * n,
            "text": texts,
            "valid_at": pd.Series([pd.Timestamp("2025-01-01")] * n, dtype="datetime64[us]"),
        }
    )


@given(episode_frames())
@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_extraction_total_and_anchored(pdf):
    """Extraction never raises; triples come only from full-line rule
    matches; subj != obj always (distinct-entity rule)."""
    tri = rules.extract_triples_pdf(pdf[["uuid", "group_id", "text", "valid_at"]])
    men = rules.extract_mentions_pdf(pdf[["uuid", "group_id", "role", "text"]])
    assert (tri["subj_name"].str.lower() != tri["obj_name"].str.lower()).all()
    # every triple's source line fully matches its rule pattern
    texts = pdf.set_index("uuid")["text"]
    import re

    for r in tri.itertuples():
        line = texts[r.episode_uuid]
        assert any(
            re.fullmatch(rule.pattern.strip("^$"), line) for rule in rules.TRIPLE_RULES
        )
    # mentions are deduped per (episode, entity)
    assert not men.duplicated(["episode_uuid", "entity_name"]).any()
    # the speaker is always mentioned (order 0) for episodes with a role
    if len(pdf):
        with_role = set(pdf["uuid"])
        spk = men[men["mention_order"] == 0]
        assert with_role == set(spk["episode_uuid"])


@given(episode_frames())
@settings(max_examples=30, deadline=None)
def test_assert_terminate_partition(pdf):
    """A triple row carries exactly one of valid_at/invalid_at."""
    tri = rules.extract_triples_pdf(pdf[["uuid", "group_id", "text", "valid_at"]])
    both = tri["valid_at"].notna() & tri["invalid_at"].notna()
    neither = tri["valid_at"].isna() & tri["invalid_at"].isna()
    assert not both.any()
    assert not neither.any()


@given(st.lists(st.text(max_size=40), min_size=1, max_size=30))
@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_embeddings_normalized_and_memoized(texts):
    """Unit norm (or zero), deterministic, and equal strings get equal
    vectors (the batch memoization must be an identity-preserving
    optimization)."""
    import numpy as np

    s = pd.Series(texts)
    a = embed_texts_np(s)
    b = embed_texts_np(s)
    assert np.array_equal(a, b)
    norms = np.linalg.norm(a, axis=1)
    assert ((np.abs(norms - 1) < 1e-5) | (norms == 0)).all()
    first = {}
    for i, t in enumerate(s.fillna("").str.lower()):
        if t in first:
            assert np.array_equal(a[i], a[first[t]])
        else:
            first[t] = i
