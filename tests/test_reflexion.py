"""E2/E4 reflexion loops (node_operations.py:46-64, edge_operations.py:
157-184). Reference default MAX_REFLEXION_ITERATIONS=0 (helpers.py:38)
= single pass; with a budget and a deliberately weaker extractor the
reflector must recover the misses."""

from __future__ import annotations

from graphiti_spark import rules
from graphiti_spark.operators import episodes as ep_ops
from graphiti_spark.operators import extraction as ex
from graphiti_spark import transcripts as tr


def _eps(spark):
    t = tr.synthesize_transcripts(spark, n_convs=4, turns_per_conv=8)
    return ep_ops.build_episodes(t).localCheckpoint()


def test_reflexion_default_off_is_single_pass(spark):
    eps = _eps(spark)
    base = ex.extract_mentions(eps).toPandas()
    refl = ex.extract_mentions_reflexive(eps).toPandas()
    key = ["episode_uuid", "entity_name", "mention_order"]
    assert sorted(map(tuple, base[key].values.tolist())) == sorted(
        map(tuple, refl[key].values.tolist())
    )


def test_mention_reflexion_recovers_missed_entities(spark):
    eps = _eps(spark)
    # crippled first pass: speaker only (text blanked)
    speaker_only = lambda pdf: rules.extract_mentions_pdf(pdf.assign(text=""))
    crippled = ex.extract_mentions(eps, extractor=speaker_only).toPandas()
    full = ex.extract_mentions(eps).toPandas()
    assert set(crippled["entity_name"]) < set(full["entity_name"])
    refl = ex.extract_mentions_reflexive(
        eps, extractor=speaker_only, max_iterations=1
    ).toPandas()
    got = set(zip(refl["episode_uuid"], refl["entity_name"]))
    want = set(zip(full["episode_uuid"], full["entity_name"]))
    assert got == want
    # the recovered entities keep appending after the found ones
    by_ep = refl.groupby("episode_uuid")["mention_order"].nunique()
    cnt = refl.groupby("episode_uuid").size()
    assert (by_ep == cnt).all()


def test_triple_reflexion_recovers_missed_facts(spark):
    eps = _eps(spark)
    works_only = lambda pdf, rs=None: rules.extract_triples_pdf(
        pdf, rule_set=[rules.TRIPLE_RULES[0]]
    )
    full = ex.extract_triples(eps).toPandas()
    crippled = ex.extract_triples(eps, extractor=works_only).toPandas()
    assert set(crippled["pred"]) <= {"WORKS_AT"} and len(crippled) < len(full)
    refl = ex.extract_triples_reflexive(
        eps, extractor=works_only, max_iterations=1
    ).toPandas()
    key = ["episode_uuid", "subj_name", "pred", "obj_name"]
    assert sorted(map(tuple, refl[key].values.tolist())) == sorted(
        map(tuple, full[key].values.tolist())
    )
