"""Deterministic extraction rule engine — the pluggable LLM stand-in.

The reference implements mention detection / triple extraction /
dedupe verdicts / contradiction verdicts as structured-output LLM
prompts (graphiti_core/prompts/extract_nodes.py:82-191,
prompts/extract_edges.py:92-124, prompts/dedupe_nodes.py:106-168,
prompts/invalidate_edges.py:73-95). Those prompts are the *spec*; this
module is a deterministic rule engine implementing the same contract
(SURVEY.md §7.0) so that results are reproducible and the engine
doubles as the test oracle. An LLM-backed implementation can be
swapped in without changing the dataflow (see operators/extraction.py
Extractor protocol).

Contract replicated bit-for-bit:
  * speaker of a `message` episode is always extracted first
    (prompts/extract_nodes.py:105-106) — speaker = `role` column,
    which is "the part before the colon" in `role: text` content.
  * predicates are SCREAMING_SNAKE_CASE between two DISTINCT entities
    (prompts/extract_edges.py:108-115).
  * date rules (prompts/extract_edges.py:117-124 +
    edge_operations.py:211-225): present-tense/ongoing fact →
    valid_at = reference_time; termination statement → invalid_at =
    reference_time.
  * contradiction pairs (tests/utils/maintenance/
    test_temporal_operations_int.py:96-264): LIKES vs DISLIKES on the
    same (subj, obj); "no longer works at" terminates WORKS_AT.

Every rule's regex uses only syntax with identical semantics in
Python `re`, pandas `.str.extract`, Spark `regexp_extract`, and
DuckDB `regexp_extract`, so the DuckDB oracle can mirror extraction
exactly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd

# A proper name: one capitalized token, optionally two (to exercise
# alias dedupe: "Alice" vs "Alice Smith").
NAME = "[A-Z][A-Za-z]*(?: [A-Z][A-Za-z]*)?"

ASSERT = "assert"
TERMINATE = "terminate"
MENTION = "mention"


@dataclass(frozen=True)
class Rule:
    pattern: str  # anchored, 1 or 2 capture groups
    pred: str | None  # None → mention-only rule
    kind: str  # assert | terminate | mention
    fact_template: str  # '{s}'/'{o}' placeholders


RULES: list[Rule] = [
    Rule(rf"^({NAME}) works at ({NAME})\.$", "WORKS_AT", ASSERT, "{s} works at {o}"),
    Rule(
        rf"^({NAME}) no longer works at ({NAME})\.$",
        "WORKS_AT",
        TERMINATE,
        "{s} no longer works at {o}",
    ),
    Rule(rf"^({NAME}) moved to ({NAME})\.$", "LIVES_IN", ASSERT, "{s} lives in {o}"),
    Rule(rf"^({NAME}) likes ({NAME})\.$", "LIKES", ASSERT, "{s} likes {o}"),
    Rule(rf"^({NAME}) dislikes ({NAME})\.$", "DISLIKES", ASSERT, "{s} dislikes {o}"),
    Rule(rf"^({NAME}) is the CEO of ({NAME})\.$", "CEO_OF", ASSERT, "{s} is the CEO of {o}"),
    Rule(rf"^Tell me about ({NAME})\.$", None, MENTION, ""),
]

TRIPLE_RULES = [r for r in RULES if r.pred is not None]

# --- JSON episode rules (prompts/extract_nodes.py:131-160 extract_json:
# "extract the entities the JSON represents — often a name or user
# field; do NOT extract date properties"). The deterministic analog
# reads the flat key/value JSON rendered by the mixed corpus: the
# "name" value is the represented entity, "works_at" the related one.
# Patterns are plain regex over the JSON string so pandas, Spark and
# DuckDB mirror bit-for-bit (no JSON-extension dependency).
JSON_RULES: list[Rule] = [
    Rule(
        rf'^\{{"name": "({NAME})", "works_at": "({NAME})"\}}$',
        "WORKS_AT",
        ASSERT,
        "{s} works at {o}",
    ),
]
JSON_TRIPLE_RULES = [r for r in JSON_RULES if r.pred is not None]

# Antonym predicate pairs → contradiction on same (subj, obj)
# (deterministic analog of prompts/invalidate_edges.py:73-95).
ANTONYMS: dict[str, str] = {"LIKES": "DISLIKES", "DISLIKES": "LIKES"}

_COMPILED = [(re.compile(r.pattern), r) for r in RULES]

# --- F9 input cleaning (llm_client/client.py:68-88) -----------------------
# The reference cleans EVERY LLM input: zero-width/invisible unicode
# (​ ‌ ‍ ﻿ ⁠) and control chars below 0x20
# except \t \n \r are removed before the prompt is sent, so extracted
# names/facts can never contain them. The rule engine applies the same
# cleaning to its inputs in all engines; the byte-level
# encode('utf-8','ignore') step is a no-op here because parquet/Arrow
# strings are already valid unicode.
CLEAN_PATTERN_PY = (
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\u200b\\u200c\\u200d\\ufeff\\u2060]"
)
# RE2 (DuckDB) spelling of the identical character class
CLEAN_PATTERN_SQL = (
    r"[\x00-\x08\x0b\x0c\x0e-\x1f" + r"\x{200b}\x{200c}\x{200d}\x{feff}\x{2060}]"
)


def clean_series(s: pd.Series) -> pd.Series:
    """Vectorized _clean_input analog for pandas batches."""
    return s.str.replace(CLEAN_PATTERN_PY, "", regex=True)


# --- E2/E4 reflexion reflectors (node_operations.py:46-64, edge_
# operations.py:157-184) ----------------------------------------------------
# The reference's reflexion prompt asks "which entities/facts did you
# miss, given what you found" (prompts/extract_nodes.py:130-155,
# prompts/extract_edges.py:130-155). The deterministic analog: run the
# FULL rule sweep and subtract what the first pass already found. With
# the default (exhaustive) extractor this returns nothing — matching
# the reference's default MAX_REFLEXION_ITERATIONS=0 behavior — but a
# deliberately weaker extractor gets its misses recovered (tested).


def reflexion_mentions_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Input columns: uuid, group_id, role, text, found_names
    (list[str] per episode). Output: missed mention rows, mention_order
    continuing after the found ones."""
    full = extract_mentions_pdf(pdf[["uuid", "group_id", "role", "text"]])
    if len(full) == 0:
        return full
    found = {
        u: set(ns if ns is not None else [])
        for u, ns in zip(pdf["uuid"], pdf["found_names"])
    }
    n_found = {u: len(s) for u, s in found.items()}
    keep = [
        name not in found.get(ep, set())
        for ep, name in zip(full["episode_uuid"], full["entity_name"])
    ]
    out = full[pd.Series(keep, index=full.index)].copy()
    # missed entities append after the found ones (the reference folds
    # them into the next extraction round's context)
    out["mention_order"] = out["mention_order"] + out["episode_uuid"].map(
        lambda u: n_found.get(u, 0)
    )
    return out


def reflexion_triples_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Input columns: uuid, group_id, text, valid_at, found_facts
    (list[str] per episode). Output: missed triple rows."""
    full = extract_triples_pdf(pdf[["uuid", "group_id", "text", "valid_at"]])
    if len(full) == 0:
        return full
    found = {
        u: set(fs if fs is not None else [])
        for u, fs in zip(pdf["uuid"], pdf["found_facts"])
    }
    keep = [
        fact not in found.get(ep, set())
        for ep, fact in zip(full["episode_uuid"], full["fact"])
    ]
    return full[pd.Series(keep, index=full.index)].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Vectorized pandas implementations (used inside Arrow-batched UDFs AND as
# the pure-pandas reference oracle in tests — same code, per BASELINE.md).
# ---------------------------------------------------------------------------

_TRIPLE_COLS = [
    "episode_uuid", "group_id", "subj_name", "pred", "obj_name",
    "fact", "valid_at", "invalid_at",
]


def _unique_triple_hits(utext: pd.Series, rule_set: list[Rule]) -> pd.DataFrame:
    """Run every triple rule over UNIQUE texts → (u, subj_name, pred,
    obj_name, fact, kind) with u = position in the unique array."""
    import numpy as np

    hits: list[pd.DataFrame] = []
    for rule in rule_set:
        cap = utext.str.extract(rule.pattern)  # 2 capture groups
        hit = cap[0].notna()
        if not hit.any():
            continue
        s, o = cap.loc[hit, 0], cap.loc[hit, 1]
        hits.append(
            pd.DataFrame(
                {
                    "u": np.nonzero(hit.to_numpy())[0],
                    "subj_name": s.values,
                    "pred": rule.pred,
                    "obj_name": o.values,
                    "fact": [
                        rule.fact_template.format(s=sv, o=ov)
                        for sv, ov in zip(s.values, o.values)
                    ],
                    "kind": rule.kind,
                }
            )
        )
    if not hits:
        return pd.DataFrame(columns=["u", "subj_name", "pred", "obj_name", "fact", "kind"])
    uh = pd.concat(hits, ignore_index=True)
    # distinct-entity rule (prompts/extract_edges.py:108): drop self-loops
    return uh[uh["subj_name"].str.lower() != uh["obj_name"].str.lower()]


def extract_triples_pdf(
    pdf: pd.DataFrame, rule_set: list[Rule] | None = None
) -> pd.DataFrame:
    """(episode rows) → (triple rows). Vectorized AND memoized: the regex
    sweep runs once per UNIQUE text (np.unique), then results map back
    to rows by inverse index — templated/replicated corpora are heavily
    Zipf, so this cuts extraction CPU by the duplication factor (same
    trick as the vocabulary-keyed embedding, functions/embeddings.py).

    Input columns: uuid, group_id, text, valid_at (reference_time).
    Output columns: episode_uuid, group_id, subj_name, pred, obj_name,
                    fact, valid_at, invalid_at.
    Deterministic analog of extract_edges (edge_operations.py:110-244).
    `rule_set` selects the prompt family (default: message/text rules;
    JSON_TRIPLE_RULES for json episodes — prompts/extract_nodes.py:131).
    """
    import numpy as np

    # astype(str) after fillna keeps empty/NaN-typed batches total
    text = pdf["text"].fillna("").astype(str)
    if len(text) == 0:
        return pd.DataFrame(columns=_TRIPLE_COLS)
    uniq, inv = np.unique(text.to_numpy(dtype=object), return_inverse=True)
    # F9: clean AFTER uniquing — one pass per unique text, not per row
    uh = _unique_triple_hits(
        clean_series(pd.Series(uniq)), TRIPLE_RULES if rule_set is None else rule_set
    )
    if len(uh) == 0:
        return pd.DataFrame(columns=_TRIPLE_COLS)
    rows = pd.DataFrame(
        {
            "episode_uuid": pdf["uuid"].values,
            "group_id": pdf["group_id"].values,
            "ref_time": pdf["valid_at"].values,
            "u": inv,
        }
    )
    out = rows.merge(uh, on="u", how="inner")
    ref = pd.Series(out["ref_time"].values, index=out.index)
    out["valid_at"] = ref.where(out["kind"] == ASSERT, pd.NaT)
    out["invalid_at"] = ref.where(out["kind"] == TERMINATE, pd.NaT)
    return out[_TRIPLE_COLS].reset_index(drop=True)


def extract_mentions_pdf(
    pdf: pd.DataFrame, rule_set: list[Rule] | None = None
) -> pd.DataFrame:
    """(episode rows) → (mention rows): speaker first, then every name
    captured by any rule. Deterministic analog of extract_nodes
    (node_operations.py:67-173; speaker rule prompts/extract_nodes.py:105).

    Input columns: uuid, group_id, role, text.
    Output columns: episode_uuid, group_id, entity_name, mention_order.
    `rule_set` selects the prompt family; `text`/`json` episodes pass
    role='' so the speaker branch is a no-op (prompts/extract_nodes.py:
    163 extract_text has no speaker rule).
    """
    import numpy as np

    # speaker mention (order 0) — blank-name drop per node_operations.py:145
    # F9: the speaker name is LLM input too, so it is cleaned as well
    role_clean = clean_series(pdf["role"].fillna("").astype(str))
    spk = pdf[role_clean != ""]
    speaker = pd.DataFrame(
        {
            "episode_uuid": spk["uuid"].values,
            "group_id": spk["group_id"].values,
            "entity_name": role_clean[role_clean != ""].values,
            "mention_order": 0,
        }
    )
    # regex sweep memoized over UNIQUE texts (see extract_triples_pdf)
    text = pdf["text"].fillna("").astype(str)
    uniq, inv = (
        np.unique(text.to_numpy(dtype=object), return_inverse=True)
        if len(text)
        else (np.array([], dtype=object), np.array([], dtype=int))
    )
    utext = clean_series(pd.Series(uniq))
    uhits: list[pd.DataFrame] = []
    for rule in (RULES if rule_set is None else rule_set):
        cap = utext.str.extract(rule.pattern)
        for gi in range(cap.shape[1]):
            hit = cap[gi].notna()
            if not hit.any():
                continue
            uhits.append(
                pd.DataFrame(
                    {
                        "u": np.nonzero(hit.to_numpy())[0],
                        "entity_name": cap.loc[hit, gi].values,
                        "mention_order": gi + 1,
                    }
                )
            )
    if uhits:
        uh = pd.concat(uhits, ignore_index=True)
        rows = pd.DataFrame(
            {
                "episode_uuid": pdf["uuid"].values,
                "group_id": pdf["group_id"].values,
                "u": inv,
            }
        )
        captured = rows.merge(uh, on="u", how="inner").drop(columns=["u"])
        out = pd.concat([speaker, captured], ignore_index=True)
    else:
        out = speaker
    out = out[out["entity_name"].fillna("") != ""]
    # one mention per (episode, entity), keeping earliest order
    out = (
        out.sort_values(["episode_uuid", "mention_order"])
        .drop_duplicates(["episode_uuid", "entity_name"])
        .reset_index(drop=True)
    )
    return out


# ---------------------------------------------------------------------------
# DuckDB oracle SQL generation — mirrors the rules above exactly.
# ---------------------------------------------------------------------------

def _cleaned_table_sql(table: str, with_role: bool, with_valid_at: bool) -> str:
    """Subquery applying F9 input cleaning (CLEAN_PATTERN_SQL, 'g' flag
    — DuckDB regexp_replace is first-match-only by default) to the text
    (and role) columns, mirroring clean_series."""
    cols = ["uuid", "group_id"]
    if with_valid_at:
        cols.append("valid_at")
    if with_role:
        cols.append(f"regexp_replace(role, '{CLEAN_PATTERN_SQL}', '', 'g') AS role")
    cols.append(f"regexp_replace(text, '{CLEAN_PATTERN_SQL}', '', 'g') AS text")
    return f"(SELECT {', '.join(cols)} FROM {table})"


def triples_select_sql(table: str = "eps", rule_set: list[Rule] | None = None) -> str:
    """UNION ALL of one regexp_extract SELECT per triple rule; expects a
    relation `<table>(uuid, group_id, text, valid_at)` in scope."""
    table = _cleaned_table_sql(table, with_role=False, with_valid_at=True)
    parts = []
    for rule in (TRIPLE_RULES if rule_set is None else rule_set):
        pat = rule.pattern.replace("'", "''")
        valid = "valid_at" if rule.kind == ASSERT else "cast(NULL as timestamp)"
        invalid = "valid_at" if rule.kind == TERMINATE else "cast(NULL as timestamp)"
        fact = rule.fact_template.replace("{s}", "', s, '").replace("{o}", "', o, '")
        parts.append(
            f"""
    SELECT uuid AS episode_uuid, group_id,
           s AS subj_name, '{rule.pred}' AS pred, o AS obj_name,
           concat('{fact}') AS fact,
           {valid} AS valid_at, {invalid} AS invalid_at
    FROM (
      SELECT uuid, group_id, valid_at,
             regexp_extract(text, '{pat}', 1) AS s,
             regexp_extract(text, '{pat}', 2) AS o
      FROM {table}
      WHERE regexp_matches(text, '{pat}')
    ) WHERE lower(s) <> lower(o)"""
        )
    return "\n    UNION ALL".join(parts)


def triples_oracle_sql(episodes_cte: str) -> str:
    return f"WITH {episodes_cte}\n{triples_select_sql()}"


def mentions_select_sql(table: str = "eps", rule_set: list[Rule] | None = None) -> str:
    """Speaker + every captured name, deduped per (episode, entity) with
    earliest mention_order; expects `<table>(uuid, group_id, role, text)`."""
    table = _cleaned_table_sql(table, with_role=True, with_valid_at=False)
    parts = [
        f"""
    SELECT uuid AS episode_uuid, group_id, role AS entity_name, 0 AS mention_order
    FROM {table} WHERE coalesce(role, '') <> ''"""
    ]
    for rule in (RULES if rule_set is None else rule_set):
        pat = rule.pattern.replace("'", "''")
        n_groups = 1 if rule.pred is None else 2
        for gi in range(1, n_groups + 1):
            parts.append(
                f"""
    SELECT uuid AS episode_uuid, group_id,
           regexp_extract(text, '{pat}', {gi}) AS entity_name, {gi} AS mention_order
    FROM {table} WHERE regexp_matches(text, '{pat}')"""
            )
    body = "\n    UNION ALL".join(parts)
    return f"""SELECT episode_uuid, group_id, entity_name,
         cast(min(mention_order) as bigint) AS mention_order
  FROM ({body}) raw WHERE coalesce(entity_name, '') <> ''
  GROUP BY episode_uuid, group_id, entity_name"""


def mentions_oracle_sql(episodes_cte: str) -> str:
    return f"WITH {episodes_cte}\n{mentions_select_sql()}"
