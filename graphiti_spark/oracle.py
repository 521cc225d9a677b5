"""DuckDB oracle SQL builders for the driver correctness gate.

Each builder returns ANSI-ish SQL runnable by DuckDB against the
pre-registered parquet views (region nation customer supplier part
orders lineitem events documents embeddings). KG queries rebuild the
transcripts deterministically from `events` with the *identical*
statement Spark runs (transcripts.TRANSCRIPTS_SQL) and mirror the
extraction rule engine in SQL (rules.triples_select_sql) — so the
whole KG dataflow through bi-temporal invalidation is oracle-checked,
not just relational glue.

Cross-engine dialect notes (validated):
  * `cast(x AS string)` works in both (DuckDB aliases STRING→VARCHAR).
  * `least()` skips NULLs in both.
  * `ln` natural log in both (DuckDB `log` is log10 — never use bare log).
  * regex patterns avoid lookarounds (DuckDB is RE2).
"""

from __future__ import annotations

from graphiti_spark import rules
from graphiti_spark.transcripts import (
    ALIASED_TRANSCRIPTS_SQL,
    CHAIN_TRANSCRIPTS_SQL,
    MIXED_EPISODES_SELECT,
    TRANSCRIPTS_SQL,
)

CTE_TRANSCRIPTS = f"transcripts AS ({TRANSCRIPTS_SQL})"
CTE_TRANSCRIPTS_ALIAS = f"transcripts AS ({ALIASED_TRANSCRIPTS_SQL})"
CTE_TRANSCRIPTS_CHAIN = f"transcripts AS ({CHAIN_TRANSCRIPTS_SQL})"

CTE_EPS = """eps AS (
  SELECT md5(concat_ws('|', 'ep', conv_id, conv_id, cast(turn_idx AS string))) AS uuid,
         conv_id AS group_id, role, text,
         concat(role, ': ', text) AS content,
         turn_idx, ts AS valid_at
  FROM transcripts)"""

ANTONYM_CASE = "CASE pred WHEN 'LIKES' THEN 'DISLIKES' WHEN 'DISLIKES' THEN 'LIKES' END"


def kg_base_ctes() -> str:
    return f"{CTE_TRANSCRIPTS},\n{CTE_EPS}"


def kg_triples_ctes() -> str:
    return f"{kg_base_ctes()},\n  tri AS ({rules.triples_select_sql()})"


_MEN = rules.mentions_select_sql()


KG_EPISODES = f"""WITH {CTE_TRANSCRIPTS},
{CTE_EPS}
SELECT uuid, group_id, content, valid_at FROM eps"""

KG_PREV_WINDOW = f"""WITH {CTE_TRANSCRIPTS},
{CTE_EPS}
SELECT uuid, group_id,
       cast(coalesce(len(prev_uuids), 0) AS bigint) AS n_prev,
       coalesce(array_to_string(prev_uuids, ','), '') AS prev_concat
FROM (
  SELECT uuid, group_id,
         list(uuid) OVER (PARTITION BY group_id ORDER BY turn_idx
                          ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS prev_uuids
  FROM eps)"""

KG_MENTIONS = f"""WITH {CTE_TRANSCRIPTS},
{CTE_EPS}
{rules.mentions_select_sql()}"""

KG_TRIPLES = f"""WITH {kg_triples_ctes()}
SELECT episode_uuid, group_id, subj_name, pred, obj_name, fact, valid_at, invalid_at
FROM tri"""

KG_NODES = f"""WITH {CTE_TRANSCRIPTS},
{CTE_EPS},
  men AS ({rules.mentions_select_sql()})
SELECT DISTINCT md5(concat_ws('|', 'en', group_id, lower(entity_name))) AS uuid,
       entity_name AS name, group_id
FROM men"""

KG_MENTION_COUNTS = f"""WITH {CTE_TRANSCRIPTS},
{CTE_EPS},
  men AS ({rules.mentions_select_sql()})
SELECT group_id,
       md5(concat_ws('|', 'en', group_id, lower(entity_name))) AS entity_uuid,
       cast(count(*) AS bigint) AS n_mentions
FROM men GROUP BY 1, 2"""

# Full bi-temporal edge resolution mirrored in SQL (T1-T3 + dedupe).
# Parameterized so derived oracles (context rendering) can pull the
# resolved `fact` through without duplicating the temporal logic.
def kg_edges_sql(include_fact: bool = False) -> str:
    fact_first = ", f.fact AS fact" if include_fact else ""
    fact_term = (
        ", arg_min(fact, md5(concat_ws('|', 'ed', group_id, episode_uuid, subj_name, pred, obj_name))) AS fact"
        if include_fact
        else ""
    )
    return f"""WITH {kg_triples_ctes()},
asserted AS (SELECT * FROM tri WHERE valid_at IS NOT NULL),
term AS (SELECT * FROM tri WHERE invalid_at IS NOT NULL AND valid_at IS NULL),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY group_id, subj_name, pred, obj_name
                               ORDER BY valid_at, episode_uuid) AS rn
  FROM asserted),
merged AS (
  SELECT group_id, subj_name, pred, obj_name,
         min(valid_at) AS valid_at,
         count(DISTINCT episode_uuid) AS n_episodes
  FROM asserted GROUP BY 1, 2, 3, 4),
firstrow AS (SELECT * FROM ranked WHERE rn = 1),
inv AS (
  SELECT m.*,
    (SELECT min(t.invalid_at) FROM term t
      WHERE t.group_id = m.group_id AND t.subj_name = m.subj_name
        AND t.pred = m.pred AND t.obj_name = m.obj_name
        AND t.invalid_at > m.valid_at) AS term_invalid_at,
    (SELECT min(a2.valid_at) FROM merged a2
      WHERE a2.group_id = m.group_id AND a2.subj_name = m.subj_name
        AND a2.obj_name = m.obj_name AND a2.valid_at > m.valid_at
        AND a2.pred = (CASE m.pred WHEN 'LIKES' THEN 'DISLIKES'
                                   WHEN 'DISLIKES' THEN 'LIKES' END)) AS anto_invalid_at
  FROM merged m)
SELECT md5(concat_ws('|', 'ed', f.group_id, f.episode_uuid, f.subj_name, f.pred, f.obj_name)) AS uuid,
       i.group_id, i.subj_name, i.pred, i.obj_name, i.valid_at,
       least(i.term_invalid_at, i.anto_invalid_at) AS invalid_at,
       cast(i.n_episodes AS bigint) AS n_episodes{fact_first}
FROM inv i
JOIN firstrow f USING (group_id, subj_name, pred, obj_name)
UNION ALL
SELECT min(md5(concat_ws('|', 'ed', group_id, episode_uuid, subj_name, pred, obj_name))) AS uuid,
       group_id, subj_name, pred, obj_name,
       cast(NULL AS timestamp) AS valid_at,
       min(invalid_at) AS invalid_at,
       cast(count(DISTINCT episode_uuid) AS bigint) AS n_episodes{fact_term}
FROM term GROUP BY group_id, subj_name, pred, obj_name"""


KG_EDGES = kg_edges_sql()

# E5: deterministic node attribute/summary hydration — per raw entity,
# chronological digest of mention contexts, 250-word budget
# (node_operations.py:293-378; prompts/extract_nodes.py:250-309).
KG_NODE_SUMMARIES = f"""WITH {CTE_TRANSCRIPTS},
{CTE_EPS},
  men AS ({_MEN}),
  ctx AS (
    SELECT m.group_id,
           md5(concat_ws('|', 'en', m.group_id, lower(m.entity_name))) AS uuid,
           m.entity_name AS name, e.content, e.valid_at, e.uuid AS episode_uuid
    FROM men m JOIN eps e ON e.uuid = m.episode_uuid),
  digest AS (
    SELECT group_id, uuid, name,
           (list(content ORDER BY valid_at, episode_uuid))[1:20] AS ctxs,
           cast(count(*) AS bigint) AS n_contexts
    FROM ctx GROUP BY 1, 2, 3)
SELECT group_id, uuid, name,
       array_to_string(
         (list_filter(string_split(array_to_string(ctxs, ' '), ' '), w -> w <> ''))[1:250],
         ' ') AS summary,
       n_contexts
FROM digest"""

# S8/A4: orphan cascade candidates — entities mentioned by exactly one
# episode (graphiti.py:1036-1042).
KG_ORPHAN_ENTITIES = f"""WITH {CTE_TRANSCRIPTS},
{CTE_EPS},
  men AS ({_MEN})
SELECT group_id,
       md5(concat_ws('|', 'en', group_id, lower(entity_name))) AS entity_uuid,
       cast(count(DISTINCT episode_uuid) AS bigint) AS n_episodes
FROM men GROUP BY 1, 2 HAVING count(DISTINCT episode_uuid) = 1"""

# S9: cursor pagination — uuid < cursor ORDER BY uuid DESC LIMIT
# (nodes.py:221-241).
KG_NODES_PAGE = f"""WITH {CTE_TRANSCRIPTS},
{CTE_EPS},
  men AS ({_MEN}),
  n AS (
    SELECT DISTINCT md5(concat_ws('|', 'en', group_id, lower(entity_name))) AS uuid,
           entity_name AS name, group_id
    FROM men)
SELECT uuid, name, group_id FROM n
WHERE uuid < '80' ORDER BY uuid DESC LIMIT 20"""

# P2+P5: IS_DUPLICATE_OF edges from the deterministic dedupe verdict
# (edge_operations.py:66-89; verdict contract prompts/dedupe_nodes.py:
# 151-156 mirrored: lower-equal names, or first-token-equal + token
# subset alias rule).
KG_DUPLICATE_OF = f"""WITH {CTE_TRANSCRIPTS_ALIAS},
{CTE_EPS},
  men AS ({_MEN}),
  ent AS (
    SELECT DISTINCT group_id,
           md5(concat_ws('|', 'en', group_id, lower(entity_name))) AS uuid,
           entity_name AS name,
           list_distinct(list_filter(string_split_regex(lower(trim(entity_name)), '\\s+'),
                                     t -> t <> '')) AS toks,
           (list_filter(string_split_regex(lower(trim(entity_name)), '\\s+'),
                        t -> t <> ''))[1] AS ftok
    FROM men)
SELECT md5(concat_ws('|', 'dup', a.group_id, a.uuid, b.uuid)) AS uuid,
       a.uuid AS source_node_uuid, b.uuid AS target_node_uuid,
       a.group_id,
       'IS_DUPLICATE_OF' AS name,
       concat(a.name, ' is a duplicate of ', b.name) AS fact
FROM ent a JOIN ent b
  ON a.group_id = b.group_id AND a.uuid < b.uuid
WHERE lower(a.name) = lower(b.name)
   OR (a.ftok = b.ftok
       AND (list_has_all(a.toks, b.toks) OR list_has_all(b.toks, a.toks)))"""

# Precondition of the pair-component canonical rule used by
# KG_CANONICAL_MAP / KG_EDGES_CANONICAL below: least(raw, min(direct
# partner)) equals the true component-min ONLY when every duplicate
# component has size exactly 2 (one short/full alias pair per group).
# A future corpus change producing 3+ alias chains would make those
# oracles silently diverge from the Spark connected-components result,
# so the harness runs this first and fails loudly: rows = entities
# participating in more than one duplicate pair per group (must be 0).
ASSERT_PAIR_COMPONENTS = f"""WITH {CTE_TRANSCRIPTS_ALIAS},
{CTE_EPS},
  men AS ({_MEN}),
  ent AS (
    SELECT DISTINCT group_id,
           md5(concat_ws('|', 'en', group_id, lower(entity_name))) AS uuid,
           entity_name AS name,
           list_distinct(list_filter(string_split_regex(lower(trim(entity_name)), '\\s+'),
                                     t -> t <> '')) AS toks,
           (list_filter(string_split_regex(lower(trim(entity_name)), '\\s+'),
                        t -> t <> ''))[1] AS ftok
    FROM men),
  dup AS (
    SELECT a.group_id, a.uuid AS au, b.uuid AS bu
    FROM ent a JOIN ent b
      ON a.group_id = b.group_id AND a.uuid < b.uuid
    WHERE lower(a.name) = lower(b.name)
       OR (a.ftok = b.ftok
           AND (list_has_all(a.toks, b.toks) OR list_has_all(b.toks, a.toks))))
SELECT group_id, uuid, cast(count(*) AS bigint) AS degree
FROM (SELECT group_id, au AS uuid FROM dup
      UNION ALL
      SELECT group_id, bu AS uuid FROM dup)
GROUP BY 1, 2 HAVING count(*) > 1"""

# G1: canonicalization uuid_map over the aliased corpus. The alias
# vocabulary yields duplicate components of size exactly 2 (short name
# ↔ full name), so component-min canonicalization is expressible as
# least(self, min(direct partners)) — the Spark side runs the real
# connected-components operator; this oracle is exact for the pair-
# structured components the corpus produces (bulk_utils.py:392-396:
# canonical = lexicographically smallest uuid in component).
KG_CANONICAL_MAP = f"""WITH {CTE_TRANSCRIPTS_ALIAS},
{CTE_EPS},
  men AS ({_MEN}),
  ent AS (
    SELECT DISTINCT group_id,
           md5(concat_ws('|', 'en', group_id, lower(entity_name))) AS uuid,
           entity_name AS name,
           list_distinct(list_filter(string_split_regex(lower(trim(entity_name)), '\\s+'),
                                     t -> t <> '')) AS toks,
           (list_filter(string_split_regex(lower(trim(entity_name)), '\\s+'),
                        t -> t <> ''))[1] AS ftok
    FROM men),
  dup AS (
    SELECT a.group_id, a.uuid AS au, b.uuid AS bu
    FROM ent a JOIN ent b
      ON a.group_id = b.group_id AND a.uuid < b.uuid
    WHERE lower(a.name) = lower(b.name)
       OR (a.ftok = b.ftok
           AND (list_has_all(a.toks, b.toks) OR list_has_all(b.toks, a.toks)))),
  touched AS (
    SELECT group_id, au AS raw, bu AS other FROM dup
    UNION ALL
    SELECT group_id, bu AS raw, au AS other FROM dup)
SELECT raw AS raw_uuid,
       least(raw, min(other)) AS canonical_uuid,
       group_id
FROM touched GROUP BY group_id, raw"""

# Typed entities (entity_types analog, graphiti.py:362-366 +
# node_operations.py:293-378): labels derive from predicate
# participation (the deterministic classifier in operators/ontology.py),
# Person nodes get first/last-name attributes. Votes come from the
# triples (assertions + terminations), matching the Spark side's votes
# from resolved edges 1:1 — every triple key yields an edge row.
_VOTES = """
    SELECT group_id, lower(subj_name) AS ename, 'Person' AS label FROM tri
      WHERE pred IN ('WORKS_AT','CEO_OF','LIVES_IN','LIKES','DISLIKES')
    UNION
    SELECT group_id, lower(obj_name) AS ename, 'Organization' AS label FROM tri
      WHERE pred IN ('WORKS_AT','CEO_OF')
    UNION
    SELECT group_id, lower(obj_name) AS ename, 'City' AS label FROM tri
      WHERE pred = 'LIVES_IN'
    UNION
    SELECT group_id, lower(obj_name) AS ename, 'Person' AS label FROM tri
      WHERE pred IN ('LIKES','DISLIKES')"""

KG_TYPED_NODES = f"""WITH {kg_triples_ctes()},
  men AS ({_MEN}),
  votes AS ({_VOTES}),
  lab AS (
    SELECT group_id, ename, list_sort(list(DISTINCT label)) AS tl
    FROM votes GROUP BY 1, 2),
  ceoagg AS (
    SELECT group_id, lower(obj_name) AS ename, min(subj_name) AS ceo
    FROM tri WHERE pred = 'CEO_OF' GROUP BY 1, 2),
  empagg AS (
    SELECT group_id, lower(subj_name) AS ename, min(obj_name) AS employer
    FROM tri WHERE pred = 'WORKS_AT' GROUP BY 1, 2),
  n AS (
    SELECT DISTINCT group_id,
           md5(concat_ws('|', 'en', group_id, lower(entity_name))) AS uuid,
           entity_name AS name, lower(entity_name) AS ename
    FROM men)
SELECT n.uuid, n.name, n.group_id,
       concat('Entity', CASE WHEN l.tl IS NULL THEN ''
                             ELSE concat(',', array_to_string(l.tl, ',')) END) AS labels,
       l.tl[1] AS entity_type,
       CASE WHEN l.tl[1] = 'Person'
            THEN (string_split_regex(trim(n.name), '\\s+'))[1] END AS first_name,
       CASE WHEN l.tl[1] = 'Person'
            THEN CASE WHEN len(string_split_regex(trim(n.name), '\\s+')) > 1
                      THEN (string_split_regex(trim(n.name), '\\s+'))[-1]
                      ELSE '' END END AS last_name,
       CASE WHEN l.tl[1] = 'Organization' THEN c.ceo END AS ceo,
       CASE WHEN l.tl[1] = 'Person' THEN e.employer END AS employer
FROM n LEFT JOIN lab l ON l.group_id = n.group_id AND l.ename = n.ename
LEFT JOIN ceoagg c ON c.group_id = n.group_id AND c.ename = n.ename
LEFT JOIN empagg e ON e.group_id = n.group_id AND e.ename = n.ename"""

# Typed edges (edge_type_map routing, edge_operations.py:274-301 +
# 444-462): the query uses a map WITHOUT (Person, City) so both
# branches are exercised — LIVES_IN keeps its extracted name while
# EMPLOYMENT / LEADERSHIP / SENTIMENT rename.
KG_TYPED_EDGES = f"""WITH {kg_triples_ctes()},
  votes AS ({_VOTES}),
  lab AS (
    SELECT group_id, ename, list_sort(list(DISTINCT label)) AS tl
    FROM votes GROUP BY 1, 2),
  base AS ({{kg_edges}}),
  j AS (
    SELECT b.*,
           coalesce(ls.tl, []) AS sl, coalesce(lt.tl, []) AS tl,
           CASE b.pred WHEN 'WORKS_AT' THEN 'EMPLOYMENT'
                       WHEN 'CEO_OF' THEN 'LEADERSHIP'
                       WHEN 'LIVES_IN' THEN 'RESIDENCE'
                       WHEN 'LIKES' THEN 'SENTIMENT'
                       WHEN 'DISLIKES' THEN 'SENTIMENT' END AS ft
    FROM base b
    LEFT JOIN lab ls ON ls.group_id = b.group_id AND ls.ename = lower(b.subj_name)
    LEFT JOIN lab lt ON lt.group_id = b.group_id AND lt.ename = lower(b.obj_name))
SELECT uuid, group_id, subj_name,
       CASE WHEN matched THEN ft ELSE pred END AS name,
       obj_name, valid_at, invalid_at,
       CASE WHEN matched THEN ft END AS fact_type
FROM (
  SELECT *,
    ((list_contains(sl, 'Person') AND list_contains(tl, 'Organization')
        AND ft IN ('EMPLOYMENT', 'LEADERSHIP'))
     OR (list_contains(sl, 'Person') AND list_contains(tl, 'Person')
        AND ft IN ('SENTIMENT'))) AND ft IS NOT NULL AS matched
  FROM j)"""
# splice the full KG_EDGES query in as the `base` CTE body (nested WITH
# is legal in DuckDB; its inner CTEs shadow the identical outer ones).
# str.replace, NOT .format: the F9 clean pattern embeds RE2 `\x{200b}`
# braces that .format would treat as (invalid) placeholders
KG_TYPED_EDGES = KG_TYPED_EDGES.replace("{kg_edges}", KG_EDGES)


# §3.2 step 9: resolve-vs-EXISTING-graph (graphiti.py:722-781 +
# node_operations.py:176-290). Batch A = even turns materializes its
# canonical nodes; batch B = odd turns dedupes within itself, then every
# B surface probes A's nodes with the same verdict (exact name outranks
# the alias subset rule; ties take min uuid) and a match remaps B's
# whole within-batch component onto the EXISTING node's uuid (existing
# always wins — unlike within-batch lexicographic min). Mirrors
# operators/graph_resolution.py exactly, incl. the two-stage tie-break:
# per-surface (rank, uuid) min, then per-component min over the chosen
# targets.
KG_CROSS_BATCH_MAP = f"""WITH {CTE_TRANSCRIPTS_ALIAS},
{CTE_EPS},
  men AS ({_MEN}),
  men2 AS (
    SELECT m.group_id, m.entity_name, e.turn_idx % 2 AS par
    FROM men m JOIN eps e ON e.uuid = m.episode_uuid),
  ent_a AS (
    SELECT DISTINCT group_id,
           md5(concat_ws('|', 'en', group_id, lower(entity_name))) AS uuid,
           entity_name AS name,
           list_distinct(list_filter(string_split_regex(lower(trim(entity_name)), '\\s+'),
                                     t -> t <> '')) AS toks,
           (list_filter(string_split_regex(lower(trim(entity_name)), '\\s+'),
                        t -> t <> ''))[1] AS ftok
    FROM men2 WHERE par = 0),
  ent_b AS (
    SELECT DISTINCT group_id,
           md5(concat_ws('|', 'en', group_id, lower(entity_name))) AS uuid,
           entity_name AS name,
           list_distinct(list_filter(string_split_regex(lower(trim(entity_name)), '\\s+'),
                                     t -> t <> '')) AS toks,
           (list_filter(string_split_regex(lower(trim(entity_name)), '\\s+'),
                        t -> t <> ''))[1] AS ftok
    FROM men2 WHERE par = 1),
  dup_a AS (
    SELECT a.group_id, a.uuid AS au, b.uuid AS bu
    FROM ent_a a JOIN ent_a b
      ON a.group_id = b.group_id AND a.uuid < b.uuid
    WHERE lower(a.name) = lower(b.name)
       OR (a.ftok = b.ftok
           AND (list_has_all(a.toks, b.toks) OR list_has_all(b.toks, a.toks)))),
  mapped_away_a AS (
    SELECT group_id, raw FROM (
      SELECT group_id, au AS raw, bu AS other FROM dup_a
      UNION ALL SELECT group_id, bu AS raw, au AS other FROM dup_a)
    GROUP BY group_id, raw HAVING least(raw, min(other)) <> raw),
  nodes_a AS (
    SELECT e.* FROM ent_a e
    LEFT JOIN mapped_away_a m ON m.group_id = e.group_id AND m.raw = e.uuid
    WHERE m.raw IS NULL),
  dup_b AS (
    SELECT a.group_id, a.uuid AS au, b.uuid AS bu
    FROM ent_b a JOIN ent_b b
      ON a.group_id = b.group_id AND a.uuid < b.uuid
    WHERE lower(a.name) = lower(b.name)
       OR (a.ftok = b.ftok
           AND (list_has_all(a.toks, b.toks) OR list_has_all(b.toks, a.toks)))),
  canon_b AS (
    SELECT group_id, raw, least(raw, min(other)) AS canonical FROM (
      SELECT group_id, au AS raw, bu AS other FROM dup_b
      UNION ALL SELECT group_id, bu AS raw, au AS other FROM dup_b)
    GROUP BY group_id, raw),
  match_raw AS (
    SELECT b.group_id, b.uuid AS raw_uuid,
           coalesce(min(CASE WHEN lower(b.name) = lower(a.name) THEN a.uuid END),
                    min(a.uuid)) AS existing_uuid
    FROM ent_b b JOIN nodes_a a ON a.group_id = b.group_id
    WHERE lower(a.name) = lower(b.name)
       OR (a.ftok = b.ftok
           AND (list_has_all(a.toks, b.toks) OR list_has_all(b.toks, a.toks)))
    GROUP BY 1, 2),
  within AS (
    SELECT e.group_id, e.uuid AS raw_uuid, coalesce(c.canonical, e.uuid) AS wc
    FROM ent_b e LEFT JOIN canon_b c ON c.group_id = e.group_id AND c.raw = e.uuid),
  comp AS (
    SELECT w.group_id, w.wc, min(m.existing_uuid) AS ex
    FROM within w JOIN match_raw m
      ON m.group_id = w.group_id AND m.raw_uuid = w.raw_uuid
    GROUP BY 1, 2)
SELECT w.raw_uuid, coalesce(c.ex, w.wc) AS canonical_uuid, w.group_id
FROM within w LEFT JOIN comp c ON c.group_id = w.group_id AND c.wc = w.wc
WHERE w.raw_uuid <> coalesce(c.ex, w.wc)"""

# Flagship cross-check: the FULL dataflow — extraction → dedupe verdict
# → canonicalization → edge dedupe → bi-temporal invalidation — over the
# aliased corpus, keyed on canonical entity uuids. Alias surfaces merge,
# so e.g. "Alice likes Bob" invalidates against a later
# "Alice Smith dislikes Bob" (canonicalization feeding T1-T3). Uses the
# pair-component canonical rule (see KG_CANONICAL_MAP).
KG_EDGES_CANONICAL = f"""WITH {CTE_TRANSCRIPTS_ALIAS},
{CTE_EPS},
  men AS ({_MEN}),
  ent AS (
    SELECT DISTINCT group_id,
           md5(concat_ws('|', 'en', group_id, lower(entity_name))) AS uuid,
           entity_name AS name,
           list_distinct(list_filter(string_split_regex(lower(trim(entity_name)), '\\s+'),
                                     t -> t <> '')) AS toks,
           (list_filter(string_split_regex(lower(trim(entity_name)), '\\s+'),
                        t -> t <> ''))[1] AS ftok
    FROM men),
  dup AS (
    SELECT a.group_id, a.uuid AS au, b.uuid AS bu
    FROM ent a JOIN ent b
      ON a.group_id = b.group_id AND a.uuid < b.uuid
    WHERE lower(a.name) = lower(b.name)
       OR (a.ftok = b.ftok
           AND (list_has_all(a.toks, b.toks) OR list_has_all(b.toks, a.toks)))),
  touched AS (
    SELECT group_id, au AS raw, bu AS other FROM dup
    UNION ALL
    SELECT group_id, bu AS raw, au AS other FROM dup),
  cmap AS (
    SELECT group_id, raw, least(raw, min(other)) AS canon
    FROM touched GROUP BY group_id, raw),
  tri AS ({rules.triples_select_sql()}),
  tric AS (
    SELECT t.*,
           md5(concat_ws('|', 'ed', t.group_id, t.episode_uuid,
                         t.subj_name, t.pred, t.obj_name)) AS edge_uuid,
           coalesce(cs.canon, md5(concat_ws('|', 'en', t.group_id, lower(t.subj_name)))) AS csubj,
           coalesce(co.canon, md5(concat_ws('|', 'en', t.group_id, lower(t.obj_name)))) AS cobj
    FROM tri t
    LEFT JOIN cmap cs ON cs.group_id = t.group_id
      AND cs.raw = md5(concat_ws('|', 'en', t.group_id, lower(t.subj_name)))
    LEFT JOIN cmap co ON co.group_id = t.group_id
      AND co.raw = md5(concat_ws('|', 'en', t.group_id, lower(t.obj_name)))),
  asserted AS (SELECT * FROM tric WHERE valid_at IS NOT NULL),
  term AS (SELECT * FROM tric WHERE invalid_at IS NOT NULL AND valid_at IS NULL),
  ranked AS (
    SELECT *, row_number() OVER (PARTITION BY group_id, csubj, cobj, pred
                                 ORDER BY valid_at, episode_uuid) AS rn
    FROM asserted),
  firstrow AS (SELECT * FROM ranked WHERE rn = 1),
  merged AS (
    SELECT group_id, csubj, cobj, pred,
           min(valid_at) AS valid_at,
           count(DISTINCT episode_uuid) AS n_episodes
    FROM asserted GROUP BY 1, 2, 3, 4),
  inv AS (
    SELECT m.*,
      (SELECT min(t.invalid_at) FROM term t
        WHERE t.group_id = m.group_id AND t.csubj = m.csubj
          AND t.cobj = m.cobj AND t.pred = m.pred
          AND t.invalid_at > m.valid_at) AS term_invalid_at,
      (SELECT min(a2.valid_at) FROM merged a2
        WHERE a2.group_id = m.group_id AND a2.csubj = m.csubj
          AND a2.cobj = m.cobj AND a2.valid_at > m.valid_at
          AND a2.pred = (CASE m.pred WHEN 'LIKES' THEN 'DISLIKES'
                                     WHEN 'DISLIKES' THEN 'LIKES' END)) AS anto_invalid_at
    FROM merged m)
SELECT f.edge_uuid AS uuid, i.group_id, f.subj_name, i.pred, f.obj_name, i.valid_at,
       least(i.term_invalid_at, i.anto_invalid_at) AS invalid_at,
       cast(i.n_episodes AS bigint) AS n_episodes
FROM inv i
JOIN firstrow f ON f.group_id = i.group_id AND f.csubj = i.csubj
  AND f.cobj = i.cobj AND f.pred = i.pred
UNION ALL
SELECT min(edge_uuid) AS uuid, group_id,
       arg_min(subj_name, edge_uuid) AS subj_name, pred,
       arg_min(obj_name, edge_uuid) AS obj_name,
       cast(NULL AS timestamp) AS valid_at,
       min(invalid_at) AS invalid_at,
       cast(count(DISTINCT episode_uuid) AS bigint) AS n_episodes
FROM term GROUP BY group_id, csubj, cobj, pred"""

def _kg_resolution_ctes(transcripts_cte: str) -> str:
    """The KG_EDGES_CANONICAL middle block — entity dedupe map + triple
    extraction + pointer rewrite + asserted/term split — parameterized
    on the transcripts source, for derived oracles (episode subgraph).
    Mirrors dedupe.resolve_nodes + edge_resolution.resolve_edges keying
    exactly; see KG_EDGES_CANONICAL for the per-CTE commentary."""
    return f"""{transcripts_cte},
{CTE_EPS},
  men AS ({_MEN}),
  ent AS (
    SELECT DISTINCT group_id,
           md5(concat_ws('|', 'en', group_id, lower(entity_name))) AS uuid,
           entity_name AS name,
           list_distinct(list_filter(string_split_regex(lower(trim(entity_name)), '\\s+'),
                                     t -> t <> '')) AS toks,
           (list_filter(string_split_regex(lower(trim(entity_name)), '\\s+'),
                        t -> t <> ''))[1] AS ftok
    FROM men),
  dup AS (
    SELECT a.group_id, a.uuid AS au, b.uuid AS bu
    FROM ent a JOIN ent b
      ON a.group_id = b.group_id AND a.uuid < b.uuid
    WHERE lower(a.name) = lower(b.name)
       OR (a.ftok = b.ftok
           AND (list_has_all(a.toks, b.toks) OR list_has_all(b.toks, a.toks)))),
  touched AS (
    SELECT group_id, au AS raw, bu AS other FROM dup
    UNION ALL
    SELECT group_id, bu AS raw, au AS other FROM dup),
  cmap AS (
    SELECT group_id, raw, least(raw, min(other)) AS canon
    FROM touched GROUP BY group_id, raw),
  tri AS ({rules.triples_select_sql()}),
  tric AS (
    SELECT t.*,
           md5(concat_ws('|', 'ed', t.group_id, t.episode_uuid,
                         t.subj_name, t.pred, t.obj_name)) AS edge_uuid,
           coalesce(cs.canon, md5(concat_ws('|', 'en', t.group_id, lower(t.subj_name)))) AS csubj,
           coalesce(co.canon, md5(concat_ws('|', 'en', t.group_id, lower(t.obj_name)))) AS cobj
    FROM tri t
    LEFT JOIN cmap cs ON cs.group_id = t.group_id
      AND cs.raw = md5(concat_ws('|', 'en', t.group_id, lower(t.subj_name)))
    LEFT JOIN cmap co ON co.group_id = t.group_id
      AND co.raw = md5(concat_ws('|', 'en', t.group_id, lower(t.obj_name)))),
  asserted AS (SELECT * FROM tric WHERE valid_at IS NOT NULL),
  term AS (SELECT * FROM tric WHERE invalid_at IS NOT NULL AND valid_at IS NULL),
  ranked AS (
    SELECT *, row_number() OVER (PARTITION BY group_id, csubj, cobj, pred
                                 ORDER BY valid_at, episode_uuid) AS rn
    FROM asserted),
  firstrow AS (SELECT * FROM ranked WHERE rn = 1)"""


# S8/§3 get_nodes_and_edges_by_episode (graphiti.py:965-977): edges via
# the episodes' entity_edges back-references (= the canonical edges
# whose provenance `episodes` set contains the episode), nodes via
# MENTIONS targets, for the first 5 episodes (by uuid) that created at
# least one edge. Provenance mirrors edge_resolution.resolve_edges:
# asserted edges carry the asserted rows' episode set keyed to the
# rn=1 edge uuid; termination edges carry the term rows' episode set
# keyed to the min term edge uuid.
_KG_PROV_CTES = """termg AS (
    SELECT group_id, csubj, cobj, pred, min(edge_uuid) AS uuid
    FROM term GROUP BY 1, 2, 3, 4),
  prov AS (
    SELECT f.edge_uuid AS uuid, a.episode_uuid
    FROM asserted a JOIN firstrow f
      ON f.group_id = a.group_id AND f.csubj = a.csubj
     AND f.cobj = a.cobj AND f.pred = a.pred
    UNION
    SELECT g.uuid, t.episode_uuid
    FROM term t JOIN termg g
      ON g.group_id = t.group_id AND g.csubj = t.csubj
     AND g.cobj = t.cobj AND g.pred = t.pred)"""

KG_EPISODE_SUBGRAPH = f"""WITH {{ctes}},
  {{prov}},
  ep_sel AS (
    SELECT DISTINCT episode_uuid FROM prov ORDER BY episode_uuid LIMIT 5)
SELECT 'edge' AS object, uuid FROM (
  SELECT DISTINCT p.uuid FROM prov p
  WHERE p.episode_uuid IN (SELECT episode_uuid FROM ep_sel))
UNION ALL
SELECT 'node' AS object, uuid FROM (
  SELECT DISTINCT coalesce(c.canon, m.raw) AS uuid
  FROM (SELECT episode_uuid, group_id,
               md5(concat_ws('|', 'en', group_id, lower(entity_name))) AS raw
        FROM men) m
  LEFT JOIN cmap c ON c.group_id = m.group_id AND c.raw = m.raw
  WHERE m.episode_uuid IN (SELECT episode_uuid FROM ep_sel))""".format(
    ctes=_kg_resolution_ctes(CTE_TRANSCRIPTS_ALIAS), prov=_KG_PROV_CTES
)

# S8 remove_episode cascade (graphiti.py:1019-1052), oracle-checked as
# per-table delete counts: the episode row itself; edges whose FIRST
# provenance entry (min episode uuid of the sorted set) is the removed
# episode; entities mentioned by no other episode; the episode's
# mention rows. Episode selection mirrors the Spark query: the minimum
# episode uuid present in the canonical mentions table.
KG_REMOVE_EPISODE = """WITH {ctes},
  {prov},
  mcanon AS (
    SELECT DISTINCT m.episode_uuid, m.group_id, coalesce(c.canon, m.raw) AS target
    FROM (SELECT episode_uuid, group_id,
                 md5(concat_ws('|', 'en', group_id, lower(entity_name))) AS raw
          FROM men) m
    LEFT JOIN cmap c ON c.group_id = m.group_id AND c.raw = m.raw),
  ep AS (SELECT min(episode_uuid) AS u FROM mcanon),
  edge_first AS (SELECT uuid, min(episode_uuid) AS first_ep FROM prov GROUP BY uuid),
  nodecnt AS (SELECT target, count(DISTINCT episode_uuid) AS n_eps FROM mcanon GROUP BY target)
SELECT 'episodes' AS "table", cast(1 AS bigint) AS n_removed
UNION ALL
SELECT 'edges', (SELECT cast(count(*) AS bigint)
                 FROM edge_first, ep WHERE first_ep = ep.u)
UNION ALL
SELECT 'nodes', (SELECT cast(count(*) AS bigint)
                 FROM (SELECT m.target FROM mcanon m, ep WHERE m.episode_uuid = ep.u) t
                 JOIN nodecnt n ON n.target = t.target WHERE n.n_eps = 1)
UNION ALL
SELECT 'mentions', (SELECT cast(count(*) AS bigint)
                    FROM mcanon, ep WHERE episode_uuid = ep.u)""".format(
    ctes=_kg_resolution_ctes(CTE_TRANSCRIPTS), prov=_KG_PROV_CTES
)

# G1 true connected components, oracle-checked: over the CHAIN corpus
# (star-shaped duplicate components through the base surface form —
# see transcripts.CHAIN_TRANSCRIPTS_SQL) a one-hop least(raw,
# min(neighbor)) map diverges from component minima whenever the md5
# minimum is a leaf, so this oracle replicates the executor-side
# union-find with a recursive-CTE reachability closure instead
# (same pattern as curation_pipeline_sql's `reach`). Rows mirror
# connected_components.uuid_map_from_pairs: every vertex of the pair
# graph (identity rows for untouched entities omitted).
KG_UUID_MAP_ALIAS = f"""WITH RECURSIVE {CTE_TRANSCRIPTS_CHAIN},
{CTE_EPS},
  men AS ({_MEN}),
  ent AS (
    SELECT DISTINCT group_id,
           md5(concat_ws('|', 'en', group_id, lower(entity_name))) AS uuid,
           entity_name AS name,
           list_distinct(list_filter(string_split_regex(lower(trim(entity_name)), '\\s+'),
                                     t -> t <> '')) AS toks,
           (list_filter(string_split_regex(lower(trim(entity_name)), '\\s+'),
                        t -> t <> ''))[1] AS ftok
    FROM men),
  dup AS (
    SELECT a.group_id, a.uuid AS au, b.uuid AS bu
    FROM ent a JOIN ent b
      ON a.group_id = b.group_id AND a.uuid < b.uuid
    WHERE lower(a.name) = lower(b.name)
       OR (a.ftok = b.ftok
           AND (list_has_all(a.toks, b.toks) OR list_has_all(b.toks, a.toks)))),
  edges AS (
    SELECT group_id, au AS a, bu AS b FROM dup
    UNION
    SELECT group_id, bu AS a, au AS b FROM dup),
  reach AS (
    SELECT group_id, a, b FROM edges
    UNION
    SELECT r.group_id, r.a, e.b
    FROM reach r JOIN edges e ON e.group_id = r.group_id AND e.a = r.b)
SELECT a AS raw_uuid, least(a, min(b)) AS canonical_uuid, group_id
FROM reach GROUP BY group_id, a"""


# §3 add_triplet batch analog (graphiti.py:979-1017), oracle-checked
# by CONSTRUCTION: the driver query inserts two manual triplets (Zed
# LIKES/DISLIKES Yara, valid 03-01/04-01) into the group with the
# minimum group_id and returns the resolved Zed edges. No existing
# edge touches the (Zed, Yara) endpoints, so the expected output is
# derivable independently: content-derived uuids (ids.py composition
# with the 'manual' episode id) and antonym invalidation between the
# two rows (LIKES invalidated by the later DISLIKES assertion;
# DISLIKES stays open because its antonym precedes it). The one live
# input is the group selection, recomputed from the corpus (min
# group_id among groups holding at least one triple — every triple key
# yields an edge row, so edge groups == triple groups).
KG_ADD_TRIPLETS = f"""WITH {kg_triples_ctes()},
  g AS (SELECT min(group_id) AS gid FROM tri),
  ins AS (
    SELECT gid, 'Zed' AS subj, v.pred, 'Yara' AS obj, v.valid_at, v.invalid_at
    FROM g CROSS JOIN (VALUES
      ('LIKES', timestamp '2025-03-01 00:00:00', timestamp '2025-04-01 00:00:00'),
      ('DISLIKES', timestamp '2025-04-01 00:00:00', cast(NULL AS timestamp))
    ) v(pred, valid_at, invalid_at))
SELECT md5(concat_ws('|', 'ed', gid,
           md5(concat_ws('|', 'manual', gid, subj, pred, obj)),
           subj, pred, obj)) AS uuid,
       pred AS name, valid_at, invalid_at
FROM ins"""


# J2/J4-edge: candidate edge pairs — same undirected endpoints + fact
# word-overlap (search_utils.py:734-800; bulk_utils.py:297,313-337).
KG_EDGE_CANDIDATE_PAIRS = f"""WITH {kg_triples_ctes()},
  e AS (
    SELECT group_id,
           md5(concat_ws('|', 'ed', group_id, episode_uuid, subj_name, pred, obj_name)) AS uuid,
           least(md5(concat_ws('|', 'en', group_id, lower(subj_name))),
                 md5(concat_ws('|', 'en', group_id, lower(obj_name)))) AS e1,
           greatest(md5(concat_ws('|', 'en', group_id, lower(subj_name))),
                    md5(concat_ws('|', 'en', group_id, lower(obj_name)))) AS e2,
           list_distinct(list_filter(string_split_regex(lower(trim(fact)), '\\s+'),
                                     t -> t <> '')) AS toks
    FROM tri)
SELECT a.group_id, a.uuid AS src, b.uuid AS dst,
       cast(len(list_intersect(a.toks, b.toks)) AS bigint) AS overlap
FROM e a JOIN e b
  ON a.group_id = b.group_id AND a.e1 = b.e1 AND a.e2 = b.e2 AND a.uuid < b.uuid
WHERE len(list_intersect(a.toks, b.toks)) > 0"""

# G7: BFS over RELATES_TO within depth 2, origin = lexicographically
# smallest endpoint name per group (search_utils.py:252-296).
KG_BFS = f"""WITH {kg_triples_ctes()},
  adj AS (
    SELECT DISTINCT group_id, subj_name AS a, obj_name AS b FROM tri
    UNION
    SELECT DISTINCT group_id, obj_name AS a, subj_name AS b FROM tri),
  o AS (SELECT group_id, min(a) AS name FROM adj GROUP BY group_id),
  d1 AS (
    SELECT DISTINCT adj.group_id, adj.b AS name
    FROM adj JOIN o ON adj.group_id = o.group_id AND adj.a = o.name),
  d1n AS (
    SELECT d1.group_id, d1.name FROM d1
    WHERE NOT EXISTS (SELECT 1 FROM o WHERE o.group_id = d1.group_id AND o.name = d1.name)),
  d2 AS (
    SELECT DISTINCT adj.group_id, adj.b AS name
    FROM adj JOIN d1n ON adj.group_id = d1n.group_id AND adj.a = d1n.name),
  d2n AS (
    SELECT d2.group_id, d2.name FROM d2
    WHERE NOT EXISTS (SELECT 1 FROM o WHERE o.group_id = d2.group_id AND o.name = d2.name)
      AND NOT EXISTS (SELECT 1 FROM d1n WHERE d1n.group_id = d2.group_id AND d1n.name = d2.name))
SELECT group_id, name, cast(0 AS bigint) AS depth FROM o
UNION ALL SELECT group_id, name, cast(1 AS bigint) FROM d1n
UNION ALL SELECT group_id, name, cast(2 AS bigint) FROM d2n"""

# G8/R4: node-distance rerank in group conv-0 — center 0.1, 1-hop 1.0,
# else far sentinel (search_utils.py:891-934).
KG_NODE_DISTANCE = f"""WITH {kg_triples_ctes()},
  men AS ({_MEN}),
  cand AS (SELECT DISTINCT entity_name AS name FROM men WHERE group_id = 'conv-0'),
  adjc AS (
    SELECT DISTINCT subj_name AS a, obj_name AS b FROM tri WHERE group_id = 'conv-0'
    UNION
    SELECT DISTINCT obj_name AS a, subj_name AS b FROM tri WHERE group_id = 'conv-0'),
  ctr AS (SELECT min(a) AS c FROM adjc),
  nbr AS (SELECT DISTINCT adjc.b AS name FROM adjc, ctr WHERE adjc.a = ctr.c)
SELECT cand.name,
       cast(CASE WHEN cand.name = (SELECT c FROM ctr) THEN 0.1
                 WHEN EXISTS (SELECT 1 FROM nbr WHERE nbr.name = cand.name) THEN 1.0
                 ELSE 1000000.0 END AS double) AS score
FROM cand"""

# A2/R5: episode-mentions rerank — candidates scored by MENTIONS count
# (search_utils.py:937-963).
KG_MENTIONS_RERANK = f"""WITH {CTE_TRANSCRIPTS},
{CTE_EPS},
  men AS ({_MEN})
SELECT md5(concat_ws('|', 'en', group_id, lower(entity_name))) AS uuid,
       cast(count(*) AS double) AS score
FROM men GROUP BY 1"""

KG_RETRIEVE_EPISODES = f"""WITH {CTE_TRANSCRIPTS},
{CTE_EPS},
r AS (
  SELECT uuid, group_id, valid_at,
         row_number() OVER (PARTITION BY group_id ORDER BY valid_at DESC, uuid DESC) AS rn
  FROM eps WHERE valid_at <= TIMESTAMP '2024-01-15 00:00:00')
SELECT uuid, group_id, valid_at FROM r WHERE rn <= 5"""

# E1/E3 over the mixed message/text/json corpus — per-source prompt
# family dispatch (prompts/extract_nodes.py:82,131,163) mirrored as
# filtered UNION branches over the shared mixed-episode derivation.
_CTE_EM = f"em AS ({MIXED_EPISODES_SELECT})"

KG_MENTIONS_MIXED = f"""WITH {CTE_TRANSCRIPTS},
{_CTE_EM},
msgtxt AS (SELECT uuid, group_id, role, text FROM em WHERE source <> 'json'),
jsn AS (SELECT uuid, group_id, role, text FROM em WHERE source = 'json'),
m1 AS ({rules.mentions_select_sql(table='msgtxt')}),
m2 AS ({rules.mentions_select_sql(table='jsn', rule_set=rules.JSON_RULES)})
SELECT * FROM m1 UNION ALL SELECT * FROM m2"""

KG_TRIPLES_MIXED = f"""WITH {CTE_TRANSCRIPTS},
{_CTE_EM},
msgtxt AS (SELECT uuid, group_id, text, valid_at FROM em WHERE source <> 'json'),
jsn AS (SELECT uuid, group_id, text, valid_at FROM em WHERE source = 'json')
{rules.triples_select_sql(table='msgtxt')}
UNION ALL{rules.triples_select_sql(table='jsn', rule_set=rules.JSON_TRIPLE_RULES)}"""

# A3: edge reranker by provenance count — len(edge.episodes) desc
# (search/search.py:272-280).
KG_EDGES_RERANK = f"""WITH e AS ({KG_EDGES})
SELECT uuid, group_id, cast(n_episodes AS double) AS score
FROM e ORDER BY score DESC, uuid LIMIT 50"""

# G7 full parity: BFS from EPISODIC origins walking MENTIONS
# (episode→entity, directed) then RELATES_TO (undirected)
# (search_utils.py:269,413). Origin = min episode uuid per group.
KG_BFS_EPISODIC = f"""WITH {kg_triples_ctes()},
  men AS ({_MEN}),
  origins AS (SELECT group_id, min(uuid) AS uuid FROM eps GROUP BY group_id),
  d1 AS (
    SELECT DISTINCT m.group_id, concat_ws('|', m.group_id, m.entity_name) AS uuid
    FROM men m JOIN origins o ON m.episode_uuid = o.uuid),
  arcs AS (
    SELECT group_id, concat_ws('|', group_id, subj_name) AS a,
           concat_ws('|', group_id, obj_name) AS b FROM tri
    UNION
    SELECT group_id, concat_ws('|', group_id, obj_name) AS a,
           concat_ws('|', group_id, subj_name) AS b FROM tri),
  d2 AS (
    SELECT DISTINCT arcs.group_id, arcs.b AS uuid
    FROM arcs JOIN d1 ON arcs.a = d1.uuid
    WHERE NOT EXISTS (SELECT 1 FROM d1 x WHERE x.uuid = arcs.b))
SELECT uuid, cast(0 AS bigint) AS depth FROM origins
UNION ALL SELECT uuid, cast(1 AS bigint) FROM d1
UNION ALL SELECT uuid, cast(2 AS bigint) FROM d2"""

# F10: search_results_to_context_string (search/search_helpers.py:28-73)
# — per-group context string; items sorted lexicographically, fields per
# the reference contract (invalid_at NULL → 'Present', valid_at NULL →
# 'None'). Entities use the node_summaries digest (KG_NODE_SUMMARIES).
KG_CONTEXT = f"""WITH e AS ({kg_edges_sql(include_fact=True)}),
ns AS ({KG_NODE_SUMMARIES}),
{CTE_TRANSCRIPTS},
eps2 AS (
  SELECT conv_id AS group_id, concat(role, ': ', text) AS content,
         CASE WHEN tool <> '' THEN concat('tool:', tool)
              ELSE 'transcript' END AS source_description
  FROM transcripts),
facts AS (
  SELECT group_id, string_agg(item, ', ' ORDER BY item) AS facts FROM (
    SELECT group_id,
           concat('{{"fact": "', fact, '", "valid_at": "',
                  coalesce(strftime(valid_at, '%Y-%m-%d %H:%M:%S'), 'None'),
                  '", "invalid_at": "',
                  coalesce(strftime(invalid_at, '%Y-%m-%d %H:%M:%S'), 'Present'),
                  '"}}') AS item
    FROM e) GROUP BY group_id),
ents AS (
  SELECT group_id, string_agg(item, ', ' ORDER BY item) AS entities FROM (
    SELECT group_id,
           concat('{{"entity_name": "', name, '", "summary": "',
                  coalesce(summary, ''), '"}}') AS item
    FROM ns) GROUP BY group_id),
epsx AS (
  SELECT group_id, string_agg(item, ', ' ORDER BY item) AS eps FROM (
    SELECT group_id,
           concat('{{"source_description": "', source_description,
                  '", "content": "', content, '"}}') AS item
    FROM eps2) GROUP BY group_id)
SELECT group_id,
       concat('<FACTS>[', coalesce(f.facts, ''),
              ']</FACTS><ENTITIES>[', coalesce(n.entities, ''),
              ']</ENTITIES><EPISODES>[', coalesce(p.eps, ''),
              ']</EPISODES><COMMUNITIES>[]</COMMUNITIES>') AS context
FROM facts f
FULL OUTER JOIN ents n USING (group_id)
FULL OUTER JOIN epsx p USING (group_id)"""


# --- relational / search oracles -------------------------------------------

TOPK_EVENTS_PER_USER = """
SELECT user_id, event_id, value, cast(rn AS bigint) AS rn FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events) WHERE rn <= 3"""

WINDOW_RUNNING_VALUE = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running
FROM events"""

AGG_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 4) AS avg_disc,
       cast(count(*) AS bigint) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus"""

JOIN_NATION_REVENUE = """
SELECT n.n_name AS nation,
       round(sum(o.o_totalprice), 2) AS revenue,
       cast(count(*) AS bigint) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name"""

RRF_USER_RANKINGS = """
WITH by_count AS (
  SELECT user_id, row_number() OVER (ORDER BY count(*) DESC, user_id) - 1 AS rank
  FROM events GROUP BY user_id),
by_value AS (
  SELECT user_id, row_number() OVER (ORDER BY sum(value) DESC, user_id) - 1 AS rank
  FROM events GROUP BY user_id),
u AS (SELECT * FROM by_count UNION ALL SELECT * FROM by_value)
SELECT user_id, round(sum(1.0 / (rank + 1)), 6) AS score
FROM u GROUP BY user_id"""

SEARCH_FILTER_EVENTS = """
SELECT event_id, user_id, event_type, value, ts
FROM events
WHERE (ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00')
  AND (event_type = 'purchase' OR event_type = 'click')
  AND (value > 50.0 OR value < 5.0)"""

BM25_DOCUMENTS = """
WITH toks AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')) AS tokset,
         len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')) AS dl
  FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM toks),
posting AS (
  SELECT doc_id, dl, unnest(tokset) AS tok FROM toks),
qp AS (SELECT * FROM posting WHERE tok IN ('data', 'join', 'query', 'spark')),
dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM qp GROUP BY tok),
scored AS (
  SELECT qp.doc_id,
         sum(ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
             * (1.0 * (1.2 + 1)) / (1.0 + 1.2 * (1 - 0.75 + 0.75 * qp.dl / stats.avgdl))) AS score
  FROM qp JOIN dfreq USING (tok) CROSS JOIN stats
  GROUP BY qp.doc_id)
SELECT doc_id, round(score, 4) AS score FROM scored
ORDER BY score DESC, doc_id LIMIT 10"""

DEDUP_EXACT_DOCUMENTS = """
SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, cast(count(*) AS bigint) AS dup_count
FROM documents GROUP BY md5(text)"""

FINGERPRINT_DOCUMENTS = """
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint
FROM documents"""

TOKEN_COUNTS_DOCUMENTS = """
SELECT doc_id,
       cast(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS bigint) AS ws_tokens,
       cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bigint) AS subword_tokens
FROM documents"""

REPETITION_DOCUMENTS = """
WITH lines AS (
  SELECT doc_id, line, count(*) AS c, length(line) AS l
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents)
  WHERE trim(line) <> ''
  GROUP BY doc_id, line),
lagg AS (
  SELECT doc_id,
         cast(sum(c) AS bigint) AS n_lines,
         round(1.0 - count(*) * 1.0 / sum(c), 4) AS dup_line_frac,
         round(sum(CASE WHEN c > 1 THEN c * l ELSE 0 END) * 1.0
               / greatest(sum(c * l), 1), 4) AS dup_line_char_frac
  FROM lines GROUP BY doc_id),
toks AS (
  SELECT doc_id, length(text) AS n_chars,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '') AS tk
  FROM documents),
bg AS (
  SELECT doc_id, n_chars,
         unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])) AS bigram
  FROM toks),
bgc AS (
  SELECT doc_id, n_chars, bigram, count(*) AS c
  FROM bg GROUP BY doc_id, n_chars, bigram),
top AS (
  SELECT doc_id, bigram, c, n_chars,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bigram ASC) AS rn
  FROM bgc)
SELECT d.doc_id,
       coalesce(lagg.n_lines, 0) AS n_lines,
       coalesce(lagg.dup_line_frac, 0.0) AS dup_line_frac,
       coalesce(lagg.dup_line_char_frac, 0.0) AS dup_line_char_frac,
       coalesce(top.bigram, '') AS top_bigram,
       coalesce(round(top.c * length(replace(top.bigram, ' ', '')) * 1.0
                      / greatest(top.n_chars, 1), 4), 0.0) AS top_bigram_char_frac
FROM documents d
LEFT JOIN lagg ON d.doc_id = lagg.doc_id
LEFT JOIN top ON d.doc_id = top.doc_id AND top.rn = 1"""

# shared WITH-chain of the unigram-LM score (one definition, composed
# into both the plain score query and the quantile-bins query below so
# the two cannot drift apart)
_UNIGRAM_LM_CORE = """
WITH dt AS (
  SELECT doc_id, token, count(*) AS c
  FROM (SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                  t -> t <> '')) AS token
        FROM documents)
  GROUP BY doc_id, token),
vocab AS (SELECT token, sum(c) AS c_t FROM dt GROUP BY token),
tot AS (SELECT sum(c_t) AS n_total, count(*) AS v_size FROM vocab),
scored AS (
  SELECT dt.doc_id,
         cast(sum(dt.c) AS bigint) AS n_tokens,
         round(sum(dt.c * -log2((vocab.c_t + 1.0) / (tot.n_total + tot.v_size)))
               / sum(dt.c), 4) AS bits_per_token
  FROM dt JOIN vocab USING (token) CROSS JOIN tot
  GROUP BY dt.doc_id)"""

UNIGRAM_LM_DOCUMENTS = f"""{_UNIGRAM_LM_CORE}
SELECT d.doc_id,
       coalesce(scored.n_tokens, 0) AS n_tokens,
       coalesce(scored.bits_per_token, 0.0) AS bits_per_token
FROM documents d LEFT JOIN scored ON d.doc_id = scored.doc_id"""

# Mirrors operators/dataset_text.quantile_bins over the unigram-LM
# score, stratified per lang (the CCNet perplexity-bucket shape):
# NTILE(4) over (lang, bits_per_token, doc_id) — both engines bin the
# ALREADY-ROUNDED score with the doc_id tie-break, so bins agree
# bit-for-bit.
QUALITY_BINS_DOCUMENTS = f"""{_UNIGRAM_LM_CORE}
SELECT d.doc_id,
       coalesce(scored.n_tokens, 0) AS n_tokens,
       coalesce(scored.bits_per_token, 0.0) AS bits_per_token,
       d.lang,
       cast(ntile(4) OVER (PARTITION BY d.lang
                           ORDER BY coalesce(scored.bits_per_token, 0.0), d.doc_id)
            AS integer) AS bin
FROM documents d LEFT JOIN scored ON d.doc_id = scored.doc_id"""


def source_cap_sql(cap: int = 10, salt: str = "srccap") -> str:
    """dataset_mix.source_cap: per-source hard cap, md5-ranked; rank
    materialized only where the cap binds (NULL for under-cap
    sources, mirroring the Spark plan's sort-free under-cap path)."""
    return f"""
WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
keyed AS (
  SELECT d.doc_id, d.source, c.n,
         md5(concat_ws(':', '{salt}', cast(d.doc_id AS string))) AS rk
  FROM documents d JOIN counts c USING (source)),
ranked AS (
  SELECT doc_id, source, n,
         row_number() OVER (PARTITION BY source ORDER BY rk, doc_id) AS rn
  FROM keyed)
SELECT doc_id, source,
       CASE WHEN n > {cap} THEN cast(rn AS int) END AS src_rank
FROM ranked
WHERE n <= {cap} OR rn <= {cap}"""


def importance_sample_sql() -> str:
    """Mirror of operators/dataset_mix.importance_sample over the
    C4-style quality score (scale=1, salt 'isample'): per-row keep
    rate = clamp(quality, 0, 1), threshold from the identical
    floor(rate * 16^8) → 8-hex-lpad construction."""
    return f"""
WITH q AS (SELECT doc_id, quality FROM ({QUALITY_DOCUMENTS})),
r AS (
  SELECT doc_id,
         least(1.0, greatest(0.0, quality)) AS rate,
         lpad(lower(to_hex(cast(floor(least(1.0, greatest(0.0, quality))
                                      * 4294967296.0) AS bigint))), 8, '0') AS thresh
  FROM q)
SELECT doc_id, round(rate, 4) AS rate
FROM r
WHERE rate >= 1.0
   OR substr(md5(concat_ws(':', 'isample', cast(doc_id AS varchar))), 1, 8) < thresh"""


# Mirrors operators/dataset_mix.shard_assign (n_shards=16, salt
# 'shuffle'): shard = first-8-hex-digits of md5 mod 16 (the hex→int
# conversion is spelled out digit-by-digit because DuckDB has no conv();
# exact for 8 hex digits since 16^7 is well inside double precision),
# pos = row_number per shard ordered by the same md5 key.
SHARD_DOCUMENTS = """
WITH keyed AS (
  SELECT doc_id, md5('shuffle:' || cast(doc_id AS varchar)) AS sort_key
  FROM documents),
b AS (
  SELECT doc_id, sort_key,
         cast(cast(list_sum(list_transform(range(1, 9),
              i -> (strpos('0123456789abcdef', substr(sort_key, i, 1)) - 1)
                   * cast(pow(16, 8 - i) AS bigint))) AS bigint) % 16 AS integer) AS shard
  FROM keyed)
SELECT doc_id, shard,
       cast(row_number() OVER (PARTITION BY shard ORDER BY sort_key, doc_id) AS bigint) AS pos
FROM b"""


def _pii_sql() -> str:
    from graphiti_spark.operators.dataset_text import PII_PATTERNS as P

    counts = ",\n       ".join(
        f"cast(len(regexp_extract_all(text, '{pat}')) AS bigint) AS n_{name}"
        for name, pat in P.items()
    )
    red = "text"
    for name in ("ssn", "phone", "ipv4", "email"):
        red = f"regexp_replace({red}, '{P[name]}', '<{name.upper()}>', 'g')"
    total = " + ".join(f"len(regexp_extract_all(text, '{pat}'))" for pat in P.values())
    return f"""
SELECT doc_id,
       {counts},
       ({total}) > 0 AS has_pii,
       md5({red}) AS redacted_md5
FROM documents"""


PII_DOCUMENTS = _pii_sql()

# pseudo-paragraphs: the synthetic docs are single-line word soup, so
# the driver query chunks each doc into 6-token lines first (mirrored
# in __spark_entry__.q_paragraph_dups_documents)
PARAGRAPH_DUPS_DOCUMENTS = """
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '') AS tk
  FROM documents),
paras AS (
  SELECT doc_id, lower(trim(para)) AS para
  FROM (SELECT doc_id,
               unnest(list_transform(range(0, cast(ceil(len(tk) / 6.0) AS int)),
                                     i -> array_to_string(tk[i*6+1 : i*6+6], ' '))) AS para
        FROM tk)
  WHERE length(lower(trim(para))) >= 20)
SELECT md5(para) AS para_hash,
       cast(count(*) AS bigint) AS dup_count,
       cast(count(DISTINCT doc_id) AS bigint) AS n_docs,
       min(doc_id) AS exemplar_doc
FROM paras GROUP BY para
HAVING count(*) >= 2"""

# 8-gram decontamination: benchmark = every 50th doc, mirrored in
# __spark_entry__.q_contamination_documents
CONTAMINATION_DOCUMENTS = """
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '') AS tk
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk) - 6),
                               i -> array_to_string(tk[i:i+7], ' '))) AS gram
  FROM tk),
bench AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
hits AS (
  SELECT g.doc_id, count(*) AS n_matched_ngrams
  FROM grams g JOIN bench b USING (gram)
  GROUP BY g.doc_id)
SELECT d.doc_id,
       cast(coalesce(h.n_matched_ngrams, 0) AS bigint) AS n_matched_ngrams,
       coalesce(h.n_matched_ngrams, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id"""

def contamination_bloom_sql(n: int = 8, bits: int = 1 << 22, k: int = 4) -> str:
    """dataset_dedup.contamination_bloom: a gram 'hits' iff ALL k of
    its md5-chunk bit positions appear among the benchmark grams'
    positions — the exact relational statement of Bloom membership
    (the Spark side sets those positions in a physical bitmask; the
    bit-set they induce is identical, so false positives reproduce
    bit-for-bit). Same every-50th-doc benchmark as CONTAMINATION."""

    def hex8(expr: str) -> str:
        return (
            "cast(list_sum(list_transform(range(1, 9), i -> "
            f"(strpos('0123456789abcdef', substr({expr}, i, 1)) - 1)"
            " * cast(pow(16, 8 - i) AS bigint))) AS bigint)"
        )

    chunks = ", ".join(
        f"{hex8(f'substr(h, {1 + 8 * j}, 8)')} % {bits}" for j in range(k)
    )
    return f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '') AS tk
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk) - {n - 2}),
                               i -> array_to_string(tk[i:i+{n - 1}], ' '))) AS gram
  FROM tk),
dg AS (SELECT DISTINCT gram, md5(gram) AS h FROM grams),
dgpos AS (SELECT gram, unnest([{chunks}]) AS pos FROM dg),
bench_pos AS (
  SELECT DISTINCT pos FROM dgpos
  SEMI JOIN (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0) b USING (gram)),
ghit AS (
  SELECT gram FROM dgpos GROUP BY gram
  HAVING bool_and(pos IN (SELECT pos FROM bench_pos))),
hits AS (
  SELECT g.doc_id, count(*) AS n_bloom_hits
  FROM grams g SEMI JOIN ghit USING (gram) GROUP BY 1)
SELECT d.doc_id,
       cast(coalesce(h.n_bloom_hits, 0) AS bigint) AS n_bloom_hits,
       coalesce(h.n_bloom_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id"""


def split_sql(
    fractions: dict[str, float] | None = None, salt: str = "split"
) -> str:
    """dataset_mix.split_assign: consecutive md5-hash-space intervals in
    sorted-name order; thresholds via the SAME rate_threshold_hex the
    Spark side uses, so the split boundaries agree to the hex digit."""
    from graphiti_spark.operators.dataset_mix import rate_threshold_hex

    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    names = sorted(fractions)
    acc, whens = 0.0, []
    for name in names[:-1]:
        acc += fractions[name]
        whens.append(f"WHEN bucket < '{rate_threshold_hex(acc)}' THEN '{name}'")
    return f"""
WITH b AS (
  SELECT doc_id,
         substr(md5(concat_ws(':', '{salt}', cast(doc_id AS string))), 1, 8) AS bucket
  FROM documents)
SELECT doc_id, CASE {' '.join(whens)} ELSE '{names[-1]}' END AS split FROM b"""


def token_budget_sql(budget: float = 4000.0, salt: str = "budget") -> str:
    """dataset_mix.token_budget_cap over n_chars: per-source running
    sum in salted-md5 order; keep while the PRECEDING cumulative sum is
    under budget (the crossing document is admitted)."""
    return f"""
WITH k AS (
  SELECT doc_id, source, n_chars,
         md5(concat_ws(':', '{salt}', cast(doc_id AS string))) AS rk
  FROM documents),
c AS (
  SELECT doc_id, source,
         cast(coalesce(sum(n_chars) OVER (
           PARTITION BY source ORDER BY rk, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS double) AS cum_before
  FROM k)
SELECT doc_id, source, cum_before FROM c WHERE cum_before < {budget}"""


# Canonical benchmark training-mix rates, shared with
# __spark_entry__.q_sample_documents — sources absent from the dict
# fall back to MIX_DEFAULT_RATE.
MIX_RATES = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25, "src4": 0.1}
MIX_DEFAULT_RATE = 0.05


TFIDF_TOP_TERMS_DOCUMENTS = """
WITH dt AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                  t -> t <> '')) AS term
        FROM documents)
  GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df_t FROM dt GROUP BY term),
nd AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT dt.doc_id, dt.term, dt.tf,
         round(dt.tf * (ln((nd.n_docs + 1.0) / (dfreq.df_t + 1.0)) + 1), 4) AS tfidf
  FROM dt JOIN dfreq USING (term) CROSS JOIN nd),
ranked AS (
  SELECT doc_id, term, tf, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored)
SELECT doc_id, rank, term, cast(tf AS bigint) AS tf, tfidf
FROM ranked WHERE rank <= 3"""


# Mirrors operators/dataset_mix.temperature_mix over the skewed `lang`
# strata (alpha=0.5, budget_frac=0.5, salt 'tmix'): rates derived from
# the corpus in SQL exactly as the Spark plan derives them, thresholds
# from the identical floor(rate * 16^8) → 8-hex-lpad construction.
TEMPERATURE_MIX_DOCUMENTS = """
WITH counts AS (
  SELECT lang, cast(count(*) AS double) AS n_s FROM documents GROUP BY lang),
tot AS (
  SELECT sum(n_s) AS n_total, sum(pow(n_s, 0.5)) AS z FROM counts),
rates AS (
  SELECT lang,
         least(1.0, 0.5 * tot.n_total * pow(counts.n_s, 0.5) / tot.z / counts.n_s) AS rate
  FROM counts CROSS JOIN tot),
r2 AS (
  SELECT lang, rate,
         lpad(lower(to_hex(cast(floor(rate * 4294967296.0) AS bigint))), 8, '0') AS thresh
  FROM rates)
SELECT d.doc_id, d.lang, round(r2.rate, 4) AS rate
FROM documents d JOIN r2 USING (lang)
WHERE r2.rate >= 1.0
   OR substr(md5(concat_ws(':', 'tmix', d.lang, cast(d.doc_id AS varchar))), 1, 8) < r2.thresh"""


def _sample_sql() -> str:
    from graphiti_spark.operators.dataset_mix import rate_threshold_hex

    bucket = "substr(md5(concat_ws(':', 'mix', source, cast(doc_id AS varchar))), 1, 8)"

    def keep(rate: float) -> str:
        if rate >= 1.0:
            return "TRUE"
        if rate <= 0.0:
            return "FALSE"
        return f"{bucket} < '{rate_threshold_hex(rate)}'"

    whens = "\n  ".join(
        f"WHEN source = '{s}' THEN {keep(r)}" for s, r in sorted(MIX_RATES.items())
    )
    return f"""
SELECT doc_id, source, lang
FROM documents
WHERE CASE
  {whens}
  ELSE {keep(MIX_DEFAULT_RATE)}
END"""


SAMPLE_DOCUMENTS = _sample_sql()

# seq_len = 128, shard = source, order = doc_id — mirrored in
# __spark_entry__.q_pack_sequences_documents
PACK_SEQUENCES_DOCUMENTS = """
WITH toks AS (
  SELECT source AS shard, doc_id,
         cast(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                              t -> t <> '')) AS bigint) AS n_tokens
  FROM documents),
placed AS (
  SELECT shard, doc_id, n_tokens,
         cast(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint) AS start_off
  FROM toks)
SELECT shard, doc_id, n_tokens, start_off,
       cast(floor(start_off / 128.0) AS bigint) AS first_seq,
       cast(CASE WHEN n_tokens > 0
                 THEN floor((start_off + n_tokens - 1) / 128.0)
                 ELSE floor(start_off / 128.0) END AS bigint) AS last_seq,
       cast(CASE WHEN n_tokens > 0
                 THEN floor((start_off + n_tokens - 1) / 128.0) - floor(start_off / 128.0) + 1
                 ELSE 0 END AS bigint) AS n_seqs
FROM placed"""

# loader-facing manifest view of the packing above (seq_len = 128)
PACK_MANIFEST_DOCUMENTS = """
WITH toks AS (
  SELECT source AS shard, doc_id,
         cast(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                              t -> t <> '')) AS bigint) AS n_tokens
  FROM documents),
placed AS (
  SELECT shard, doc_id, n_tokens,
         cast(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint) AS start_off
  FROM toks),
spans AS (
  SELECT shard, doc_id, n_tokens, start_off,
         unnest(range(cast(floor(start_off / 128.0) AS bigint),
                      cast(floor((start_off + n_tokens - 1) / 128.0) AS bigint) + 1)) AS seq_id
  FROM placed WHERE n_tokens > 0)
SELECT shard, seq_id, doc_id,
       cast(greatest(seq_id * 128, start_off) - start_off AS bigint) AS tok_start,
       cast(least((seq_id + 1) * 128, start_off + n_tokens) - start_off AS bigint) AS tok_end
FROM spans"""

_STOP_EN = "['the','and','of','to','a','in','is','it','you','that']"
_STOP = {
    "en": _STOP_EN,
    "de": "['der','die','das','und','ist','ich','nicht','ein','mit','zu']",
    "fr": "['le','la','les','et','est','je','ne','un','une','que']",
    "es": "['el','la','los','y','es','yo','no','un','una','que']",
}

_TOKS = "list_distinct(list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> ''))"

_HITS = ",\n       ".join(
    f"len(list_intersect({_TOKS}, {arr})) AS hits_{lang}" for lang, arr in _STOP.items()
)

_LANG_WINNER = (
    "CASE WHEN hits_en > 0 AND hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es THEN 'en' "
    "WHEN hits_de > 0 AND hits_de >= hits_en AND hits_de >= hits_fr AND hits_de >= hits_es THEN 'de' "
    "WHEN hits_fr > 0 AND hits_fr >= hits_en AND hits_fr >= hits_de AND hits_fr >= hits_es THEN 'fr' "
    "WHEN hits_es > 0 AND hits_es >= hits_en AND hits_es >= hits_de AND hits_es >= hits_fr THEN 'es' "
    "ELSE 'unknown' END"
)

LANG_ID_DOCUMENTS = f"""
WITH h AS (
  SELECT doc_id,
       {_HITS}
  FROM documents)
SELECT doc_id, {_LANG_WINNER} AS lang_pred FROM h"""

QUALITY_DOCUMENTS = f"""
WITH q AS (
  SELECT doc_id,
         length(text) AS n_chars,
         {_TOKS} AS toks,
         len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')) AS n_all_toks,
         length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS n_alpha,
         regexp_matches(text, '[.!?]') AS has_term
  FROM documents)
SELECT doc_id,
       cast(len(toks) AS bigint) AS n_tokens,
       round(n_alpha * 1.0 / greatest(n_chars, 1), 4) AS alpha_ratio,
       round(len(list_intersect(toks, {_STOP_EN})) * 1.0 / greatest(len(toks), 1), 4) AS stopword_ratio,
       (CASE WHEN n_chars BETWEEN 20 AND 20000 THEN 0.25 ELSE 0.0 END
        + CASE WHEN n_alpha * 1.0 / greatest(n_chars, 1) >= 0.6 THEN 0.25 ELSE 0.0 END
        + CASE WHEN len(list_intersect(toks, {_STOP_EN})) * 1.0 / greatest(len(toks), 1) >= 0.05 THEN 0.25 ELSE 0.0 END
        + CASE WHEN has_term THEN 0.25 ELSE 0.0 END) AS quality
FROM q"""


def _mh_cols(n: int) -> str:
    return ",\n         ".join(
        f"min(md5(concat('{j}|', tok))) AS mh{j}" for j in range(n)
    )


def minhash_pairs_sql(n_hashes: int = 8, band_width: int = 4, threshold: float = 0.5) -> str:
    match_sum = " + ".join(
        f"CASE WHEN a.mh{j} = b.mh{j} THEN 1 ELSE 0 END" for j in range(n_hashes)
    )
    # banded LSH candidate rule: all band_width components of some band equal
    any_eq = " OR ".join(
        "("
        + " AND ".join(
            f"a.mh{i * band_width + r} = b.mh{i * band_width + r}" for r in range(band_width)
        )
        + ")"
        for i in range(n_hashes // band_width)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
sig AS (
  SELECT doc_id,
         {_mh_cols(n_hashes)}
  FROM toks GROUP BY doc_id)
SELECT a.doc_id AS src, b.doc_id AS dst,
       round(({match_sum}) / {float(n_hashes)}, 4) AS est_jaccard
FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({any_eq})
WHERE ({match_sum}) / {float(n_hashes)} >= {threshold}"""


def _simhash_total(n_bits: int) -> str:
    hexd = "0123456789abcdef"
    bits = []
    for b in range(n_bits):
        vote = (
            f"list_sum(list_transform(toks, t -> "
            f"CASE WHEN (strpos('{hexd}', substr(md5(t), {b + 1}, 1)) - 1) % 2 = 1 "
            f"THEN 1 ELSE -1 END))"
        )
        bits.append(f"CASE WHEN coalesce({vote}, 0) > 0 THEN {1 << b} ELSE 0 END")
    return " + ".join(bits)


def simhash_sql(n_bits: int = 16) -> str:
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
SELECT doc_id, cast({_simhash_total(n_bits)} AS bigint) AS simhash FROM t"""


def simhash_pairs_sql(n_bits: int = 16, max_hamming: int = 3) -> str:
    """All-pairs hamming oracle. Exactness of the Spark side's band
    blocking is the pigeonhole guarantee (n_bands = max_hamming + 1),
    so the O(n²) oracle join and the blocked equi-join must agree."""
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, cast({_simhash_total(n_bits)} AS bigint) AS simhash FROM t)
SELECT a.doc_id AS src, b.doc_id AS dst,
       cast(bit_count(xor(a.simhash, b.simhash)) AS bigint) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"""


def span_dups_sql(k: int = 8, min_span: int | None = None, max_df: int | None = 100) -> str:
    """Mirror of operators/dataset_dedup.span_dups: md5 k-gram anchors
    (whitespace tokens, lowercased), df-capped anchor self-join, then
    gaps-and-islands run detection per (src, dst, diagonal) — a run of
    r consecutive shared anchors is a shared span of k + r - 1 tokens."""
    if min_span is None:
        min_span = k
    cap = (
        f"\nkeep AS (SELECT gh FROM grams GROUP BY gh"
        f" HAVING count(DISTINCT doc_id) <= {max_df}),"
        f"\ng2 AS (SELECT g.* FROM grams g SEMI JOIN keep USING (gh)),"
        if max_df is not None
        else "\ng2 AS (SELECT * FROM grams),"
    )
    return f"""
WITH {_kgram_grams_cte(k)},{cap}
m AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, a.i AS ia, a.i - b.i AS diag
  FROM g2 a JOIN g2 b ON a.gh = b.gh AND a.doc_id < b.doc_id),
r1 AS (
  SELECT src, dst, diag,
         ia - row_number() OVER (PARTITION BY src, dst, diag ORDER BY ia) AS grp
  FROM m),
r2 AS (SELECT src, dst, diag, grp, count(*) AS run FROM r1 GROUP BY src, dst, diag, grp)
SELECT src, dst, cast(sum(run) AS bigint) AS n_anchors,
       cast(max(run) + {k - 1} AS bigint) AS longest_span
FROM r2 GROUP BY src, dst
HAVING max(run) + {k - 1} >= {min_span}"""


_STAR_EDGE_SELECT = """SELECT DISTINCT m.root AS src, b.doc_id AS dst
  FROM bands b JOIN mins m USING (band, h)
  WHERE b.doc_id <> m.root"""


def _star_edges_ctes(n_hashes: int, band_width: int) -> str:
    """toks/sig/bands/mins CTE chain for star-contracted LSH edges —
    ONE definition shared by minhash_star_sql and curation_pipeline_sql
    so the composed pipeline oracle can never drift from the per-stage
    oracle it is built from."""
    n_bands = n_hashes // band_width
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {i} AS band, md5(concat_ws('|', "
        + ", ".join(f"mh{i * band_width + r}" for r in range(band_width))
        + ")) AS h FROM sig"
        for i in range(n_bands)
    )
    return f"""toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
sig AS (
  SELECT doc_id,
         {_mh_cols(n_hashes)}
  FROM toks GROUP BY doc_id),
bands AS (
{band_selects}),
mins AS (SELECT band, h, min(doc_id) AS root FROM bands GROUP BY band, h)"""


def minhash_star_sql(n_hashes: int = 8, band_width: int = 4) -> str:
    """Mirror of operators/dataset_dedup.minhash_star_edges: per
    (band, h) bucket emit (bucket-min, member) star edges."""
    return f"""
WITH {_star_edges_ctes(n_hashes, band_width)}
  {_STAR_EDGE_SELECT}"""


def curation_pipeline_sql(n_hashes: int = 8, band_width: int = 8) -> str:
    """End-to-end curation pipeline oracle, composed from the per-stage
    oracles exactly as __spark_entry__.q_curation_pipeline composes the
    operators: star-contracted MinHash-LSH dedup edges (band collision
    is the match criterion; the star spans each bucket, so components
    equal the all-pairs graph's) → connected-components keep-list
    (DuckDB side: recursive-CTE transitive closure — component minimum
    mirrors the Spark CC's min-label semantics) → quality >= 0.5 →
    decontamination vs the every-50th-doc stand-in benchmark →
    temperature mix over the SURVIVOR lang strata (salt 'curate') →
    md5-keyed shard layout (8 shards, salt 'curate-shard')."""
    hex_int = (
        "cast(list_sum(list_transform(range(1, 9),"
        " i -> (strpos('0123456789abcdef', substr(sort_key, i, 1)) - 1)"
        " * cast(pow(16, 8 - i) AS bigint))) AS bigint)"
    )
    return f"""
WITH RECURSIVE {_star_edges_ctes(n_hashes, band_width)},
pairs AS (
  {_STAR_EDGE_SELECT}),
edges AS (SELECT src AS a, dst AS b FROM pairs UNION SELECT dst, src FROM pairs),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
canon AS (SELECT a AS doc_id, least(a, min(b)) AS canonical FROM reach GROUP BY a),
keepdup AS (
  SELECT d.doc_id FROM documents d LEFT JOIN canon c ON d.doc_id = c.doc_id
  WHERE c.doc_id IS NULL OR c.canonical = d.doc_id),
qual AS (SELECT doc_id FROM ({QUALITY_DOCUMENTS}) WHERE quality >= 0.5),
clean AS (SELECT doc_id FROM ({CONTAMINATION_DOCUMENTS}) WHERE NOT contaminated),
survivors AS (
  SELECT d.doc_id, d.lang FROM documents d
  SEMI JOIN keepdup USING (doc_id)
  SEMI JOIN qual USING (doc_id)
  SEMI JOIN clean USING (doc_id)),
counts AS (SELECT lang, cast(count(*) AS double) AS n_s FROM survivors GROUP BY lang),
tot AS (SELECT sum(n_s) AS n_total, sum(pow(n_s, 0.5)) AS z FROM counts),
rates AS (
  SELECT lang,
         least(1.0, 0.5 * tot.n_total * pow(counts.n_s, 0.5) / tot.z / counts.n_s) AS rate
  FROM counts CROSS JOIN tot),
r2 AS (
  SELECT lang, rate,
         lpad(lower(to_hex(cast(floor(rate * 4294967296.0) AS bigint))), 8, '0') AS thresh
  FROM rates),
mixed AS (
  SELECT s.doc_id, s.lang, round(r2.rate, 4) AS rate
  FROM survivors s JOIN r2 USING (lang)
  WHERE r2.rate >= 1.0
     OR substr(md5(concat_ws(':', 'curate', s.lang, cast(s.doc_id AS varchar))), 1, 8) < r2.thresh),
keyed AS (
  SELECT doc_id, md5('curate-shard:' || cast(doc_id AS varchar)) AS sort_key FROM mixed),
shards AS (
  SELECT doc_id, sort_key, cast({hex_int} % 8 AS integer) AS shard FROM keyed),
placed AS (
  SELECT doc_id, shard,
         cast(row_number() OVER (PARTITION BY shard ORDER BY sort_key, doc_id) AS bigint) AS pos
  FROM shards)
SELECT m.doc_id, m.lang, m.rate, p.shard, p.pos
FROM mixed m JOIN placed p USING (doc_id)"""


def _kgram_grams_cte(k: int) -> str:
    """tk + grams CTE bodies: (doc_id, i, gh) k-gram anchors — the
    DuckDB half of the anchor contract (operators/dataset_dedup
    ._kgram_anchors), shared by span_dups_sql and span_removal_sql."""
    return f"""tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '') AS tk
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest(range(1, len(tk) - {k - 2})) AS i,
         unnest(list_transform(range(1, len(tk) - {k - 2}),
                               i -> md5(array_to_string(tk[i:i+{k - 1}], ' ')))) AS gh
  FROM tk WHERE len(tk) >= {k})"""


def span_removal_sql(k: int = 8, max_df: int | None = None) -> str:
    """Mirror of operators/dataset_dedup.span_removal_plan: anchors
    whose k-gram appears in >= 2 distinct docs, merged into maximal
    per-doc ranges with the same lag()-based islands rule (equal-length
    intervals make starts-sorted ends monotone)."""
    cap = f" AND df <= {max_df}" if max_df is not None else ""
    return f"""
WITH {_kgram_grams_cte(k)},
dfreq AS (SELECT gh, count(DISTINCT doc_id) AS df FROM grams GROUP BY gh),
shared AS (SELECT gh FROM dfreq WHERE df >= 2{cap}),
anchors AS (SELECT g.doc_id, g.i FROM grams g SEMI JOIN shared USING (gh)),
isl AS (
  SELECT doc_id, i,
         CASE WHEN i > coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i),
                                -1000000000) + {k}
              THEN 1 ELSE 0 END AS newi
  FROM anchors),
isl2 AS (
  SELECT doc_id, i,
         sum(newi) OVER (PARTITION BY doc_id ORDER BY i) AS island
  FROM isl)
SELECT doc_id, cast(min(i) AS bigint) AS tok_start,
       cast(max(i) + {k} AS bigint) AS tok_end
FROM isl2 GROUP BY doc_id, island"""


def jaccard_pairs_sql(threshold: float = 0.5) -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tokset FROM documents),
sizes AS (SELECT doc_id, len(tokset) AS n FROM toks),
posting AS (SELECT doc_id, unnest(tokset) AS tok FROM toks),
inter AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS n_inter
  FROM posting a JOIN posting b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT i.src, i.dst,
       round(i.n_inter * 1.0 / (sa.n + sb.n - i.n_inter), 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.src
JOIN sizes sb ON sb.doc_id = i.dst
WHERE i.n_inter * 1.0 / (sa.n + sb.n - i.n_inter) >= {threshold}"""


_NORM_DOT = """list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
            / greatest(sqrt(list_sum(list_transform(a.v, x -> x * x)))
                       * sqrt(list_sum(list_transform(b.v, x -> x * x))), 1e-12)"""

ANN_TOPK = f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v FROM v WHERE vec_id < 4),
scored AS (
  SELECT b.qid, a.vec_id,
         {_NORM_DOT} AS score
  FROM v a CROSS JOIN q b),
r AS (
  SELECT qid, vec_id, round(score, 4) AS score,
         cast(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS bigint) AS rn
  FROM scored)
SELECT qid, vec_id, score, rn FROM r WHERE rn <= 5"""

CENTROID_OUTLIERS = """
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> cast(x AS double)) AS v
  FROM embeddings),
ex AS (
  SELECT label, unnest(range(1, len(v) + 1)) AS pos, unnest(v) AS val FROM v),
cpos AS (SELECT label, pos, avg(val) AS c FROM ex GROUP BY label, pos),
cent AS (SELECT label, list(c ORDER BY pos) AS cvec FROM cpos GROUP BY label)
SELECT v.vec_id, v.label,
       round(list_sum(list_transform(range(1, len(v.v) + 1), i -> v.v[i] * cent.cvec[i]))
             / greatest(sqrt(list_sum(list_transform(v.v, x -> x * x)))
                        * sqrt(list_sum(list_transform(cent.cvec, x -> x * x))), 1e-12),
             4) AS centroid_sim
FROM v JOIN cent USING (label)"""

ANN_BRUTEFORCE_SINGLE = f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v FROM embeddings),
q AS (SELECT v FROM v WHERE vec_id = 0),
scored AS (
  SELECT a.vec_id,
         list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * q.v[i]))
           / greatest(sqrt(list_sum(list_transform(a.v, x -> x * x)))
                      * sqrt(list_sum(list_transform(q.v, x -> x * x))), 1e-12) AS score
  FROM v a CROSS JOIN q)
SELECT vec_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, vec_id LIMIT 10"""

# R3: deterministic cross-encoder analog — lexical overlap score
# (cross_encoder/openai_reranker_client.py:61-118 is P(True) of a
# boolean relevance classifier; the pluggable stand-in is
# |query ∩ passage| / |query|).
CROSS_ENCODER_DOCUMENTS = f"""
SELECT doc_id,
       round(len(list_intersect({_TOKS}, ['data', 'join', 'query', 'spark'])) / 4.0, 4) AS score
FROM documents"""

def _sign_band_keys_sql(vec: str, n_bits: int, n_bands: int) -> str:
    """DuckDB list literal of the 'band:bucket' sign-LSH keys —
    function-for-function the Spark `functions.embeddings.
    sim_bands_multi`: band j's bucket is the integer whose bit i is set
    iff vector element (1-indexed) j*n_bits + i + 1 is >= 0. The Spark
    side tests the sign of the L2-NORMALIZED value, but normalization
    is a positive scaling so the raw-value test is identical (and the
    all-zero vector passes >= 0 either way)."""
    keys = []
    for j in range(n_bands):
        bits = " + ".join(
            f"(CASE WHEN {vec}[{j * n_bits + i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
            for i in range(n_bits)
        )
        keys.append(f"'{j}:' || cast({bits} AS varchar)")
    return "[" + ", ".join(keys) + "]"


def ann_lsh_topk_sql(k: int = 5, n_bits: int = 4, n_bands: int = 12) -> str:
    """Oracle for the OR-amplified sign-band approximate top-k
    (dataset_ann.lsh_bucket_topk): the banding is deterministic (sign
    bits of fixed dimensions), so DuckDB reproduces the exact candidate
    set — probe meets index vector iff ANY band key matches — then the
    same per-probe score/rn window. VERDICT r4 #5 upgraded this from
    rows-only to oracle-checked."""
    keys = _sign_band_keys_sql("v", n_bits, n_bands)
    return f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v FROM embeddings),
b AS (SELECT vec_id, unnest({keys}) AS bucket FROM v),
q AS (SELECT vec_id AS qid, bucket FROM b WHERE vec_id < 4),
cand AS (SELECT DISTINCT q.qid, a.vec_id FROM b a JOIN q ON a.bucket = q.bucket),
scored AS (
  SELECT c.qid, c.vec_id,
         list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * qq.v[i]))
           / greatest(sqrt(list_sum(list_transform(a.v, x -> x * x)))
                      * sqrt(list_sum(list_transform(qq.v, x -> x * x))), 1e-12) AS score
  FROM cand c
  JOIN v a ON a.vec_id = c.vec_id
  JOIN v qq ON qq.vec_id = c.qid),
r AS (
  SELECT qid, vec_id, round(score, 4) AS score,
         cast(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS bigint) AS rn
  FROM scored)
SELECT qid, vec_id, score, rn FROM r WHERE rn <= {k}"""


def embed_dup_pairs_lsh_sql(
    threshold: float = 0.35, n_bits: int = 4, n_bands: int = 8
) -> str:
    """Oracle for the sign-band LSH embedding near-dup pairs
    (dataset_dedup.embedding_dup_pairs exact=False — the production
    default): candidates are pairs colliding in ANY band (deterministic
    sign bits), scored with the true cosine. VERDICT r4 #5 upgraded
    this from rows-only to oracle-checked."""
    keys = _sign_band_keys_sql("v", n_bits, n_bands)
    return f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM v),
b AS (SELECT vec_id, unnest({keys}) AS bucket FROM v),
cand AS (
  SELECT DISTINCT a.vec_id AS src, b2.vec_id AS dst
  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id),
p AS (
  SELECT c.src, c.dst,
         list_sum(list_transform(range(1, len(na.v) + 1), i -> na.v[i] * nb.v[i]))
           / greatest(na.nrm * nb.nrm, 1e-12) AS cos
  FROM cand c
  JOIN n na ON na.vec_id = c.src
  JOIN n nb ON nb.vec_id = c.dst)
SELECT src, dst, round(cos, 4) AS cos FROM p WHERE cos >= {threshold}"""


# Embedding-cosine near-dup pairs (brute-force baseline; the LSH
# sign-band variant has its own oracle above).
EMBED_DUP_PAIRS = """
WITH v AS (SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM v),
p AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
           / greatest(a.nrm * b.nrm, 1e-12) AS cos
  FROM n a JOIN n b ON a.vec_id < b.vec_id)
SELECT src, dst, round(cos, 4) AS cos FROM p WHERE cos >= 0.35"""

MMR_EMBEDDINGS = f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
           FROM embeddings WHERE vec_id < 15),
q AS (SELECT v FROM v WHERE vec_id = 0),
qsim AS (
  SELECT a.vec_id,
         list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * q.v[i])) AS qs
  FROM v a CROSS JOIN q),
pmax AS (
  SELECT a.vec_id,
         max(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))) AS mo
  FROM v a JOIN v b ON a.vec_id <> b.vec_id
  GROUP BY a.vec_id)
SELECT q1.vec_id, round(0.5 * q1.qs + (0.5 - 1) * coalesce(p.mo, 0), 4) AS score
FROM qsim q1 LEFT JOIN pmax p ON p.vec_id = q1.vec_id"""

DEDUP_RESOLVE_DOCUMENTS = """
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
       doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep
FROM documents"""
