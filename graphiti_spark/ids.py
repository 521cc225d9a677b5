"""Deterministic content-derived identifiers.

The reference assigns UUID4 per row at construction (nodes.py:82,
edges.py:45) and relies on Cypher `MERGE (n {uuid})` for idempotence
(models/nodes/node_db_queries.py:21-26). For idempotent, re-runnable
partitioned batch merges we instead derive ids from content with md5
(available identically in Spark, DuckDB, and hashlib — so oracle SQL
can reproduce them):

    episode_uuid = md5('ep|' || group_id || '|' || conv_id || '|' || turn_idx)
    entity_uuid  = md5('en|' || group_id || '|' || lower(name))
    edge_uuid    = md5('ed|' || group_id || '|' || episode_uuid || '|' ||
                       subj || '|' || pred || '|' || obj)
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

SEP = "|"


def _md5_concat(*cols: Column) -> Column:
    return F.md5(F.concat_ws(SEP, *cols))


def episode_uuid(group_id: Column, conv_id: Column, turn_idx: Column) -> Column:
    return _md5_concat(F.lit("ep"), group_id, conv_id, turn_idx.cast("string"))


def entity_uuid(group_id: Column, name: Column) -> Column:
    return _md5_concat(F.lit("en"), group_id, F.lower(name))


def edge_uuid(group_id: Column, episode_uuid_col: Column, subj: Column, pred: Column, obj: Column) -> Column:
    return _md5_concat(F.lit("ed"), group_id, episode_uuid_col, subj, pred, obj)


def community_uuid(group_id: Column, label: Column) -> Column:
    return _md5_concat(F.lit("cm"), group_id, label.cast("string"))


# -- pure-python twins (for the pandas oracle in tests) ----------------------

def py_md5(*parts: str) -> str:
    return hashlib.md5(SEP.join(parts).encode("utf-8")).hexdigest()


def py_episode_uuid(group_id: str, conv_id: str, turn_idx: int) -> str:
    return py_md5("ep", group_id, conv_id, str(turn_idx))


def py_entity_uuid(group_id: str, name: str) -> str:
    return py_md5("en", group_id, name.lower())


def py_edge_uuid(group_id: str, episode_uuid_: str, subj: str, pred: str, obj: str) -> str:
    return py_md5("ed", group_id, episode_uuid_, subj, pred, obj)


# SQL fragment twins (DuckDB oracle) — keep in sync with the column fns above.
SQL_EPISODE_UUID = "md5(concat_ws('|', 'ep', {group_id}, {conv_id}, cast({turn_idx} as varchar)))"
SQL_ENTITY_UUID = "md5(concat_ws('|', 'en', {group_id}, lower({name})))"
