"""Text scalar functions (SURVEY §2.9) — all JVM-side Column exprs.

F8 newline strip (nodes.py:274, edges.py:193), F9 control-char clean
(llm_client/client.py:68-88), F11 word tokenization for overlap
(bulk_utils.py:229-231), F12 speaker parse (prompts/extract_nodes.py:105).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_newlines(col: Column) -> Column:
    return F.regexp_replace(col, "\n", " ")


def clean_input(col: Column) -> Column:
    """Drop zero-width/control characters (reference _clean_input)."""
    return F.regexp_replace(col, "[\\x00-\\x1f\\x7f\\u200b\\u200c\\u200d\\ufeff]", "")


def tokens(col: Column) -> Column:
    """Lowercased word set for overlap blocking (F11)."""
    return F.array_distinct(
        F.filter(F.split(F.lower(F.trim(col)), "\\s+"), lambda t: t != "")
    )


def speaker(content: Column) -> Column:
    """Part before the first ': ' of message content (F12)."""
    return F.split_part(content, F.lit(": "), F.lit(1))
