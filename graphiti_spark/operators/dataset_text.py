"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting — all built-in Column
expressions (codegen'd, oracle-mirrorable in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions import text as tx

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "ein", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "est", "je", "ne", "un", "une", "que"],
    "es": ["el", "la", "los", "y", "es", "yo", "no", "un", "una", "que"],
}


def _overlap(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(toks, arr))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID → `lang_pred` + per-language hit counts.
    Ties break by language order (en > de > fr > es), deterministic."""
    out = df.withColumn("_toks", tx.tokens(F.col(text_col)))
    for lang, words in STOPWORDS.items():
        out = out.withColumn(f"hits_{lang}", _overlap(F.col("_toks"), words))
    # winner = first language (in dict order) with the max hit count > 0
    expr = F.lit("unknown")
    for lang in reversed(list(STOPWORDS)):
        cond = F.col(f"hits_{lang}") > 0
        for other in STOPWORDS:
            if other != lang:
                cond = cond & (F.col(f"hits_{lang}") >= F.col(f"hits_{other}"))
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return out.withColumn("lang_pred", expr).drop("_toks")


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: length band + alpha ratio +
    stopword ratio + sentence-terminator presence (the standard
    C4/Gopher-style rule family, deterministic)."""
    n_chars = F.length(F.col(text_col))
    toks = tx.tokens(F.col(text_col))
    n_toks = F.size(toks)
    alpha_ratio = (
        F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z ]", "")) / F.greatest(n_chars, F.lit(1))
    )
    stop_ratio = _overlap(toks, STOPWORDS["en"]) / F.greatest(n_toks, F.lit(1))
    has_terminator = F.col(text_col).rlike("[.!?]")
    score = (
        F.when((n_chars >= 20) & (n_chars <= 20000), 0.25).otherwise(0.0)
        + F.when(alpha_ratio >= 0.6, 0.25).otherwise(0.0)
        + F.when(stop_ratio >= 0.05, 0.25).otherwise(0.0)
        + F.when(has_terminator, 0.25).otherwise(0.0)
    )
    return (
        df.withColumn("n_tokens", n_toks.cast("long"))
        .withColumn("alpha_ratio", F.round(alpha_ratio, 4))
        .withColumn("stopword_ratio", F.round(stop_ratio, 4))
        .withColumn("quality", score)
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate (count of word /
    number / punctuation pieces — cl100k-style pretokenizer shape). The
    piece pattern avoids lookarounds so DuckDB's RE2 mirrors it."""
    ws = F.size(F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != ""))
    pieces = F.size(F.expr(f"regexp_extract_all({text_col}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
    return df.withColumn("ws_tokens", ws.cast("long")).withColumn(
        "subword_tokens", pieces.cast("long")
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalization-stable document fingerprint: md5 of lowercased,
    whitespace-collapsed, punctuation-stripped text (rolling-hash
    analog for near-identical layout variants)."""
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""), " +", " ")
    )
    return df.withColumn("fingerprint", F.md5(norm))
