"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting.

All four are pure Catalyst expressions (JVM-side, codegen'd) so they
run at scan speed over 100 TB — and every one is reproducible in the
DuckDB oracle as the *same* expression (see ``oracle_sql.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_expr

# marker stopwords per language (tiny n-gram-free heuristic — langid at
# web scale is a model call; this is the scan-speed prefilter tier)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "it"],
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "los", "las", "es", "una", "que"],
}

EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"]


def _marker_count(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(words)))


def lang_id_expr(text_col: Column) -> Column:
    """Best-scoring language by marker-word counts; 'und' (undetermined)
    when nothing matches. Deterministic tie-break by language code order."""
    toks = tokens_expr(text_col)
    scored = None
    for lang in sorted(LANG_MARKERS):
        cnt = _marker_count(toks, LANG_MARKERS[lang])
        pair = F.struct(cnt.alias("score"), F.lit(lang).alias("lang"))
        scored = pair if scored is None else F.when(
            (pair["score"] > scored["score"]), pair).otherwise(scored)
    return F.when(scored["score"] > 0, scored["lang"]).otherwise(F.lit("und"))


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    return docs.select(F.col(id_col).alias("doc_id"),
                       lang_id_expr(F.col(text_col)).alias("lang_pred"))


def quality_features(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     round_dp: int | None = 4) -> DataFrame:
    """Length / punctuation / stopword / word-length features + a
    composite quality score in [0,1].

    ``(doc_id, n_chars, n_tokens, punct_ratio, stopword_ratio,
    mean_token_len, quality)``
    """
    toks = tokens_expr(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(F.col(text_col),
                                                r"[^\w\s]", ""))
    stop = _marker_count(toks, EN_STOPWORDS)
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1)).cast("double")
    stop_ratio = stop / F.greatest(n_tokens, F.lit(1)).cast("double")
    mean_len = sum_len / F.greatest(n_tokens, F.lit(1)).cast("double")
    # composite: long enough, low punctuation noise, plausible word lengths
    quality = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))) * F.lit(0.3)
        + F.when((mean_len >= 3) & (mean_len <= 8), F.lit(0.3)).otherwise(F.lit(0.1))
    )
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_len.alias("mean_token_len"),
        quality.alias("quality"),
    )
    if round_dp is not None:
        for c in ("punct_ratio", "stopword_ratio", "mean_token_len", "quality"):
            out = out.withColumn(c, F.round(c, round_dp))
    return out


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (GPT-style rule of
    thumb: ~1 token per 4 characters, floor at word count).

    ``(doc_id, ws_tokens, subword_est)``
    """
    ws = F.size(F.filter(F.split(F.col(text_col), r"\s+"),
                         lambda t: t != F.lit("")))
    sub = F.greatest(ws, F.ceil(F.length(F.col(text_col)) / F.lit(4.0)).cast("int"))
    return docs.select(F.col(id_col).alias("doc_id"),
                       ws.alias("ws_tokens"),
                       sub.cast("long").alias("subword_est"))


FP_MOD = (1 << 31) - 1  # Mersenne prime 2^31-1: keeps the rolling hash in
FP_MUL = 1_000_003      # integer range identical across engines


def fingerprint_expr(text_col: Column) -> Column:
    """Order-sensitive rolling document fingerprint, computed JVM-side:
    ``acc = (acc·1000003 + 131·len(tok) + ascii(tok[0])) mod (2³¹-1)``
    folded over the token stream with ``F.aggregate``."""
    toks = tokens_expr(text_col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(FP_MUL)
                        + F.length(t).cast("long") * F.lit(131)
                        + F.ascii(F.substring(t, 1, 1)).cast("long"))
        % F.lit(FP_MOD),
    )


def fingerprints(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    return docs.select(F.col(id_col).alias("doc_id"),
                       fingerprint_expr(F.col(text_col)).alias("fingerprint"))
