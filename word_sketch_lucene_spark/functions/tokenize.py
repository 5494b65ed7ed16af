"""Tokenization: text → (term, position) streams.

Reference parity: the reference's tokens come from an external tagger
(``tag_with_stanza.py:38-100``, SURVEY §2.9 U1) feeding a CoNLL-U →
chunk pipeline (``ConlluConverter.java:47-124``). The rebuild needs only
the tokenize step on raw web text; it is exposed two ways with
*identical semantics*:

1. :func:`tokens_expr` — pure JVM Catalyst expression (``lower`` →
   ``split`` → ``filter``), whole-stage-codegen'd; the fast path for
   SQL-oracle-checked operators.
2. :func:`tokenize_udf` — Arrow-vectorized ``pandas_udf`` (the north
   rule's "Arrow-vectorized tokenization UDF"); used by the index build
   where a pluggable/linguistic tokenizer would slot in at production.

Tokenization rule (deterministic, DuckDB-reproducible):
``lowercase; split on runs of [^a-z0-9]; drop empty tokens; 0-based
positions``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Single source of truth for the token boundary rule.
TOKEN_SPLIT_RE = "[^a-z0-9]+"
_TOKEN_SPLIT = re.compile(TOKEN_SPLIT_RE)

# DuckDB fragment computing the same token array (kept adjacent to the
# Spark expression so the two can never drift apart silently).
DUCKDB_TOKENS_SQL = (
    "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), t -> t <> '')"
)


def tokens_expr(col: Column | str) -> Column:
    """JVM-side token array: lower → regex split → drop empties."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer; semantics identical to :func:`tokens_expr`."""
    def tok(s):
        if s is None:
            return []
        return [t for t in _TOKEN_SPLIT.split(s.lower()) if t]

    return texts.map(tok)


def tokenize_py(text: str) -> list[str]:
    """Driver-side reference tokenizer (oracles, query parsing)."""
    if not text:
        return []
    return [t for t in _TOKEN_SPLIT.split(text.lower()) if t]


def explode_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_pandas_udf: bool = False,
    with_dl: bool = False,
) -> DataFrame:
    """``(id, text)`` → exploded ``(doc_id, pos, term[, dl])`` rows.

    ``posexplode`` stays JVM-side; positions are 0-based token offsets
    (the reference's hit positions are 0-based too,
    ``BlackLabQueryExecutor.java:174``).

    ``with_dl=True`` attaches the document length as a per-row column
    computed *during* tokenization (``size(tokens)``) — the index build
    uses this so per-posting ``dl`` needs no ``doc_lens`` join at all.
    """
    toks = tokenize_udf(F.col(text_col)) if use_pandas_udf else tokens_expr(text_col)
    if not with_dl:
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(toks).alias("pos", "term"),
        )
    return df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
    ).select(
        "doc_id",
        F.posexplode("_toks").alias("pos", "term"),
        F.size("_toks").alias("dl"),
    )


def doc_lengths(tokens: DataFrame) -> DataFrame:
    """Per-document token count ``(doc_id, dl)`` from exploded tokens."""
    return tokens.groupBy("doc_id").agg(F.count("*").alias("dl"))
