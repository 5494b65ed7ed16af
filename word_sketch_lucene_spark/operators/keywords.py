"""Subcorpus keyword extraction — Dunning log-likelihood (G²) keyness.

The classic corpus-linguistics "keywords" analysis the reference's
sketch/compare endpoints stop short of: rank the terms of a
metadata-defined subcorpus A against the rest of the corpus B by the
2-cell Dunning G² statistic

    G² = 2·( fa·ln(fa/E1) + fb·ln(fb/E2) ),
    E1 = Na·(fa+fb)/(Na+Nb),  E2 = Nb·(fa+fb)/(Na+Nb)

(zero-count cells contribute 0). Scoring reuses the engine's G²
family (``functions/scoring.py``, reference ``README.md:581-607``);
this module adds the subcorpus contingency plumbing.

Scale shape: the subcorpus flag is computed BEFORE the token explode,
so the whole analysis is ONE map-side-combinable conditional aggregate
on ``term`` plus a 2-number totals broadcast — no doc-level join, no
second pass. The keyness direction test uses exact integer
cross-multiplication (``fa·Nb > fb·Na``), so the A-vs-B split is
engine-independent (no float ratio at the filter boundary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_expr


def keyword_g2_expr(fa: Column, fb: Column, na: Column, nb: Column) -> Column:
    """Dunning G² for one term's (fa, fb) against corpus sizes (Na, Nb)."""
    total = (fa + fb).cast("double")
    n = (na + nb).cast("double")
    e1 = na.cast("double") * total / n
    e2 = nb.cast("double") * total / n
    t1 = F.when(fa > 0, fa.cast("double") * F.log(fa.cast("double") / e1)) \
        .otherwise(F.lit(0.0))
    t2 = F.when(fb > 0, fb.cast("double") * F.log(fb.cast("double") / e2)) \
        .otherwise(F.lit(0.0))
    return F.lit(2.0) * (t1 + t2)


def keywords_from_flagged_tokens(tok: DataFrame, k: int = 20,
                                 round_dp: int | None = 4) -> DataFrame:
    """``(term, in_a ∈ {0,1})`` rows → top-k keywords of subcorpus A:
    ``(term, fa, fb, g2)`` ranked ``(g2 desc, term asc)``.

    The shared tail for the DataFrame and index-served paths: one
    grouped conditional aggregate (partial map-side), totals as a
    1-row broadcast, exact-integer direction filter, bounded top-k.
    """
    tf = tok.groupBy("term").agg(
        F.sum("in_a").alias("fa"),
        F.sum(1 - F.col("in_a")).alias("fb"))
    totals = tf.agg(F.sum("fa").alias("na"), F.sum("fb").alias("nb"))
    g2 = keyword_g2_expr(F.col("fa"), F.col("fb"), F.col("na"), F.col("nb"))
    if round_dp is not None:
        g2 = F.round(g2, round_dp)
    return (tf.crossJoin(F.broadcast(totals))
            # keyness of A only, decided in exact integer space
            .filter(F.col("fa") * F.col("nb") > F.col("fb") * F.col("na"))
            .select("term", "fa", "fb", g2.alias("g2"))
            .orderBy(F.desc("g2"), "term")
            .limit(k))


def subcorpus_keywords(docs: DataFrame, predicate: str, k: int = 20,
                       text_col: str = "text",
                       round_dp: int | None = 4) -> DataFrame:
    """Keywords of the subcorpus selected by the SQL ``predicate`` over
    the document table's own metadata columns (e.g. ``"lang <> 'en'"``
    or ``"source IN ('src1','src2')"``) vs the rest of the corpus."""
    tok = docs.select(
        F.expr(predicate).cast("int").alias("in_a"),
        F.explode(tokens_expr(F.col(text_col))).alias("term"))
    return keywords_from_flagged_tokens(tok, k, round_dp)
