"""Collocation sketches: grouped pair aggregation + logDice ranking.

Reference parity — the flagship query path (SURVEY §3.1):
- A1 group-by collocate identity (``CollocateQueryHelper.java:201-205``)
- A3 corpus term-frequency aggregate (``:121-136``)
- A4 logDice + rank + top-k (``LogDiceUtils.java:21-55``, ranking
  ``CollocateQueryHelper.java:226-270``)
- A5's upper-bound prune becomes moot: the stats lookup is ONE
  broadcast hash join instead of per-collocate fetches, so there is
  nothing lazy to skip (SURVEY §4.1).
- A6 per-relation totals (``SketchHandlers.java:134-135``)
- The precomputed collocation store (``collocations.bin``, 700 MB @
  74 M sentences, ``CLAUDE.md:190-196``) is :func:`pair_counts`
  written to parquet — a materialized aggregate, Spark's native
  strength.

Scale notes: the pair table is the window join of ``proximity.py``
(bounded per-doc fan-out). The groupBy keys are (head, collocate)
pairs — far better spread than raw head terms; map-side partial
aggregation collapses hot pairs before the shuffle. ``term_stats``
joins are explicitly ``broadcast()`` when small (query-term sets) and
left to AQE otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scoring import logdice_expr, rel_freq_expr
from .proximity import window_pairs


def pair_counts(
    tokens: DataFrame,
    min_gap: int = 1,
    max_gap: int = 5,
    ordered: bool = True,
) -> DataFrame:
    """``(head_term, colloc_term, pair_freq)`` — the materialized
    collocation store (the ``collocations.bin`` analog)."""
    return (
        window_pairs(tokens, min_gap, max_gap, ordered)
        .groupBy("head_term", "colloc_term")
        .agg(F.count("*").alias("pair_freq"))
    )


def collocates_for_head(
    tokens: DataFrame,
    term_stats: DataFrame,
    head_term: str,
    min_gap: int = 1,
    max_gap: int = 5,
    ordered: bool = False,
    min_logdice: float = 0.0,
    limit: int = 20,
    colloc_filter: Column | None = None,
    round_dp: int | None = None,
) -> DataFrame:
    """Ranked collocates of one headword — the reference's
    ``GET /api/sketch/{lemma}`` per-relation core.

    Plan: window join (head side pre-filtered to the one term — the
    selective predicate reaches the token scan) → groupBy collocate →
    broadcast-join term stats for f(A), f(B) → logDice → min-score
    filter (P6) → top-k (W1 ``TakeOrderedAndProject``).

    Returns ``(colloc_term, pair_freq, logdice, rel_freq)``.
    """
    pairs = window_pairs(
        tokens, min_gap, max_gap, ordered,
        head_filter=F.col("head_term") == head_term,
        colloc_filter=colloc_filter,
    )
    grouped = pairs.groupBy("colloc_term").agg(F.count("*").alias("pair_freq"))
    head_cf = term_stats.filter(F.col("term") == head_term).select(
        F.col("cf").alias("head_cf"))
    # NOTE: term_stats is NOT broadcast-hinted — at web scale the
    # vocabulary is O(10⁸⁺) rows and a forced broadcast OOMs the driver.
    # The grouped collocate set is the small side; AQE broadcasts it
    # (or the stats side when genuinely small) at runtime.
    scored = (
        grouped.join(term_stats.select(
            F.col("term").alias("colloc_term"), F.col("cf").alias("colloc_cf")),
            "colloc_term")
        .crossJoin(F.broadcast(head_cf))
        .withColumn("logdice", logdice_expr(
            F.col("pair_freq").cast("double"),
            F.col("head_cf").cast("double"),
            F.col("colloc_cf").cast("double")))
        .withColumn("rel_freq", rel_freq_expr(
            F.col("pair_freq").cast("double"),
            F.col("head_cf").cast("double")))
        .filter(F.col("logdice") >= F.lit(min_logdice))
    )
    if round_dp is not None:
        scored = scored.withColumn("logdice", F.round("logdice", round_dp)) \
                       .withColumn("rel_freq", F.round("rel_freq", round_dp))
    return (
        scored.select("colloc_term", "pair_freq", "logdice", "rel_freq")
        .orderBy(F.desc("logdice"), F.asc("colloc_term"))
        .limit(limit)
    )


def relation_totals(collocates: DataFrame) -> DataFrame:
    """A6: total matches of a relation = Σ pair_freq
    (``SketchHandlers.java:134-135,324``)."""
    return collocates.agg(F.sum("pair_freq").alias("total_matches"))
