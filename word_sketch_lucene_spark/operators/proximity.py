"""Positional joins over exploded tokens: span adjacency + slop windows.

Reference parity: BCQL span sequences compile to Lucene ``SpanNear``
queries — ordered adjacency (``slop=0, inOrder=true``) for token
sequences, and windowed proximity for ``[]{min,max}`` gaps /
``default_slop`` relations (SURVEY §2.3 J1/J2;
``CollocateQueryHelper.java:197-199``, ``grammars/relations.json:40-48``,
``README.md:704-708`` ``SpanNearQuery...setSlop(10)``).

Spark-first: both are self-joins of the token table on ``doc_id`` with
a position predicate. Adjacency is a pure equi-join on
``(doc_id, pos+k)`` — no range condition, so Catalyst uses a hash join
keyed on both columns. Windows are an equi-join on ``doc_id`` plus a
band filter ``pos+min ≤ pos₂ ≤ pos+max``; per-doc token counts are
bounded (web pages), so the per-key fan-out stays bounded at any
corpus size — the join scales with the corpus, not quadratically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sides(tokens: DataFrame) -> tuple[DataFrame, DataFrame]:
    a = tokens.select(F.col("doc_id"), F.col("pos").alias("head_pos"),
                      F.col("term").alias("head_term"))
    b = tokens.select(F.col("doc_id").alias("doc_id_b"),
                      F.col("pos").alias("colloc_pos"),
                      F.col("term").alias("colloc_term"))
    return a, b


def adjacent_pairs(tokens: DataFrame, distance: int = 1) -> DataFrame:
    """J1 span sequence: pairs at exactly ``pos₂ = pos₁ + distance``.

    Equi-join on ``(doc_id, pos)`` — the position arithmetic is folded
    into the join key, so no post-filter and no theta-join.
    """
    a, b = _sides(tokens)
    return a.join(
        b,
        (a["doc_id"] == b["doc_id_b"])
        & (b["colloc_pos"] == a["head_pos"] + distance),
    ).select("doc_id", "head_pos", "head_term", "colloc_pos", "colloc_term")


def window_pairs(
    tokens: DataFrame,
    min_gap: int = 1,
    max_gap: int = 5,
    ordered: bool = True,
    head_filter: Column | None = None,
    colloc_filter: Column | None = None,
) -> DataFrame:
    """J2 windowed proximity join (slop): collocate within ``[min_gap,
    max_gap]`` tokens of the head; ``ordered=False`` searches both
    directions (Lucene ``inOrder=false``).

    Filters are pushed below the join (Catalyst would do it too — being
    explicit keeps the plan legible) so selective predicates shrink the
    join inputs, not the join output.
    """
    a, b = _sides(tokens)
    if head_filter is not None:
        a = a.filter(head_filter)
    if colloc_filter is not None:
        b = b.filter(colloc_filter)
    gap = b["colloc_pos"] - a["head_pos"]
    if ordered:
        cond = (gap >= min_gap) & (gap <= max_gap)
    else:
        cond = (F.abs(gap) >= min_gap) & (F.abs(gap) <= max_gap)
    return a.join(
        b, (a["doc_id"] == b["doc_id_b"]) & cond,
    ).select("doc_id", "head_pos", "head_term", "colloc_pos", "colloc_term")


def negated_positions(tokens: DataFrame, pred: Column) -> DataFrame:
    """P1 negation ``[attr!=...]`` as an anti-join on (doc, pos)
    (SURVEY §2.3: ``left_anti`` is the reference's ``[tag!=...]`` form,
    ``plans/concept-sketch-spec.md:60``)."""
    bad = tokens.filter(pred).select("doc_id", "pos")
    return tokens.join(bad, ["doc_id", "pos"], "left_anti")
