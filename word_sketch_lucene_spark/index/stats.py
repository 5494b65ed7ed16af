"""Corpus statistics: the single grouped-aggregation pass BM25 needs.

Reference parity: the reference materializes ``stats.tsv`` /
``stats.bin`` (``lemma → totalFreq, docFreq``; ``index/stats.tsv:1-6``,
``CLAUDE.md:190-196``) and looks term frequencies up per query through
an LRU cache (``CollocateQueryHelper.java:52,102-145``). Spark-first,
both are one ``groupBy`` over the exploded tokens — partial (map-side)
aggregation makes the head-term skew harmless here because the
combiner collapses each hot term to one row per task *before* the
shuffle. Query-side lookups become broadcast joins of the (small)
query-term set against ``term_stats``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def term_stats(tokens: DataFrame) -> DataFrame:
    """``(term, df, cf)``: document frequency + collection frequency.

    Mirrors the reference's per-lemma ``totalFreq``/``docFreq`` columns
    (``index/stats.tsv``). ``countDistinct(doc_id)`` compiles to a
    two-phase aggregate (expand + partial) — exact, still skew-safe.
    """
    return tokens.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count("*").alias("cf"),
    )


POS_CLASSES = ("NOUN", "VERB", "ADJ", "DET", "X")


def term_stats_posdist(tokens: DataFrame, pos_col: str | None = None
                       ) -> DataFrame:
    """``(term, df, cf, n_<class>…)``: term stats WITH the per-term POS
    distribution — the reference's ``stats.tsv`` posDist column
    (``index/stats.tsv:1-6``) as conditional counts in the SAME single
    aggregation pass (no extra shuffle).

    ``pos_col`` names an annotation column (e.g. ``upos`` from the
    CoNLL-U layers); when absent, the deterministic word-class layer
    stands in (same convention as the sketch operators).
    """
    if pos_col is None:
        from ..plans.relations import word_class_expr

        tokens = tokens.withColumn("_pos_cls", word_class_expr("term"))
        pos_col = "_pos_cls"
    aggs = [F.countDistinct("doc_id").alias("df"), F.count("*").alias("cf")]
    aggs += [F.count(F.when(F.col(pos_col) == c, True)).alias(f"n_{c.lower()}")
             for c in POS_CLASSES]
    return tokens.groupBy("term").agg(*aggs)


def corpus_stats(doc_lens: DataFrame) -> dict:
    """``{N, avgdl, total_tokens}`` from the ``(doc_id, dl)`` table.

    One tiny all-to-one aggregate; the result is broadcast into every
    scoring expression as literals (no repeated lookup — replaces the
    reference's memoized stats cache).
    """
    row = doc_lens.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("total_tokens"),
    ).collect()[0]
    return {
        "n_docs": int(row["n_docs"]),
        "avgdl": float(row["avgdl"]),
        "total_tokens": int(row["total_tokens"]),
    }
