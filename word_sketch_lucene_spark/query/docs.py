"""Docs-view serving features: deterministic hit sampling and
document facet grouping.

BlackLab — the reference's query backend
(`/root/reference/src/main/java/pl/marcinmilkowski/word_sketch/query/
BlackLabQueryExecutor.java`) — serves two result views beyond the raw
hit list: a random SAMPLE of hits (the `sample`/`samplenumber` request
parameters) and the DOCS view, where per-document hit counts group by
a metadata field (`/docs?group=field:...`). Both re-expressed as
bounded Spark plans over the span DataFrames every pattern tier
already produces, so they serve the DataFrame compiler and the index
router alike.

Sampling is DETERMINISTIC here (seeded content hash, not an RNG): at
cluster scale a reproducible sample is a feature — the same
(pattern, seed) always returns the same page, across runs and across
engines, which is also what makes the result fully oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sample_spans", "docs_facets"]


def _sample_key(seed: int, span_cols: tuple[str, ...]) -> Column:
    # md5 hex of "seed:doc_id:start:end" — the lowercase hex STRING
    # compares identically under Spark's and ANSI SQL's binary
    # collation (unsigned big-endian digest order), so the sampled set
    # and its order reproduce bit-for-bit in the DuckDB oracle. Span
    # columns are integers, so the ':' join is injective.
    return F.md5(F.concat_ws(
        ":", F.lit(str(int(seed))), *[F.col(c) for c in span_cols]))


def sample_spans(spans: DataFrame, n: int, seed: int = 0,
                 span_cols: tuple[str, ...] = ("doc_id", "start", "end"),
                 ) -> DataFrame:
    """Seeded deterministic sample of ``n`` spans.

    Output ``(sample_rank, *span_cols)`` — rank 1..n in sample-key
    order. Plan: a single ``orderBy(key).limit(n)`` over the span plan
    (fuses to TakeOrderedAndProject — per-partition bounded heaps, no
    full-hit shuffle, driver rows ≤ n), then ``row_number`` over the
    already-bounded page. Every span hashes independently, so the
    sample is uniform over hits regardless of how they pack into
    documents or partitions — the property BlackLab's per-hit RNG
    sampling provides, minus the nondeterminism.
    """
    if n <= 0:
        raise ValueError("sample size must be positive")
    keyed = (spans.select(*span_cols)
             .withColumn("_sk", _sample_key(seed, span_cols)))
    top = keyed.orderBy("_sk").limit(n)
    w = Window.partitionBy(F.lit(1)).orderBy("_sk")
    return (top.withColumn("sample_rank", F.row_number().over(w))
            .select("sample_rank", *span_cols)
            .orderBy("sample_rank"))


def docs_facets(spans: DataFrame, doc_meta: DataFrame,
                facet_cols: tuple[str, ...] = ("lang",),
                ) -> DataFrame:
    """The DOCS view: documents with ≥1 hit, grouped by metadata.

    Output one row per facet-value combination:
    ``(*facet_cols, n_docs, hits)`` ordered by hits desc (facet values
    break ties). Plan: a map-side-combinable per-doc count (partial
    aggregation before the one shuffle), an equi-join to the
    column-pruned metadata projection on ``doc_id`` (both sides hash-
    partition on the join key; doc_meta is O(corpus docs), so no
    broadcast is assumed), then the tiny facet aggregate. Facet
    cardinality — not corpus size — bounds the result, so this holds
    shape at 100× data.
    """
    if not facet_cols:
        raise ValueError("need at least one facet column")
    per_doc = spans.groupBy("doc_id").agg(F.count("*").alias("doc_hits"))
    joined = per_doc.join(
        doc_meta.select("doc_id", *facet_cols), "doc_id")
    return (joined.groupBy(*facet_cols)
            .agg(F.count("*").alias("n_docs"),
                 F.sum("doc_hits").alias("hits"))
            .orderBy(F.desc("hits"), *facet_cols))
