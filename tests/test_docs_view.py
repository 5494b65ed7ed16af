"""Docs-view serving features: seeded hit sampling + facet grouping."""

import pytest
from pyspark.sql import functions as F

from word_sketch_lucene_spark.query.docs import docs_facets, sample_spans


@pytest.fixture(scope="module")
def spans(spark):
    rows = [(d, p, p + 1) for d in range(6) for p in range(10)]
    return spark.createDataFrame(rows, "doc_id long, start long, end long")


def test_sample_deterministic_and_bounded(spans):
    a = sample_spans(spans, 10, seed=3).collect()
    b = sample_spans(spans, 10, seed=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 10
    assert [r["sample_rank"] for r in a] == list(range(1, 11))
    # a different seed draws a different subset (60 choose 10 — equality
    # would mean the seed is ignored)
    c = sample_spans(spans, 10, seed=4).collect()
    assert {(r["doc_id"], r["start"]) for r in c} != \
        {(r["doc_id"], r["start"]) for r in a}


def test_sample_subset_monotone(spans):
    """Growing n extends the sample (prefix property of key order)."""
    small = sample_spans(spans, 5, seed=1).collect()
    big = sample_spans(spans, 15, seed=1).collect()
    assert [tuple(r)[1:] for r in small] == [tuple(r)[1:] for r in big[:5]]


def test_sample_spreads_across_docs(spans):
    """Content hashing samples hits, not documents: 20 of 60 spans
    across 6 docs should touch most docs (a per-partition or per-doc
    truncation would collapse to few)."""
    got = sample_spans(spans, 20, seed=0).collect()
    assert len({r["doc_id"] for r in got}) >= 4


def test_sample_rejects_nonpositive(spans):
    with pytest.raises(ValueError):
        sample_spans(spans, 0)


def test_docs_facets_counts(spark):
    spans = spark.createDataFrame(
        [(0, 1, 1), (0, 5, 6), (1, 2, 2), (2, 0, 1), (3, 9, 9)],
        "doc_id long, start long, end long")
    meta = spark.createDataFrame(
        [(0, "en"), (1, "en"), (2, "de"), (3, "de"), (4, "fr")],
        "doc_id long, lang string")
    out = docs_facets(spans, meta, ("lang",)).collect()
    # fr has no hits → absent; en: 2 docs 3 hits; de: 2 docs 2 hits
    assert [(r["lang"], r["n_docs"], r["hits"]) for r in out] == \
        [("en", 2, 3), ("de", 2, 2)]


def test_docs_facets_requires_facets(spark):
    df = spark.range(1).select(F.col("id").alias("doc_id"),
                               F.lit(0).alias("start"),
                               F.lit(0).alias("end"))
    with pytest.raises(ValueError):
        docs_facets(df, df, ())
