"""Collocation/sketch layer: goldens on a tiny fixture + brute-force
oracle on real testdata (mirrors the reference's stub-backed pipeline
tests, BlackLabIntegrationTest.java:45-110)."""

import itertools
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from word_sketch_lucene_spark.functions.scoring import logdice_py
from word_sketch_lucene_spark.functions.tokenize import explode_tokens, tokenize_py
from word_sketch_lucene_spark.index.stats import term_stats
from word_sketch_lucene_spark.operators.collocation import (
    collocates_for_head,
    pair_counts,
    relation_totals,
)
from word_sketch_lucene_spark.operators.proximity import (
    adjacent_pairs,
    negated_positions,
    window_pairs,
)


@pytest.fixture(scope="module")
def tiny_tokens(spark):
    # mirrors /root/reference/test-data/sample.conllu collocation fixture:
    # known pairs "big dog", "small cat", "beautiful house" (FIXTURES.md §C)
    docs = [
        (0, "the big dog chased the small cat"),
        (1, "a big dog and a beautiful house"),
        (2, "the small cat sat in the beautiful house"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return explode_tokens(df)


def test_adjacent_pairs_golden(tiny_tokens):
    pairs = {(r["head_term"], r["colloc_term"])
             for r in adjacent_pairs(tiny_tokens).collect()}
    assert ("big", "dog") in pairs
    assert ("small", "cat") in pairs
    assert ("beautiful", "house") in pairs
    assert ("dog", "big") not in pairs  # ordered, distance=+1


def test_window_pairs_ordered_vs_unordered(tiny_tokens):
    o = window_pairs(tiny_tokens, 1, 2, ordered=True).count()
    u = window_pairs(tiny_tokens, 1, 2, ordered=False).count()
    assert u == 2 * o  # symmetric closure doubles ordered pairs


def test_window_pairs_brute_force(tiny_tokens):
    got = {(r["doc_id"], r["head_pos"], r["colloc_pos"])
           for r in window_pairs(tiny_tokens, 1, 3, ordered=True).collect()}
    toks = tiny_tokens.collect()
    by_doc = {}
    for r in toks:
        by_doc.setdefault(r["doc_id"], []).append(r["pos"])
    expected = set()
    for d, ps in by_doc.items():
        for p1, p2 in itertools.product(ps, ps):
            if 1 <= p2 - p1 <= 3:
                expected.add((d, p1, p2))
    assert got == expected


def test_negated_positions(tiny_tokens):
    kept = negated_positions(tiny_tokens, F.col("term") == "the")
    assert kept.filter(F.col("term") == "the").count() == 0
    n_the = tiny_tokens.filter(F.col("term") == "the").count()
    assert kept.count() == tiny_tokens.count() - n_the


def test_collocates_logdice_matches_python(spark, docs_small):
    """Spark logDice ranking == brute-force python on the same window."""
    tokens = explode_tokens(docs_small)
    ts = term_stats(tokens)
    got = collocates_for_head(tokens, ts, "spark", min_gap=1, max_gap=2,
                              ordered=False, limit=10).collect()

    pdf = docs_small.select("doc_id", "text").toPandas()
    cf = Counter()
    pair = Counter()
    for _, row in pdf.iterrows():
        toks = tokenize_py(row["text"])
        cf.update(toks)
        for i, t in enumerate(toks):
            if t == "spark":
                for j in range(max(0, i - 2), min(len(toks), i + 3)):
                    if j != i and abs(j - i) >= 1:
                        pair[toks[j]] += 1
    expected = []
    for c, fab in pair.items():
        expected.append((c, fab, logdice_py(fab, cf["spark"], cf[c])))
    expected.sort(key=lambda x: (-x[2], x[0]))
    for g, e in zip(got, expected[:10]):
        assert g["colloc_term"] == e[0]
        assert g["pair_freq"] == e[1]
        assert g["logdice"] == pytest.approx(e[2], rel=1e-12)


def test_pair_counts_and_totals(tiny_tokens):
    pc = pair_counts(tiny_tokens, 1, 1, ordered=True)
    row = pc.filter((F.col("head_term") == "big")
                    & (F.col("colloc_term") == "dog")).collect()
    assert row[0]["pair_freq"] == 2
    tot = relation_totals(pc.withColumnRenamed("pair_freq", "pair_freq")).collect()
    assert tot[0]["total_matches"] == pc.agg(F.sum("pair_freq")).collect()[0][0]


def test_min_logdice_filter_and_limit(spark, docs_small):
    tokens = explode_tokens(docs_small)
    ts = term_stats(tokens)
    all_ = collocates_for_head(tokens, ts, "spark", limit=1000).collect()
    hi = collocates_for_head(tokens, ts, "spark", min_logdice=10.0,
                             limit=1000).collect()
    assert all(r["logdice"] >= 10.0 for r in hi)
    assert len(hi) == sum(1 for r in all_ if r["logdice"] >= 10.0)
    capped = collocates_for_head(tokens, ts, "spark", limit=5).collect()
    assert len(capped) == 5
    assert [r["colloc_term"] for r in capped] == \
        [r["colloc_term"] for r in all_[:5]]
