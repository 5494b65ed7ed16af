"""Connected-components / near-dup clustering vs a union-find oracle."""

from __future__ import annotations

import random

import pytest

from word_sketch_lucene_spark.operators.components import (
    connected_components, near_dup_clusters)


def _uf_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Pure-python union-find: node → component-min label."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(df).collect()
    return {r["doc_id"]: r["cluster_id"] for r in out}


def test_components_random_graphs_match_union_find(spark):
    rng = random.Random(13)
    for trial in range(4):
        n = rng.randint(10, 60)
        m = rng.randint(5, 80)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [e for e in edges if e[0] != e[1]]
        got = _run(spark, edges)
        want = _uf_oracle(edges)
        assert got == want, f"trial {trial}"


def test_components_chain_converges_fast(spark):
    # a path graph is the worst case for naive min-propagation
    # (diameter rounds); large-star/small-star must finish in O(log^2 n)
    edges = [(i, i + 1) for i in range(200)]
    got = _run(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 201


def test_components_handles_duplicates_reversals_self_loops(spark):
    edges = [(1, 2), (2, 1), (2, 2), (2, 3), (7, 9)]
    got = _run(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_components_empty_edges(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(df).count() == 0


def test_near_dup_clusters_keep_semantics(spark):
    edges = [(5, 3), (3, 8), (20, 21)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = {r["doc_id"]: r for r in near_dup_clusters(df).collect()}
    assert rows[3]["keep"] and rows[3]["cluster_size"] == 3
    assert not rows[5]["keep"] and rows[5]["cluster_id"] == 3
    assert not rows[8]["keep"]
    assert rows[20]["keep"] and rows[20]["cluster_size"] == 2
    assert not rows[21]["keep"] and rows[21]["cluster_id"] == 20


def test_components_nonconvergence_guard(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=0)
