"""Similarity search: brute-force vs numpy oracle; LSH recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from word_sketch_lucene_spark.operators.similarity import (
    cosine_topk,
    lsh_cosine_topk,
    lsh_near_dup_pairs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.orderBy("vec_id").toPandas()
    # float64: Spark sums float32 inputs in double precision
    return (pdf["vec_id"].to_numpy(),
            np.stack(pdf["embedding"].to_numpy()).astype(np.float64))


def test_brute_force_matches_numpy(spark, emb, emb_np):
    ids, M = emb_np
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = cosine_topk(emb, queries, k=5).collect()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for qid in range(3):
        sims = Mn @ Mn[qid]
        order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))[:5]
        expected = [(int(ids[i]), sims[i]) for i in order]
        mine = [(r["vec_id"], r["cosine"]) for r in got
                if r["query_id"] == qid]
        assert [m[0] for m in mine] == [e[0] for e in expected]
        for m, e in zip(mine, expected):
            assert m[1] == pytest.approx(e[1], rel=1e-9)


def test_self_is_top1(emb):
    queries = emb.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), "embedding")
    top = cosine_topk(emb, queries, k=1).collect()[0]
    assert top["vec_id"] == 7 and top["cosine"] == pytest.approx(1.0)


def test_lsh_recall_reasonable(emb):
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = lsh_cosine_topk(emb, queries, k=5, n_planes=6).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(exact_sets[q] & approx_sets.get(q, set())) / 5
               for q in exact_sets]
    assert sum(recalls) / len(recalls) >= 0.4  # multiprobe 6-plane floor
    # the query itself must always survive (it shares its own bucket)
    for q in exact_sets:
        assert q in approx_sets.get(q, set())


def test_lsh_near_dup_pairs_self_consistency(spark, emb):
    # plant a duplicate embedding: vec 9999 == vec 0
    dup = emb.filter(F.col("vec_id") == 0).select(
        F.lit(9999).cast("long").alias("vec_id"), "embedding",
        F.lit(0).cast("int").alias("label"))
    withdup = emb.unionByName(dup)
    pairs = lsh_near_dup_pairs(withdup, threshold=0.999).collect()
    assert any(r["vec_a"] == 0 and r["vec_b"] == 9999 for r in pairs)
