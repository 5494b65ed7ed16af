"""Dedup operators: goldens on planted duplicates + python oracles."""

import itertools
import re

import pytest
from pyspark.sql import functions as F

from word_sketch_lucene_spark.operators.dedup import (
    exact_dedup,
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_near_dups,
    ngram_jaccard_pairs,
    simhash_near_dups,
    word_shingles,
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " woof"  # J₃ ≈ 0.91 — solidly inside LSH recall range
    far = "completely different content about spark shuffles and parquet files"
    rows = [
        (0, base), (1, base),          # exact dups
        (2, near),                      # near dup of 0/1
        (3, far), (4, far + " extra"),  # near dups of each other
        (5, "tiny"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _jaccard_py(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        toks = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    sa, sb = sh(a), sh(b)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_exact_duplicates(dup_docs):
    groups = exact_duplicates(dup_docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 2 and groups[0]["keeper"] == 0
    assert groups[0]["dup_ids"] == [0, 1]


def test_exact_dedup_keeps_one(dup_docs):
    kept = exact_dedup(dup_docs)
    assert kept.count() == 5
    assert kept.filter(F.col("doc_id") == 1).count() == 0


def test_ngram_jaccard_matches_python(dup_docs):
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(dup_docs, n=3, threshold=0.3).collect()}
    texts = {r["doc_id"]: r["text"] for r in dup_docs.collect()}
    expected = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        j = _jaccard_py(texts[a], texts[b])
        if j >= 0.3:
            expected[(a, b)] = j
    assert set(got) == set(expected)
    for k in got:
        assert got[k] == pytest.approx(expected[k], rel=1e-12)


def test_jaccard_exact_dup_is_one(dup_docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(dup_docs, threshold=0.99).collect()}
    assert pairs[(0, 1)] == 1.0


def test_minhash_lsh_finds_near_dups(dup_docs):
    cand = {(r["doc_a"], r["doc_b"])
            for r in minhash_lsh_candidates(dup_docs).collect()}
    assert (0, 1) in cand          # exact dup always collides
    assert (0, 2) in cand or (1, 2) in cand  # near dup should collide
    verified = {(r["doc_a"], r["doc_b"])
                for r in minhash_near_dups(dup_docs, threshold=0.5).collect()}
    assert (0, 1) in verified
    assert all(p in cand for p in verified)  # verify ⊆ candidates


def test_simhash_near_dups(dup_docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_near_dups(dup_docs, max_hamming=8,
                                        shingle_n=2).collect()}
    assert pairs.get((0, 1)) == 0  # identical text → identical simhash
    # near pair within budget; unrelated docs not both present with 0
    assert (0, 5) not in pairs


def test_shingles_distinct(spark):
    df = spark.createDataFrame([(0, "a b a b a b")], ["doc_id", "text"])
    sh = word_shingles(df, n=2).collect()
    assert {r["shingle"] for r in sh} == {"a b", "b a"}


def test_minhash_verify_is_candidate_only(docs_small, docs_small_pd):
    """Pin the two-phase contract on real data: verified pairs ==
    {LSH candidates with true python-computed Jaccard >= threshold},
    with exact jaccard values — proving the verify phase computes true
    Jaccard per candidate (never a corpus-wide pair join)."""
    thr = 0.1
    cand = {(r["doc_a"], r["doc_b"])
            for r in minhash_lsh_candidates(docs_small).collect()}
    texts = dict(zip(docs_small_pd["doc_id"], docs_small_pd["text"]))
    expected = {}
    for a, b in cand:
        j = _jaccard_py(texts[a], texts[b])
        if j >= thr:
            expected[(a, b)] = j
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in minhash_near_dups(docs_small, threshold=thr).collect()}
    assert set(got) == set(expected)
    for k in got:
        assert got[k] == pytest.approx(expected[k], rel=1e-12)


def test_shingle_df_cap_drops_hot_shingles(spark):
    """With a df cap, pairs connected only by a boilerplate shingle
    disappear; sizes are computed post-cap so Jaccard stays consistent."""
    boiler = "all rights reserved contact us here"
    rows = [(i, f"unique page {i} body text {i * 7} " + boiler)
            for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = ngram_jaccard_pairs(df, n=3, threshold=0.01)
    capped = ngram_jaccard_pairs(df, n=3, threshold=0.01, max_shingle_df=3)
    assert uncapped.count() == 15  # all pairs share the boilerplate run
    assert capped.count() == 0     # hot shingles (df=6 > 3) are dropped


def test_exact_duplicates_id_cap(spark):
    """A mega-hot digest must not collect an unbounded dup_ids array;
    n_dups stays exact while the id sample is capped."""
    rows = [(i, "same text") for i in range(50)] + [(99, "other")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    g = exact_duplicates(df, max_ids_per_group=5).collect()
    assert len(g) == 1
    assert g[0]["n_dups"] == 50 and g[0]["keeper"] == 0
    assert g[0]["dup_ids"] == [0, 1, 2, 3, 4]


def test_minhash_signatures_batch_boundary_invariant(spark, docs_small):
    """The run-detection reduceat kernel must produce identical
    signatures regardless of Arrow batch boundaries (carry logic)."""
    from word_sketch_lucene_spark.operators.dedup import minhash_signatures

    sh = word_shingles(docs_small, 3, hashed=True).select(
        "doc_id", F.col("shingle").alias("h"))
    base = {r["doc_id"]: r["sig"]
            for r in minhash_signatures(sh, 16).collect()}
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        tiny = {r["doc_id"]: r["sig"]
                for r in minhash_signatures(sh, 16).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert len(base) == 500 and base == tiny


def test_simhash_signatures_matches_udf_semantics(spark):
    """The shared-shingle-table simhash variant: identical docs get
    identical signatures; disjoint docs differ (hash function differs
    from the text UDF by design — xxhash64 vs md5 — so only structural
    properties are pinned)."""
    from word_sketch_lucene_spark.operators.dedup import simhash_signatures

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over dogs"),
         (1, "the quick brown fox jumps over dogs"),
         (2, "entirely different words appear here now")],
        ["doc_id", "text"])
    sh = word_shingles(docs, 2, hashed=True).select(
        "doc_id", F.col("shingle").alias("h"))
    sigs = {r["doc_id"]: r["sig"]
            for r in simhash_signatures(sh).collect()}
    assert sigs[0] == sigs[1] != sigs[2]


def test_md5le64_parity_three_engines(spark):
    """md5le64_expr (Spark) == int.from_bytes(md5[:8], 'little')
    (Python, what the streaming UDF hashes) == md5_number_upper
    (DuckDB, what the oracle hashes) — over edge-case and bulk
    strings. This equality is the bridge the minhash oracle stands on."""
    import hashlib

    import duckdb
    from pyspark.sql import functions as F

    from word_sketch_lucene_spark.operators.dedup import md5le64_expr

    strings = ["", "a", " ", "the quick brown fox", "0" * 64,
               'quote " backslash \\', "tab\tsep", "newline\nend",
               "unicode £€ 中文 🙂", "a b c", "b a c"]
    strings += [f"shingle {i} of synthetic {i*i}" for i in range(200)]

    def py64(s: str) -> int:
        v = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
        return v - (1 << 64) if v >= (1 << 63) else v

    want = {s: py64(s) for s in strings}

    sdf = spark.createDataFrame([(s,) for s in strings], "s string")
    got_spark = {r["s"]: r["h"] for r in
                 sdf.select("s", md5le64_expr(F.col("s")).alias("h"))
                 .collect()}
    assert got_spark == want

    con = duckdb.connect()
    got_duck = {}
    for s in strings:
        u = con.execute("select md5_number_upper(?)", [s]).fetchone()[0]
        got_duck[s] = u - (1 << 64) if u >= (1 << 63) else u
    assert got_duck == want
