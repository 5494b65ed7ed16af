"""Deduplication operators for web-scale training-data pipelines.

Four families, all shuffle-architected for 10^12-doc scale:

- **exact**: content-hash groupBy — one shuffle on the digest, the
  canonical keeper chosen by deterministic min(doc_id).
- **n-gram Jaccard**: shingle table → self-join on shingle (inverted-
  index join: pairs sharing ≥1 shingle, the blocking step) → shared
  counts → exact Jaccard filter. No O(n²) cross join anywhere.
- **MinHash + LSH**: per-doc signatures (vectorized numpy inside a
  pandas UDF; deterministic affine permutations of a splitmix64 base
  hash), banded into buckets, bucket equi-join → candidates, verified
  with exact Jaccard. The shuffle key is (band, bucket-hash): hot
  buckets (boilerplate) are bounded by band width.
- **SimHash**: 64-bit weighted-feature hash; near-dups = signatures
  within Hamming distance d, found via the pigeonhole block trick
  (split into d+1 blocks; equal-block equi-join → candidates) — again
  no pairwise scan.

Embedding-cosine near-dup lives in ``similarity.py`` (same ANN
machinery).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..caching import persist_tracked
from ..functions.tokenize import tokens_expr
from ..sources.pages import _splitmix64


# ------------------------------------------------------------- exact
def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     max_ids_per_group: int = 1000) -> DataFrame:
    """Groups of byte-identical texts: ``(digest, n_dups, keeper,
    dup_ids)``; only groups with ≥2 members.

    ``dup_ids`` is CAPPED before collection: a mega-hot digest (e.g.
    the empty page, occurring 10⁸ times at web scale) would otherwise
    collect an unbounded array into one row. The cap is applied by a
    digest-partitioned ``row_number`` (sort-based, spills — never holds
    the group in memory) and ``collect_list`` skips the nulled-out
    tail, so per-group state is bounded by ``max_ids_per_group``.
    ``n_dups``/``keeper`` stay exact.
    """
    from pyspark.sql import Window

    hashed = docs.select(F.md5(F.col(text_col)).alias("digest"),
                         F.col(id_col).alias("doc_id"))
    w = Window.partitionBy("digest").orderBy("doc_id")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .groupBy("digest")
        .agg(F.count("*").alias("n_dups"),
             F.min("doc_id").alias("keeper"),
             F.sort_array(F.collect_list(
                 F.when(F.col("rn") <= max_ids_per_group,
                        F.col("doc_id")))).alias("dup_ids"))
        .filter(F.col("n_dups") >= 2)
    )


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct text (deterministic min-id keeper)."""
    keepers = (
        docs.select(F.md5(F.col(text_col)).alias("digest"),
                    F.col(id_col).alias("doc_id"))
        .groupBy("digest").agg(F.min("doc_id").alias(id_col))
    )
    return docs.join(keepers.select(id_col), id_col, "left_semi")


# ------------------------------------------------- n-gram Jaccard
def word_shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-grams per doc: ``(doc_id, shingle)``."""
    toks = tokens_expr(text_col)
    # n-gram via transform over index range; JVM-side, no UDF.
    # Guard: F.sequence(0, -1) would DESCEND, so short docs get [].
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # dedupe INSIDE the row (array_distinct, JVM-side) so no
    # corpus-wide distinct() shuffle is needed after the explode
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(F.array_distinct(grams)).alias("shingle"))


def _capped_shingles(docs: DataFrame, n: int, text_col: str, id_col: str,
                     max_shingle_df: int | None) -> DataFrame:
    """Shingle table with the hot-shingle document-frequency cap.

    A boilerplate shingle shared by 10⁶ docs creates ~10¹² candidate
    pairs in any shingle-keyed self-join; shingles with df > cap carry
    ~no Jaccard information, so dropping them is the standard blocking
    approximation (Jaccard is then defined over informative shingles —
    sizes are computed AFTER the cap so the metric stays consistent).

    The raw shingle table (the expensive n-gram string generation) is
    persisted BEFORE the df aggregate: it feeds both the aggregate and
    the cap join, and without materialization each consumer regenerates
    every n-gram of the corpus. Caller releases via
    ``caching.release_all()`` after the final action.
    """
    sh = word_shingles(docs, n, text_col, id_col)
    if max_shingle_df is None:
        return sh
    sh = persist_tracked(sh)
    sdf = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
    return (sh.join(sdf.filter(F.col("sdf") <= max_shingle_df), "shingle")
            .select("doc_id", "shingle"))


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8,
                        text_col: str = "text", id_col: str = "doc_id",
                        round_dp: int | None = None,
                        max_shingle_df: int | None = None) -> DataFrame:
    """Exact Jaccard near-dup pairs via the inverted-shingle join.

    ``(doc_a, doc_b, shared, size_a, size_b, jaccard)`` with
    ``doc_a < doc_b``; the shingle self-join IS the blocking step —
    pairs sharing no shingle are never materialized. ``max_shingle_df``
    drops shingles hotter than the cap before the self-join (the
    quadratic-per-posting-list guard; at web scale set it to O(100)).
    """
    # materialize the capped table once: it feeds three consumers
    # (sizes, both self-join sides) — in a production pipeline this is
    # the table you checkpoint to storage before the pair phase. The
    # caller releases both tracked caches after the final action.
    sh = persist_tracked(
        _capped_shingles(docs, n, text_col, id_col, max_shingle_df))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("size"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    out = (
        shared
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("size").alias("size_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("size").alias("size_b")), "doc_b")
        .withColumn("jaccard",
                    F.col("shared")
                    / (F.col("size_a") + F.col("size_b") - F.col("shared")))
        .filter(F.col("jaccard") >= threshold)
    )
    if round_dp is not None:
        out = out.withColumn("jaccard", F.round("jaccard", round_dp))
    return out.select("doc_a", "doc_b", "shared", "size_a", "size_b", "jaccard")


# ----------------------------------------------------- MinHash + LSH
def _shingle_hashes_py(text: str, n: int) -> np.ndarray:
    import re

    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    grams = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    # deterministic 64-bit hash of each shingle (python hash is salted —
    # use splitmix over a stable byte-fold instead)
    vals = np.fromiter(
        (int.from_bytes(__import__("hashlib").md5(g.encode()).digest()[:8],
                        "little") for g in grams),
        dtype=np.uint64, count=len(grams))
    return vals


def make_minhash_udf(num_hashes: int = 64, shingle_n: int = 3, seed: int = 7,
                     banned_hashes: np.ndarray | None = None):
    """Arrow-vectorized MinHash signature UDF: text → array<long>.

    Permutations are affine maps ``(aᵢ·h + bᵢ) mod 2⁶¹-1`` with
    deterministic aᵢ, bᵢ from splitmix64(seed, i). ``banned_hashes``
    (sorted uint64) drops hot/boilerplate shingles from the signature
    set so the signature estimates the SAME capped Jaccard the verify
    phase computes.
    """
    idx = np.arange(num_hashes, dtype=np.uint64)
    a = (_splitmix64((np.uint64(seed) << np.uint64(32)) ^ idx) | np.uint64(1))
    bcoef = _splitmix64((np.uint64(seed + 1) << np.uint64(32)) ^ idx)
    MERS = np.uint64((1 << 61) - 1)
    banned = (np.sort(banned_hashes.astype(np.uint64))
              if banned_hashes is not None and banned_hashes.size
              else None)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            hs = _shingle_hashes_py(t or "", shingle_n)
            if banned is not None and hs.size:
                pos = np.searchsorted(banned, hs)
                pos[pos == banned.size] = 0
                hs = hs[banned[pos] != hs]
            if hs.size == 0:
                out.append([0] * num_hashes)
                continue
            # (num_hashes, n_shingles) affine transforms, min over shingles
            m = (a[:, None] * hs[None, :] + bcoef[:, None]) % MERS
            out.append(m.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return minhash


def _shingle_u64(shingles: list[str]) -> np.ndarray:
    """Same md5-fold 64-bit hash as ``_shingle_hashes_py``."""
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    import hashlib

    return np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
         for s in shingles),
        dtype=np.uint64, count=len(shingles))


def _hot_shingle_hashes(shingle_df: DataFrame,
                        max_shingle_df: int) -> np.ndarray:
    """64-bit hashes of shingles hotter than the df cap — the ban list
    shipped into the signature UDF closure. Bounded: |hot| ≤ total
    shingle occurrences / cap, and in a Zipf corpus the hot head is
    tiny — thousands of strings, not a broadcast hazard."""
    hot = (
        shingle_df
        .groupBy("shingle").agg(F.count("*").alias("sdf"))
        .filter(F.col("sdf") > max_shingle_df)
        .select("shingle").collect()
    )
    return _shingle_u64([r["shingle"] for r in hot])


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 7,
    max_shingle_df: int | None = None,
    banned_hashes: np.ndarray | None = None,
) -> DataFrame:
    """LSH candidate pairs: equal band-slices of the MinHash signature.

    ``(doc_a, doc_b, n_bands_matched)`` with ``doc_a < doc_b``. The
    bucket join shuffles on (band_id, slice-hash) — web-scale friendly.
    ``max_shingle_df`` bans hot shingles from the signatures so they
    estimate the capped Jaccard that :func:`minhash_near_dups` verifies
    (signature and verification over the same shingle universe);
    ``banned_hashes`` passes a precomputed ban list instead.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    banned = banned_hashes
    if banned is None and max_shingle_df is not None:
        banned = _hot_shingle_hashes(
            word_shingles(docs, shingle_n, text_col, id_col), max_shingle_df)
    mh = make_minhash_udf(num_hashes, shingle_n, seed, banned_hashes=banned)
    sigs = docs.select(F.col(id_col).alias("doc_id"),
                       mh(F.col(text_col)).alias("sig"))
    banded = sigs.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bnd: F.struct(
                bnd.alias("band"),
                F.hash(F.concat_ws(
                    ",", F.transform(
                        F.slice("sig", bnd * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string")))).alias("bucket"),
            ))).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    x = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    y = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        x.join(y, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_bands_matched"))
    )


def minhash_near_dups(docs: DataFrame, threshold: float = 0.8,
                      num_hashes: int = 64, bands: int = 16,
                      shingle_n: int = 3, text_col: str = "text",
                      id_col: str = "doc_id",
                      max_shingle_df: int | None = None) -> DataFrame:
    """Candidates → exact-Jaccard verification ≥ threshold.

    The verify phase touches ONLY LSH candidate pairs: each candidate
    pair is joined to its two shingle sets (doc_a's shingles replicated
    per pair, matched against doc_b's on the shingle key), so the work
    is O(Σ |shingles(doc_a)| over candidates) — never the corpus-wide
    all-shared-shingle self-join that LSH exists to avoid.

    ``max_shingle_df`` applies to BOTH the signatures (hot shingles
    banned inside the UDF) and the verification Jaccard — candidate
    generation and verification agree on the metric. The raw shingle
    table is generated ONCE (persisted) and feeds the ban list and the
    capped verification table.
    """
    if max_shingle_df is None:
        cand = minhash_lsh_candidates(docs, num_hashes, bands, shingle_n,
                                      text_col, id_col)
        sh = persist_tracked(word_shingles(docs, shingle_n, text_col, id_col))
    else:
        raw = persist_tracked(word_shingles(docs, shingle_n, text_col, id_col))
        sdf = persist_tracked(
            raw.groupBy("shingle").agg(F.count("*").alias("sdf")))
        banned = _shingle_u64(
            [r["shingle"] for r in
             sdf.filter(F.col("sdf") > max_shingle_df)
             .select("shingle").collect()])
        cand = minhash_lsh_candidates(docs, num_hashes, bands, shingle_n,
                                      text_col, id_col,
                                      banned_hashes=banned)
        sh = persist_tracked(
            raw.join(sdf.filter(F.col("sdf") <= max_shingle_df), "shingle")
            .select("doc_id", "shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("size"))
    shared = (
        cand.select("doc_a", "doc_b")
        .join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
              ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    return (
        cand.join(shared, ["doc_a", "doc_b"])
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("size").alias("size_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("size").alias("size_b")), "doc_b")
        .withColumn("jaccard",
                    F.col("shared")
                    / (F.col("size_a") + F.col("size_b") - F.col("shared")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard", "n_bands_matched")
    )


# ------------------------------------------------------------ SimHash
def make_simhash_udf(shingle_n: int = 2, seed: int = 11):
    """Arrow-vectorized 64-bit SimHash over word shingles."""
    @F.pandas_udf(T.LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            hs = _shingle_hashes_py(t or "", shingle_n)
            if hs.size == 0:
                out.append(0)
                continue
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for j in np.flatnonzero(v > 0):
                sig |= np.uint64(1) << np.uint64(j)
            out.append(np.int64(sig.astype(np.int64)))
        return pd.Series(out, dtype="int64")

    return simhash


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3,
                      shingle_n: int = 2, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs within Hamming distance d via the pigeonhole
    block join: split 64 bits into d+1 blocks — any pair within d must
    agree on ≥1 whole block, so equal-block equi-joins generate all
    candidates without a pairwise scan. ``(doc_a, doc_b, hamming)``."""
    nblocks = max_hamming + 1
    width = 64 // nblocks
    sh = make_simhash_udf(shingle_n)
    sigs = docs.select(F.col(id_col).alias("doc_id"),
                       sh(F.col(text_col)).alias("sig"))
    block_structs = [
        F.struct(
            F.lit(i).alias("block"),
            F.shiftrightunsigned(F.col("sig"), i * width)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("key"))
        for i in range(nblocks)
    ]
    blocks = sigs.select(
        "doc_id", "sig", F.explode(F.array(*block_structs)).alias("bk"),
    ).select("doc_id", "sig", "bk.block", "bk.key")
    x = blocks.select(F.col("doc_id").alias("doc_a"),
                      F.col("sig").alias("sig_a"), "block", "key")
    y = blocks.select(F.col("doc_id").alias("doc_b"),
                      F.col("sig").alias("sig_b"), "block", "key")
    cand = (
        x.join(y, ["block", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(
            F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
