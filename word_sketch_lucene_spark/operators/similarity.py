"""Similarity search over embedding columns (``array<float>``).

Two paths, same contract (top-k cosine neighbors):

- **brute force** — the exact baseline: broadcast the (small) query
  set against the corpus, dot products via ``F.zip_with`` +
  ``F.aggregate`` (JVM-side, whole-stage codegen — no Python in the
  hot path), per-query top-k via a ranking window.
- **LSH-bucketed (random hyperplanes)** — the scale path: sign-bit
  signatures against a fixed seeded plane set bucket the corpus; a
  probe searches only its bucket (multi-probe: flip one bit at a time
  widens recall). The bucket table is a one-off shuffle; queries are
  a bucket equi-join instead of a full scan.

Embedding-cosine near-dup dedup = ``lsh_near_dup_pairs`` (same
machinery, corpus joined with itself through the bucket key).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.pages import _splitmix64


def _norm_expr(vec):
    return F.sqrt(F.aggregate(vec, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x))


def _dot_expr(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_dp: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``queries``: ``(query_id, embedding)`` (small — broadcast).
    Returns ``(query_id, vec_id, cosine, rank)``; self-matches are the
    caller's concern. Tie-break (cosine desc, vec_id asc).
    """
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        _norm_expr(F.col(vec_col)).alias("cnorm"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm_expr(F.col(vec_col)).alias("qnorm"),
    )
    scored = corpus.crossJoin(F.broadcast(q)).withColumn(
        "cosine",
        _dot_expr(F.col("cvec"), F.col("qvec"))
        / (F.col("cnorm") * F.col("qnorm")),
    )
    if round_dp is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_dp))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-Gaussian hyperplanes from splitmix64."""
    idx = np.arange(dim * n_planes, dtype=np.uint64)
    scale = np.float64(2.0**64)
    u1 = _splitmix64((np.uint64(seed) << np.uint64(32)) ^ idx).astype(np.float64) / scale
    u2 = _splitmix64((np.uint64(seed + 1) << np.uint64(32)) ^ idx).astype(np.float64) / scale
    g = np.sqrt(-2.0 * np.log(np.maximum(u1, 1e-12))) * np.cos(2 * np.pi * u2)
    return g.reshape(n_planes, dim)


def lsh_bucket_expr(vec, planes: np.ndarray):
    """Signature bits → one long bucket id, computed JVM-side: the
    plane matrix is folded into the plan as array literals."""
    bits = []
    for i, row in enumerate(planes):
        arr = F.array(*[F.lit(float(v)) for v in row])
        dot = _dot_expr(vec, arr)
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    multiprobe: bool = True,
    round_dp: int | None = None,
) -> DataFrame:
    """Approximate top-k: search only the query's LSH bucket (plus the
    1-bit-flip neighbor buckets when ``multiprobe``).

    Same output shape as :func:`cosine_topk`; recall measured in tests.
    ``round_dp`` rounds the cosine BEFORE ranking (the cross-engine
    ordering contract — planes, buckets, and probes are deterministic,
    so the whole approximate result is oracle-checkable).
    """
    dim = len(embeddings.select(vec_col).first()[0])
    planes = _planes(dim, n_planes, seed)
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        _norm_expr(F.col(vec_col)).alias("cnorm"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )
    q0 = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm_expr(F.col(vec_col)).alias("qnorm"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("qbucket"),
    )
    if multiprobe:
        probes = F.array(*([F.col("qbucket")] +
                           [F.col("qbucket").bitwiseXOR(F.lit(1 << i))
                            for i in range(n_planes)]))
        q = q0.select("query_id", "qvec", "qnorm",
                      F.explode(probes).alias("bucket"))
    else:
        q = q0.withColumnRenamed("qbucket", "bucket")
    scored = corpus.join(F.broadcast(q), "bucket").withColumn(
        "cosine",
        _dot_expr(F.col("cvec"), F.col("qvec"))
        / (F.col("cnorm") * F.col("qnorm")),
    )
    if round_dp is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_dp))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.select("query_id", "vec_id", "cosine").distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = None,
) -> DataFrame:
    """EXACT embedding-cosine near-dup pairs (the brute baseline the
    LSH/IVF tiers approximate): all ``vec_a < vec_b`` pairs with cosine
    ≥ threshold. O(n²·d) by definition — the correctness tier for a
    BOUNDED corpus slice; :func:`lsh_near_dup_pairs` is the scale path.

    Kernel: ``mapInPandas`` over corpus partitions with the (bounded)
    full matrix as a broadcast variable; the dot product accumulates
    DIMENSION-SEQUENTIALLY (a vectorized left fold: ``acc += A[:,d] *
    B[:,d]``) so every sum has the same FP order as the SQL engines'
    element folds — cross-engine 4-dp parity is preserved while the
    pair math runs ~50× faster than interpreted array lambdas.
    Rounding stays Spark-side (the exact function the oracle contract
    already matches); the kernel pre-filters with a half-ulp-of-4dp
    margin so no boundary pair is lost.
    """
    import pandas as pd

    sc = embeddings.sparkSession.sparkContext
    rows = (embeddings.select(F.col(id_col).alias("i"),
                              F.col(vec_col).alias("v"))
            .orderBy("i").collect())
    ids = np.array([r["i"] for r in rows], dtype=np.int64)
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    dim = mat.shape[1] if mat.size else 0
    norms = np.zeros(len(ids))
    for d in range(dim):  # sequential fold, same FP order as the engines
        norms += mat[:, d] * mat[:, d]
    norms = np.sqrt(norms)
    b_ids = sc.broadcast(ids)
    b_mat = sc.broadcast(mat)
    b_norms = sc.broadcast(norms)
    # NB: round_dp=0 is a real setting (integer rounding) — `or` would
    # treat it as unset and pre-filter at ~threshold, dropping boundary
    # pairs whose cosine rounds UP to the threshold
    eff_dp = 12 if round_dp is None else round_dp
    margin = threshold - (0.5 * 10.0 ** -eff_dp) - 1e-12

    def kernel(batches):
        B, Bn, Bi = b_mat.value, b_norms.value, b_ids.value
        CHUNK = 256  # bounds the (chunk × n) accumulator to a few MB
        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            n_rows = len(pdf)
            for c0 in range(0, n_rows, CHUNK):
                sub = pdf.iloc[c0:c0 + CHUNK]
                A = np.array(list(sub["v"]), dtype=np.float64)
                ia = sub["i"].to_numpy(dtype=np.int64)
                an = np.zeros(len(A))
                acc = np.zeros((len(A), len(Bi)))
                for d in range(dim):  # dim-sequential: engine FP order
                    an += A[:, d] * A[:, d]
                    acc += A[:, d, None] * B[None, :, d]
                cos = acc / (np.sqrt(an)[:, None] * Bn[None, :])
                keep = (cos >= margin) & (Bi[None, :] > ia[:, None])
                r, c = np.nonzero(keep)
                out_a.extend(ia[r].tolist())
                out_b.extend(Bi[c].tolist())
                out_c.extend(cos[r, c].tolist())
            yield pd.DataFrame({"vec_a": pd.Series(out_a, dtype="int64"),
                                "vec_b": pd.Series(out_b, dtype="int64"),
                                "cosine": pd.Series(out_c, dtype="float64")})

    out = (embeddings.select(F.col(id_col).alias("i"),
                             F.col(vec_col).alias("v"))
           .mapInPandas(kernel, "vec_a long, vec_b long, cosine double"))
    if round_dp is not None:
        out = out.withColumn("cosine", F.round("cosine", round_dp))
    return (out.filter(F.col("cosine") >= threshold)
            .select("vec_a", "vec_b", "cosine"))


def ivf_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_dp: int | None = None,
) -> DataFrame:
    """IVF-style ANN: corpus partitioned into inverted cells, queries
    probe the closest ``n_probe`` cells only.

    Deterministic (hence oracle-checkable) centroid choice: the
    embeddings of the ``n_centroids`` smallest ids serve as fixed cell
    centers (a real deployment plugs k-means centers in — the
    cell-assignment/probe plumbing is identical). Assignment and probe
    ranking use the 4-dp-rounded cosine with centroid-id tie-break so
    both engines agree on cell boundaries. At 10⁹+ vectors the cell
    table is the shuffle key and each query touches n_probe/n_centroids
    of the corpus.
    """
    cents = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec_c"),
        _norm_expr(F.col(vec_col)).alias("cnorm_c"))

    def assign(side: DataFrame, idc: str, vecc: str, keep: int) -> DataFrame:
        scored = side.crossJoin(F.broadcast(cents)).withColumn(
            "cscore", F.round(
                _dot_expr(F.col(vecc), F.col("cvec_c"))
                / (_norm_expr(F.col(vecc)) * F.col("cnorm_c")), 4))
        w = Window.partitionBy(idc).orderBy(F.desc("cscore"), F.asc("cid"))
        return (scored.withColumn("crank", F.row_number().over(w))
                .filter(F.col("crank") <= keep)
                .select(idc, vecc, F.col("cid").alias("cell")))

    cells = assign(
        embeddings.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("cvec")),
        "vec_id", "cvec", keep=1)
    probes = assign(
        queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec")),
        "query_id", "qvec", keep=n_probe)
    scored = cells.join(F.broadcast(probes), "cell").withColumn(
        "cosine",
        _dot_expr(F.col("cvec"), F.col("qvec"))
        / (_norm_expr(F.col("cvec")) * _norm_expr(F.col("qvec"))))
    if round_dp is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_dp))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "cosine", "rank"))


def lsh_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 10,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs: bucket self-join → exact cosine
    ≥ threshold. ``(vec_a, vec_b, cosine)``, ``vec_a < vec_b``."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = _planes(dim, n_planes, seed)
    tagged = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        _norm_expr(F.col(vec_col)).alias("nrm"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )
    a = tagged.select(F.col("vid").alias("vec_a"), F.col("vec").alias("va"),
                      F.col("nrm").alias("na"), "bucket")
    b = tagged.select(F.col("vid").alias("vec_b"), F.col("vec").alias("vb"),
                      F.col("nrm").alias("nb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", _dot_expr(F.col("va"), F.col("vb"))
                    / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
        .distinct()
    )
