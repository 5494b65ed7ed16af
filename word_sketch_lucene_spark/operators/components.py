"""Distributed connected components — near-duplicate CLUSTERING.

Pair generators (MinHash/LSH, SimHash, n-gram Jaccard, embedding
cosine — ``operators/dedup.py``, ``operators/similarity.py``) emit
*edges*; a production dedup pipeline must then pick ONE keeper per
duplicate *cluster*, i.e. per connected component of the pair graph
(A~B and B~C must collapse to one document even when A~C was never a
candidate pair). The reference engine stops at pair level (its
integrity diagnostics compare per-headword snapshots,
``/root/reference/scripts/diagnostics/integrity_snapshot.ps1``); this
is the Spark-native completion of that pipeline stage.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) — each
round is one groupBy + one join over the edge list, converges in
O(log² n) rounds with no assumption on component diameter, so a
pathological 10⁹-node chain still terminates in ~60 rounds where naive
min-label propagation would need 10⁹. Every round the edge list is
``localCheckpoint``-ed: iterative plans otherwise accumulate lineage
until Catalyst analysis itself becomes the bottleneck. Driver traffic
per round is ONE 2-number aggregate (count + xor-of-hashes for the
convergence test) — the edge list never leaves the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_edges(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Distinct undirected edges in parent-pointer form (a > b)."""
    a, b = F.col(a_col).cast("long"), F.col(b_col).cast("long")
    return (pairs
            .select(F.greatest(a, b).alias("a"), F.least(a, b).alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct())


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to u's minimum
    neighborhood label m(u) = min(Γ(u) ∪ {u})."""
    nbrs = edges.union(edges.select(F.col("b").alias("a"),
                                    F.col("a").alias("b")))
    mins = (nbrs.groupBy("a")
            .agg(F.min("b").alias("mn"))
            .select("a", F.least("a", "mn").alias("m")))
    return (nbrs.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's ≤-neighborhood (parent-pointer edges a > b),
    connect every member to the minimum."""
    mins = edges.groupBy("a").agg(F.min("b").alias("m"))
    via = (edges.join(mins, "a")
           .filter(F.col("b") != F.col("m"))
           .select(F.col("b").alias("a"), F.col("m").alias("b")))
    return (via.union(mins.select("a", F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct())


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    """(n_edges, order-independent xor digest) — the convergence test.
    One tiny aggregate per round; never collects the edge list."""
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            # bit_xor is commutative → partition-order independent
            F.expr("bit_xor(xxhash64(a, b))"), F.lit(0)).alias("sig"),
    ).collect()[0]
    return int(row["n"]), int(row["sig"])


def connected_components(pairs: DataFrame, a_col: str = "doc_a",
                         b_col: str = "doc_b",
                         max_iter: int = 50) -> DataFrame:
    """``(a_col, b_col)`` undirected edges → ``(doc_id, cluster_id)``.

    ``cluster_id`` is the MINIMUM node id of the component — a
    deterministic canonical label, so results are reproducible across
    partitionings and the DuckDB transitive-closure oracle agrees
    exactly. Only nodes that appear in at least one edge are returned
    (singletons are the caller's complement set — at dedup scale the
    overwhelming majority of docs, which must never be materialized
    through the graph machinery).

    Raises ``RuntimeError`` if ``max_iter`` alternating rounds do not
    converge (the algorithm's bound is O(log² n): 50 rounds covers any
    physically storable graph; non-convergence means corrupted input,
    e.g. NaN ids).
    """
    # lazy checkpoints: the fingerprint aggregate is the round's ONLY
    # action and materializes the checkpoint as it runs — eager=True
    # cost a second job per round for the same bytes
    edges = _canon_edges(pairs, a_col, b_col).localCheckpoint(eager=False)
    prev = _fingerprint(edges)
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)) \
            .localCheckpoint(eager=False)
        cur = _fingerprint(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    # terminal star graphs: every edge is (node → component-min); the
    # centers themselves appear only on the b side
    members = edges.select(F.col("a").alias("doc_id"),
                           F.col("b").alias("cluster_id"))
    centers = edges.select(F.col("b").alias("doc_id"),
                           F.col("b").alias("cluster_id")).distinct()
    return members.union(centers).distinct()


def near_dup_clusters(pairs: DataFrame, a_col: str = "doc_a",
                      b_col: str = "doc_b",
                      max_iter: int = 50) -> DataFrame:
    """Near-dup pairs → per-doc cluster assignment with the dedup
    decision: ``(doc_id, cluster_id, cluster_size, keep)``.

    ``keep`` marks the canonical member (min doc_id) of each cluster —
    the row a training-data pipeline retains; every other member is
    dropped. The size join aggregates the (already tiny relative to
    the corpus) label table and broadcasts per AQE; no corpus-scale
    shuffle is introduced beyond the component rounds themselves.
    """
    labels = connected_components(pairs, a_col, b_col, max_iter)
    sizes = labels.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"))
    return (labels.join(sizes, "cluster_id")
            .select("doc_id", "cluster_id", "cluster_size",
                    (F.col("doc_id") == F.col("cluster_id")).alias("keep")))
