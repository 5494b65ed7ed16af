"""Semantic-field exploration: multi-seed intersections + profiles.

Reference parity (SURVEY §2.4 A7-A11, §2.6 SO1-SO2, §2.10 V5-V7):
- SO1/A8 shared-count intersection: collocate → #seeds containing it,
  keep ≥ min_shared (``MultiSeedExplorer.java:80-107``)
- A7 cross-seed accumulators: per-collocate max/sum/avg of logDice
  (``MultiSeedExplorer.java:158-200``)
- A9 profile statistics: presentIn, avg, max, min, variance,
  ``commonality = presentIn·avg``, ``distinctiveness =
  max·(1-presentIn/n)+sqrt(var)`` (``CollocateProfileComparator.java:103-151``)
- A10 core collocates: shared by ≥ max(2, ceil(n/3)) discovered nouns,
  ranked (sharedBy desc, avgLogDice desc) (``SingleSeedExplorer.java:177-206``)
- A11 derived noun scores: sum/avg of shared collocate scores
  (``SingleSeedExplorer.java:155-170``)
- V5 single-seed 4-phase exploration (``SingleSeedExplorer.java:63-107``)

All are one generalized shape: build the per-seed collocate table once
(seeds unioned with a ``seed`` literal column — ONE Spark job instead
of the reference's per-seed sequential queries), then groupBy collocate
with the aggregate set of the op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .collocation import collocates_for_head


def seed_collocates(
    tokens: DataFrame,
    term_stats: DataFrame,
    seeds: list[str],
    min_logdice: float = 0.0,
    limit_per_seed: int = 50,
    **window_kw,
) -> DataFrame:
    """Per-seed ranked collocates, unioned: ``(seed, colloc_term,
    pair_freq, logdice, rel_freq)`` (SO2 union of per-seed maps)."""
    parts = []
    for s in seeds:
        parts.append(
            collocates_for_head(tokens, term_stats, s,
                                min_logdice=min_logdice,
                                limit=limit_per_seed, **window_kw)
            .withColumn("seed", F.lit(s)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("seed", "colloc_term", "pair_freq", "logdice", "rel_freq")


def common_collocates(per_seed: DataFrame, min_shared: int = 2,
                      round_dp: int | None = None) -> DataFrame:
    """SO1/A8 + A7: collocates present in ≥ min_shared seeds, with the
    cross-seed accumulators. ``(colloc_term, shared_by, total_freq,
    max_logdice, avg_logdice, sum_logdice)``.

    With ``round_dp`` set, the input logdice values (already rounded to
    that dp) are scaled to integers before aggregation: sums are then
    exact and order-independent, and the average is a half-up scaled
    integer division — so the result is bit-identical across engines
    (summing rounded doubles in shuffle order can flip the last dp).
    """
    if round_dp is None:
        return per_seed.groupBy("colloc_term").agg(
            F.countDistinct("seed").alias("shared_by"),
            F.sum("pair_freq").alias("total_freq"),
            F.max("logdice").alias("max_logdice"),
            F.avg("logdice").alias("avg_logdice"),
            F.sum("logdice").alias("sum_logdice"),
        ).filter(F.col("shared_by") >= min_shared)
    scale = 10 ** round_dp
    agg = (
        per_seed
        .withColumn("ld_i", F.round(F.col("logdice") * scale).cast("long"))
        .groupBy("colloc_term").agg(
            F.countDistinct("seed").alias("shared_by"),
            F.sum("pair_freq").alias("total_freq"),
            F.max("ld_i").alias("max_i"),
            F.sum("ld_i").alias("sum_i"),
            F.count("*").alias("n_i"),
        )
        .filter(F.col("shared_by") >= min_shared)
    )
    return agg.select(
        "colloc_term", "shared_by", "total_freq",
        (F.col("max_i") / F.lit(float(scale))).alias("max_logdice"),
        (F.expr(f"(sum_i * 2 + n_i) div (2 * n_i)") / F.lit(float(scale))
         ).alias("avg_logdice"),
        (F.col("sum_i") / F.lit(float(scale))).alias("sum_logdice"),
    )


def profile_stats(per_seed: DataFrame, n_seeds: int,
                  round_dp: int | None = None) -> DataFrame:
    """A9 single-pass profile statistics with the reference's derived
    scores (``CollocateProfileComparator.java:103-151``).

    With ``round_dp`` set, avg and variance come from EXACT integer
    sums of the scaled logdice values with half-up integer division —
    ``avg()``/``var_pop()`` over doubles are shuffle-order-dependent in
    the last ulp, and a .00005-boundary round then disagrees across
    engines (the multiseed_common lesson). Derived scores use the
    already-exact rounded inputs, so both engines compute identical
    doubles before the final round.
    """
    if round_dp is None:
        agg = per_seed.groupBy("colloc_term").agg(
            F.countDistinct("seed").alias("present_in"),
            F.avg("logdice").alias("avg_logdice"),
            F.max("logdice").alias("max_logdice"),
            F.min("logdice").alias("min_logdice"),
            F.var_pop("logdice").alias("var_logdice"),
        )
        return (
            agg.withColumn("commonality",
                           F.col("present_in") * F.col("avg_logdice"))
            .withColumn("distinctiveness",
                        F.col("max_logdice")
                        * (F.lit(1.0)
                           - F.col("present_in") / F.lit(float(n_seeds)))
                        + F.sqrt(F.col("var_logdice")))
        )
    scale = 10 ** round_dp
    agg = (
        per_seed
        .withColumn("ld_i", F.round(F.col("logdice") * scale).cast("long"))
        .groupBy("colloc_term").agg(
            F.countDistinct("seed").alias("present_in"),
            F.sum("ld_i").alias("sum_i"),
            F.sum(F.col("ld_i") * F.col("ld_i")).alias("sum_sq_i"),
            F.count("*").alias("n_i"),
            F.max("ld_i").alias("max_i"),
            F.min("ld_i").alias("min_i"),
        )
    )
    # avg at 4 dp via half-up integer division; population variance at
    # 4 dp via vr = n·Σx² − (Σx)² (exact integer), half-up division by
    # n²·scale — all integer until one exact-decimal float at the end
    avg = F.expr("(sum_i * 2 + n_i) div (2 * n_i)") / F.lit(float(scale))
    var = (F.expr(f"(2 * (sum_sq_i * n_i - sum_i * sum_i) "
                  f"+ n_i * n_i * {scale}) div (2 * n_i * n_i * {scale})")
           / F.lit(float(scale)))
    out = agg.select(
        "colloc_term", "present_in",
        avg.alias("avg_logdice"),
        (F.col("max_i") / F.lit(float(scale))).alias("max_logdice"),
        (F.col("min_i") / F.lit(float(scale))).alias("min_logdice"),
        var.alias("var_logdice"),
    )
    return (
        out.withColumn("commonality",
                       F.round(F.col("present_in") * F.col("avg_logdice"),
                               round_dp))
        .withColumn("distinctiveness",
                    F.round(F.col("max_logdice")
                            * (F.lit(1.0)
                               - F.col("present_in") / F.lit(float(n_seeds)))
                            + F.sqrt(F.col("var_logdice")), round_dp))
    )


def core_collocates(per_noun: DataFrame, n_nouns: int,
                    round_dp: int | None = None) -> DataFrame:
    """A10: collocates shared by ≥ max(2, ceil(n/3)) nouns, ranked by
    (shared_by desc, avg_logdice desc) (``SingleSeedExplorer.java:177-206``)."""
    threshold = max(2, -(-n_nouns // 3))
    if round_dp is None:
        out = (
            per_noun.groupBy("colloc_term").agg(
                F.countDistinct("seed").alias("shared_by"),
                F.avg("logdice").alias("avg_logdice"),
            )
            .filter(F.col("shared_by") >= threshold)
        )
        return out.orderBy(F.desc("shared_by"), F.desc("avg_logdice"),
                           F.asc("colloc_term"))
    # engine-stable averaging (see common_collocates): scaled integers,
    # half-up integer division
    scale = 10 ** round_dp
    out = (
        per_noun
        .withColumn("ld_i", F.round(F.col("logdice") * scale).cast("long"))
        .groupBy("colloc_term").agg(
            F.countDistinct("seed").alias("shared_by"),
            F.sum("ld_i").alias("sum_i"),
            F.count("*").alias("n_i"),
        )
        .filter(F.col("shared_by") >= threshold)
        .select("colloc_term", "shared_by",
                (F.expr("(sum_i * 2 + n_i) div (2 * n_i)")
                 / F.lit(float(scale))).alias("avg_logdice"))
    )
    return out.orderBy(F.desc("shared_by"), F.desc("avg_logdice"),
                       F.asc("colloc_term"))


def derive_noun_scores(per_noun_shared: DataFrame, min_shared: int = 2,
                       round_dp: int | None = None) -> DataFrame:
    """A11 reverse expansion: score candidate nouns by their shared
    collocates (``SingleSeedExplorer.java:155-170``). Input rows:
    ``(seed, colloc_term, logdice)`` restricted to shared collocates."""
    out = (
        per_noun_shared.groupBy("seed").agg(
            F.sum("logdice").alias("sum_score"),
            F.count("*").alias("shared_count"),
            F.avg("logdice").alias("avg_score"),
        )
        .filter(F.col("shared_count") >= min_shared)
        .withColumnRenamed("seed", "noun")
    )
    if round_dp is not None:
        out = out.withColumn("sum_score", F.round("sum_score", round_dp)) \
                 .withColumn("avg_score", F.round("avg_score", round_dp))
    return out.orderBy(F.desc("sum_score"), F.asc("noun"))


def explore_single_seed(
    tokens: DataFrame,
    term_stats: DataFrame,
    seed: str,
    top: int = 10,
    min_logdice: float = 0.0,
    min_shared: int = 2,
    nouns_per_collocate: int = 30,
    **window_kw,
) -> dict[str, DataFrame]:
    """V5 4-phase single-seed exploration (defaults mirror
    ``ExplorationHandlers.java:275-280``): (1) seed's top collocates,
    (2) discover nouns sharing those collocates, (3) core collocates,
    (4) ranked discovered nouns."""
    seed_top = collocates_for_head(
        tokens, term_stats, seed, min_logdice=min_logdice,
        limit=top, **window_kw)
    shared = seed_top.select(F.col("colloc_term"))
    # phase 2: nouns co-occurring with the seed's collocates (reverse join)
    from .proximity import window_pairs
    pairs = window_pairs(tokens, **{k: window_kw[k] for k in
                                    ("min_gap", "max_gap", "ordered")
                                    if k in window_kw})
    cand = (
        pairs.join(F.broadcast(shared),
                   pairs["colloc_term"] == shared["colloc_term"], "left_semi")
        .filter(F.col("head_term") != seed)
        .groupBy(F.col("head_term").alias("seed"),
                 F.col("colloc_term"))
        .agg(F.count("*").alias("pair_freq"))
    )
    # term_stats joins unhinted (full-vocab table; AQE broadcasts the
    # candidate side when small — see operators/collocation.py)
    per_noun = cand.join(
        term_stats.select(F.col("term").alias("seed"),
                          F.col("cf").alias("head_cf")), "seed"
    ).join(
        term_stats.select(F.col("term").alias("colloc_term"),
                          F.col("cf").alias("colloc_cf")),
        "colloc_term",
    ).withColumn("logdice", F.greatest(F.lit(0.0), F.log2(
        2.0 * F.col("pair_freq") / (F.col("head_cf") + F.col("colloc_cf"))
    ) + 14.0))
    nouns = derive_noun_scores(per_noun, min_shared=min_shared) \
        .limit(nouns_per_collocate)
    core = core_collocates(
        per_noun.join(F.broadcast(nouns.select(F.col("noun").alias("seed"))),
                      "seed", "left_semi"),
        n_nouns=nouns_per_collocate)
    return {"seed_collocates": seed_top, "discovered_nouns": nouns,
            "core_collocates": core}
