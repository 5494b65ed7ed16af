"""Query engines over the built index.

Two execution paths, mirroring the reference's two query styles:

1. :func:`bm25_topk_df` — declarative DataFrame plan straight off the
   corpus (tokenize → stats → score → ``orderBy().limit(k)``). Catalyst
   fuses the top-k into ``TakeOrderedAndProject`` (the bounded min-heap
   of the north rule, running map-side partial top-k per partition).
   This is the batch/oracle-checkable path.

2. :class:`IndexSearcher` — the low-latency point-query path over
   compressed segments (the analog of the reference's in-process
   Lucene search, ``BlackLabQueryExecutor.java:117-144``): a pruned
   parquet scan fetches only the query terms' blocks (predicate
   pushdown on ``term`` + parquet row-group min/max = the term
   dictionary seek), then the block-max WAND kernel runs them.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scoring import B, K1, bm25_term_score_expr
from ..functions.tokenize import doc_lengths, explode_tokens, tokenize_py
from ..index.build import STATS_FILE
from .wand import BlockCursor, block_max_wand, exact_daat, idf_py


def bm25_topk_df(
    pages: DataFrame,
    terms: list[str],
    k: int = 10,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Declarative BM25 top-k: one plan, no index needed.

    OR semantics over query terms; tie-break (score desc, doc_id asc).
    Returns ``(doc_id, score)``.
    """
    tokens = explode_tokens(pages, doc_id_col, text_col)
    dl = doc_lengths(tokens)
    cs = dl.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(cs["n"]), float(cs["avgdl"])
    # df per query term, computed on the full corpus then broadcast
    tstats = (
        tokens.filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    hits = (
        tokens.filter(F.col("term").isin(terms))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
        .join(F.broadcast(tstats), "term")
        .join(dl, "doc_id")
    )
    scored = hits.withColumn(
        "contrib",
        bm25_term_score_expr(F.col("tf").cast("double"), F.col("df").cast("double"),
                             F.col("dl").cast("double"), n_docs, avgdl, k1, b),
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


class IndexSearcher:
    """Opens a built index directory; serves point top-k queries.

    The segment scan collects only the query terms' block rows to the
    driver — the moral equivalent of a Lucene query node reading a few
    posting lists, not a driver-side table scan. On a cluster the same
    ``filter(term ∈ Q)`` scan prunes row groups via parquet statistics.
    """

    def __init__(self, spark: SparkSession, root: str | Path):
        self.spark = spark
        self.root = Path(root)
        self.stats = json.loads((self.root / STATS_FILE).read_text())
        self.k1 = self.stats.get("k1", K1)
        self.b = self.stats.get("b", B)
        self.segments = spark.read.parquet(str(self.root / "segments"))
        self.term_stats = spark.read.parquet(str(self.root / "term_stats"))
        self._df_cache: dict[str, int] = {}

    # -- stats lookups ---------------------------------------------------
    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            rows = (
                self.term_stats.filter(F.col("term").isin(missing))
                .select("term", "df").collect()
            )
            found = {r["term"]: int(r["df"]) for r in rows}
            for t in missing:
                self._df_cache[t] = found.get(t, 0)
        return {t: self._df_cache[t] for t in terms}

    # -- queries ----------------------------------------------------------
    def _cursors(self, terms: list[str]) -> tuple[list[BlockCursor], dict]:
        dfs = self.term_dfs(terms)
        rows = (
            self.segments.filter(F.col("term").isin(terms))
            .select("term", "seg_part", "block_id", "first_doc", "last_doc",
                    "max_score", "docs_vb", "tfs_vb", "dls_vb")
            .collect()
        )
        by_list: dict[tuple[str, int], list[dict]] = {}
        for r in rows:
            by_list.setdefault((r["term"], r["seg_part"]), []).append(r.asDict())
        cursors = []
        n_docs, avgdl = self.stats["n_docs"], self.stats["avgdl"]
        for ti, t in enumerate(terms):
            if dfs[t] == 0:
                continue
            idf = idf_py(dfs[t], n_docs)
            for (term, _part), blocks in by_list.items():
                if term == t:
                    cursors.append(BlockCursor(blocks, ti, idf, self.k1, self.b, avgdl))
        return cursors, dfs

    def search(self, query: str | list[str], k: int = 10, mode: str = "bmw"
               ) -> tuple[list[tuple[int, float]], dict]:
        """Top-k ``(doc_id, score)`` for a free-text query or term list.

        ``mode``: ``bmw`` (block-max WAND), ``wand`` (global-bound WAND),
        ``daat`` (exhaustive union — validation baseline).
        """
        terms = tokenize_py(query) if isinstance(query, str) else list(query)
        # dedupe preserving order (reference queries are unique-term sets)
        seen: set[str] = set()
        terms = [t for t in terms if not (t in seen or seen.add(t))]
        if not terms:
            return [], {"decoded_blocks": 0, "total_blocks": 0}
        cursors, _ = self._cursors(terms)
        if not cursors:
            return [], {"decoded_blocks": 0, "total_blocks": 0}
        if mode == "daat":
            return exact_daat(cursors, k, len(terms))
        return block_max_wand(cursors, k, len(terms), use_block_max=(mode == "bmw"))
