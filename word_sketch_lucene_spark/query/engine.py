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
from .wand import BlockCursor, block_max_wand, exact_daat, idf_py, vectorized_topk


def bm25_topk_df(
    pages: DataFrame,
    terms: list[str],
    k: int = 10,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    round_dp: int | None = None,
) -> DataFrame:
    """Declarative BM25 top-k: ONE tokenize scan, no index needed.

    OR semantics over query terms; tie-break (score desc, doc_id asc).
    Returns ``(doc_id, score)``. ``round_dp`` rounds the score and uses
    the rounded value as the ordering key — the cross-engine-stable
    contract used for oracle comparison (engine FP noise collapses).

    Plan shape: the corpus is tokenized exactly once into a per-doc
    aggregate ``(doc_id, dl, tf_per_query_term)`` (conditional counts —
    map-side combined, one shuffle), persisted, then (a) a 1-row stats
    collect reads N/avgdl/df off it and (b) the final score pass reads
    it again from cache. At 100 TB the cached table is
    n_docs × (2 + |terms|) ints — tiny next to the corpus — and the
    corpus itself is scanned once instead of three times.
    """
    from ..caching import persist_tracked

    # dedupe preserving order; tf/df columns are positional
    seen: set[str] = set()
    terms = [t for t in terms if not (t in seen or seen.add(t))]
    tokens = explode_tokens(pages, doc_id_col, text_col)
    tf_cols = [F.count(F.when(F.col("term") == t, True)).alias(f"tf_{i}")
               for i, t in enumerate(terms)]
    per_doc = persist_tracked(
        tokens.groupBy("doc_id").agg(F.count("*").alias("dl"), *tf_cols))
    stats = per_doc.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(len(terms))],
    ).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"])
    contribs = []
    for i in range(len(terms)):
        df_i = int(stats[f"df_{i}"])
        if df_i == 0:
            continue
        tf = F.col(f"tf_{i}").cast("double")
        contribs.append(F.when(
            F.col(f"tf_{i}") > 0,
            bm25_term_score_expr(tf, F.lit(float(df_i)),
                                 F.col("dl").cast("double"),
                                 n_docs, avgdl, k1, b),
        ).otherwise(F.lit(0.0)))
    if not contribs:
        return per_doc.select(
            "doc_id", F.lit(0.0).alias("score")).limit(0)
    hit_any = None
    for i in range(len(terms)):
        c = F.col(f"tf_{i}") > 0
        hit_any = c if hit_any is None else (hit_any | c)
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    agg = per_doc.filter(hit_any).select("doc_id", score.alias("score"))
    if round_dp is not None:
        agg = agg.withColumn("score", F.round("score", round_dp))
    return agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


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
        # term → list[block-row dict] cache: the analog of the reference
        # preloading collocations.bin for O(1) lookups (CLAUDE.md:190-196).
        # One pruned parquet scan per *miss set*, pure numpy afterwards.
        self._block_cache: dict[str, list[dict]] = {}
        # term → (docs, scores) decoded+merged arrays (bounded, FIFO) —
        # the hot-term working set a serving node would keep pinned.
        self._decoded_cache: dict[str, tuple] = {}
        self.decoded_cache_max = 256

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

    def expand_terms(self, pattern: str, max_terms: int = 256) -> list[str]:
        """P1 regex term expansion via the term dictionary: the
        reference matches ``[lemma=".*self"]`` by regex over the indexed
        layer — here an anchored ``rlike`` over ``term_stats`` (the term
        dictionary), df-descending so the cap keeps the heaviest terms.
        The expansion then feeds :meth:`search` as an OR set — a scan of
        the O(vocab) stats table, never of the postings."""
        rows = (
            self.term_stats.filter(F.col("term").rlike(f"^(?:{pattern})$"))
            .orderBy(F.desc("df"), F.asc("term"))
            .select("term").limit(max_terms).collect()
        )
        return [r["term"] for r in rows]

    def search_regex(self, pattern: str, k: int = 10, mode: str = "auto",
                     max_terms: int = 256):
        """Top-k for a regex term query (OR over dictionary matches)."""
        terms = self.expand_terms(pattern, max_terms)
        if not terms:
            return [], {"decoded_blocks": 0, "total_blocks": 0}
        return self.search(terms, k=k, mode=mode)

    # -- block fetch -------------------------------------------------------
    def prefetch(self, terms: list[str]) -> None:
        """Fetch block rows for all uncached terms in ONE pruned scan."""
        missing = sorted({t for t in terms if t not in self._block_cache})
        if not missing:
            return
        rows = (
            self.segments.filter(F.col("term").isin(missing))
            .select("term", "seg_part", "block_id", "first_doc", "last_doc",
                    "max_tf", "min_dl", "docs_vb", "tfs_vb", "dls_vb")
            .collect()
        )
        for t in missing:
            self._block_cache[t] = []
        for r in rows:
            self._block_cache[r["term"]].append(r.asDict())
        self.term_dfs(missing)

    # -- queries ----------------------------------------------------------
    def _cursors(self, terms: list[str]) -> tuple[list[BlockCursor], dict]:
        self.prefetch(terms)
        dfs = self.term_dfs(terms)
        cursors = []
        n_docs, avgdl = self.stats["n_docs"], self.stats["avgdl"]
        for ti, t in enumerate(terms):
            if dfs[t] == 0:
                continue
            idf = idf_py(dfs[t], n_docs)
            by_part: dict[int, list[dict]] = {}
            for r in self._block_cache[t]:
                by_part.setdefault(r["seg_part"], []).append(r)
            for blocks in by_part.values():
                cursors.append(BlockCursor(blocks, ti, idf, self.k1, self.b, avgdl))
        return cursors, dfs

    def _postings_with_positions(self, term: str) -> dict[int, "object"]:
        """doc_id → ascending positions array, merged across segments.

        A separate pruned scan fetches ``pos_vb`` only here — BM25
        queries never read the positions column (column pruning)."""
        import numpy as np

        from ..functions.codec import decode_positions, vbyte_decode

        rows = (
            self.segments.filter(F.col("term") == term)
            .select("n", "first_doc", "docs_vb", "pos_vb")
            .collect()
        )
        out: dict[int, object] = {}
        for r in rows:
            gaps = vbyte_decode(bytes(r["docs_vb"])).astype(np.int64)
            docs = np.cumsum(gaps) + r["first_doc"]
            pls = decode_positions(bytes(r["pos_vb"]), int(r["n"]))
            for d, pl in zip(docs, pls):
                out[int(d)] = pl
        return out

    def phrase_hits(self, phrase: str | list[str]
                    ) -> list[tuple[int, list[int]]]:
        """Exact-sequence matches from the positional index: the Lucene
        ``SpanNear(slop=0, inOrder=true)`` analog (SURVEY §2.3 J1) run
        doc-at-a-time over decoded position lists.

        Returns ``[(doc_id, [start positions])]`` ordered by doc_id.
        """
        import numpy as np

        terms = tokenize_py(phrase) if isinstance(phrase, str) else list(phrase)
        if not terms:
            return []
        per_term = [self._postings_with_positions(t) for t in terms]
        if any(not p for p in per_term):
            return []
        # docs containing every term, rarest-first intersection
        cand = set(per_term[0])
        for p in per_term[1:]:
            cand &= set(p)
        out = []
        for d in sorted(cand):
            starts = np.asarray(per_term[0][d], dtype=np.int64)
            for i, p in enumerate(per_term[1:], start=1):
                nxt = np.asarray(p[d], dtype=np.int64)
                starts = starts[np.isin(starts + i, nxt)]
                if starts.size == 0:
                    break
            if starts.size:
                out.append((d, starts.tolist()))
        return out

    def pattern_hits(self, pattern: str, max_terms_per_slot: int = 256
                     ) -> list[tuple[int, int, int]]:
        """Index-side mini-BCQL execution — the reference's main query
        path runs CQL against the Lucene index
        (``BlackLabQueryExecutor.java:117-144``); here each token
        constraint expands through the term dictionary (regex → term
        set), its positional postings are fetched via pruned scans and
        UNIONED per slot, and the constraint sequence chains doc-at-a-
        time over numpy position arrays with the ``[]{min,max}`` gap
        windows (the SpanNear generalization of :meth:`phrase_hits`).

        Returns distinct ``[(doc_id, start, end)]`` sorted. Negated
        constraints are not supported index-side (a NOT expands to the
        whole vocabulary) — use the DataFrame path
        (``plans.cql.compile_cql``) for those.
        """
        import numpy as np

        from ..plans.cql import _steps, parse_cql

        steps = _steps(parse_cql(pattern))
        slot_positions: list[dict[int, object]] = []
        for st in steps:
            tests = st.item.tests
            if any(t.negated for t in tests):
                raise NotImplementedError(
                    "negated constraints are DataFrame-path only "
                    "(plans.cql.compile_cql)")
            if any(t.attr not in ("word", "term") for t in tests):
                raise NotImplementedError(
                    "index-side patterns match the indexed term layer; "
                    "other layers are DataFrame-path only")
            # conjunction of regexes → intersection of expansions
            term_sets = []
            for t in tests:
                if t.is_literal:
                    term_sets.append({t.value.replace("\\", "")})
                else:
                    term_sets.append(set(self.expand_terms(
                        t.value, max_terms_per_slot)))
            terms = set.intersection(*term_sets) if term_sets else set()
            merged: dict[int, object] = {}
            for term in sorted(terms):
                for d, pl in self._postings_with_positions(term).items():
                    if d in merged:
                        merged[d] = np.union1d(merged[d], pl)
                    else:
                        merged[d] = np.asarray(pl, dtype=np.int64)
            slot_positions.append(merged)
        if not slot_positions or any(not s for s in slot_positions):
            return []
        cand = set(slot_positions[0])
        for s in slot_positions[1:]:
            cand &= set(s)
        out: list[tuple[int, int, int]] = []
        for d in sorted(cand):
            # partials: rows (start, prev_pos); extend slot by slot
            p0 = np.asarray(slot_positions[0][d], dtype=np.int64)
            starts, prevs = p0.copy(), p0.copy()
            ok = True
            for st, slot in zip(steps[1:], slot_positions[1:]):
                nxt = np.asarray(slot[d], dtype=np.int64)
                new_starts = []
                new_prevs = []
                for s, p in zip(starts, prevs):
                    lo, hi = p + st.lo, p + st.hi
                    sel = nxt[(nxt >= lo) & (nxt <= hi)]
                    if sel.size:
                        new_starts.append(np.full(sel.size, s))
                        new_prevs.append(sel)
                if not new_starts:
                    ok = False
                    break
                starts = np.concatenate(new_starts)
                prevs = np.concatenate(new_prevs)
            if ok:
                spans = {(int(s), int(e)) for s, e in zip(starts, prevs)}
                out.extend((d, s, e) for s, e in sorted(spans))
        return out

    def search(self, query: str | list[str], k: int = 10, mode: str = "auto"
               ) -> tuple[list[tuple[int, float]], dict]:
        """Top-k ``(doc_id, score)`` for a free-text query or term list.

        ``mode``: ``auto`` (vectorized for head-heavy queries, block-max
        WAND when a selective term makes pruning viable), ``bmw``,
        ``wand`` (global-bound), ``vec`` (vectorized exhaustive),
        ``daat`` (per-doc exhaustive — validation baseline).

        All modes are rank- and score-identical; they differ only in
        blocks decoded and constant factors.
        """
        terms = tokenize_py(query) if isinstance(query, str) else list(query)
        # dedupe preserving order (reference queries are unique-term sets)
        seen: set[str] = set()
        terms = [t for t in terms if not (t in seen or seen.add(t))]
        if not terms:
            return [], {"decoded_blocks": 0, "total_blocks": 0}
        self.prefetch(terms)
        dfs = self.term_dfs(terms)
        if all(dfs[t] == 0 for t in terms):
            return [], {"decoded_blocks": 0, "total_blocks": 0}
        if mode == "auto":
            # Pruning pays off when the rarest term is much more selective
            # than the rest (its bound dominates θ quickly). Otherwise the
            # vectorized exhaustive path wins on constant factors.
            live_dfs = [d for d in dfs.values() if d > 0]
            selective = len(live_dfs) > 1 and min(live_dfs) * 20 < max(live_dfs)
            mode = "bmw" if selective else "vec"
        if mode == "vec":
            return self._vec_cached(terms, dfs, k)
        cursors, _ = self._cursors(terms)
        if not cursors:
            return [], {"decoded_blocks": 0, "total_blocks": 0}
        if mode == "daat":
            return exact_daat(cursors, k, len(terms))
        return block_max_wand(cursors, k, len(terms), use_block_max=(mode == "bmw"))

    def _vec_cached(self, terms: list[str], dfs: dict[str, int], k: int
                    ) -> tuple[list[tuple[int, float]], dict]:
        """Vectorized path with a decoded-postings cache for hot terms."""
        import numpy as np

        from .wand import _decode_all, topk_from_arrays

        n_docs, avgdl = self.stats["n_docs"], self.stats["avgdl"]
        term_arrays = []
        decoded = total = 0
        for ti, t in enumerate(terms):
            if dfs[t] == 0:
                continue
            if t in self._decoded_cache:
                docs, scores = self._decoded_cache[t]
                total += int(np.ceil(docs.size / 128)) if docs.size else 0
            else:
                idf = idf_py(dfs[t], n_docs)
                by_part: dict[int, list[dict]] = {}
                for r in self._block_cache[t]:
                    by_part.setdefault(r["seg_part"], []).append(r)
                curs = [BlockCursor(blocks, ti, idf, self.k1, self.b, avgdl)
                        for blocks in by_part.values()]
                parts = [_decode_all(c) for c in curs]
                docs = np.concatenate([d for d, _ in parts]) if parts else np.empty(0, np.int64)
                scores = np.concatenate([s for _, s in parts]) if parts else np.empty(0, np.float64)
                order = np.argsort(docs, kind="stable")
                docs, scores = docs[order], scores[order]
                if len(self._decoded_cache) >= self.decoded_cache_max:
                    self._decoded_cache.pop(next(iter(self._decoded_cache)))
                self._decoded_cache[t] = (docs, scores)
                decoded += sum(c.decoded_blocks for c in curs)
                total += sum(c.nblocks for c in curs)
            term_arrays.append((ti, docs, scores))
        out = topk_from_arrays(term_arrays, k)
        return out, {"decoded_blocks": decoded, "total_blocks": total}
