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


def bounded_rows_df(spark: SparkSession, rows, schema: str,
                    columns: list[str]) -> DataFrame:
    """A BOUNDED driver-side row list as a DataFrame, shipped through
    ONE Arrow batch (guide: Arrow for driver transfers) — the plain
    ``createDataFrame(list)`` path pickles row-at-a-time and costs
    ~3× as much wall even at a few thousand rows. Only for lists the
    caller has already bounded (top-k results, span lists under the
    Σcf budget); never a corpus-sized transfer."""
    import pandas as pd

    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=columns), schema=schema)


def bm25_topk_df(
    pages: DataFrame,
    terms: list[str],
    k: int = 10,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    round_dp: int | None = None,
    doc_filter: Column | str | None = None,
) -> DataFrame:
    """Declarative BM25 top-k: ONE tokenize scan, no index needed.

    ``doc_filter`` (a Column or SQL predicate over ``pages``'s metadata
    columns, e.g. ``"lang = 'en'"``) restricts the CANDIDATE set via a
    semi-join on a column-pruned metadata scan; collection statistics
    (N, avgdl, df) stay corpus-level — Lucene filter-query semantics
    (the filter narrows results, it does not re-weight them).

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
    if doc_filter is not None:
        pred = (F.expr(doc_filter) if isinstance(doc_filter, str)
                else doc_filter)
        allowed = pages.filter(pred).select(
            F.col(doc_id_col).alias("doc_id"))
        agg = agg.join(allowed, "doc_id", "left_semi")
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
        # dataset handles resolve LAZILY (cached property below): each
        # spark.read.parquet is a ~100 ms schema/footer round-trip, and
        # most queries touch only a subset of the four datasets
        self._datasets: dict[str, DataFrame | None] = {}
        self._df_cache: dict[str, int] = {}
        self._dl_cache: dict[int, int] = {}
        # (layer, term) → {doc: positions} decoded positional postings —
        # the hot working set an interactive serving node keeps pinned.
        # Bounded by BYTES as well as entry count: one class-wide layer
        # entry (xpos:NN ≈ every noun position in the corpus) can weigh
        # as much as hundreds of word entries, so an entry-count cap
        # alone scales resident memory linearly with corpus size.
        self._positions_cache: dict[tuple[str, str], dict] = {}
        self.positions_cache_max = 512
        self._expand_cache: dict[tuple[str, str, int], list[str]] = {}
        self._forward_cache: dict[str, dict[int, list]] = {}
        self._cf_cache: dict[str, dict[str, int]] = {}
        self._meta_filter_cache: dict[str, object] = {}
        # merged per-TEST position maps: a sketch fan-out repeats the
        # same constraints ([xpos="NN.*"] appears in ~15 relations) —
        # re-merging a corpus-wide layer posting map per relation is
        # the dominant warm-serving cost
        self._test_map_cache: dict[tuple, dict] = {}
        self.test_map_cache_max = 64
        # fully-resolved SLOT maps (all tests intersected/subtracted):
        # multi-test slots repeat across a fan-out too, and the per-doc
        # intersection pass was the dominant WARM-serve cost (FIFO,
        # entry-capped; entries are derived from — and smaller than —
        # the byte-budgeted test maps above)
        self._slot_map_cache: dict[tuple, tuple] = {}
        self.slot_map_cache_max = 256
        # shared byte budget for the two position-map caches (the only
        # corpus-proportional driver state); exceeding it evicts FIFO —
        # a serving node's pinned-hot-set contract, not an OOM vector
        self.position_cache_budget_bytes = 1 << 30
        self._position_cache_bytes: dict[tuple, int] = {}
        # term → list[block-row dict] cache: the analog of the reference
        # preloading collocations.bin for O(1) lookups (CLAUDE.md:190-196).
        # One pruned parquet scan per *miss set*, pure numpy afterwards.
        self._block_cache: dict[str, list[dict]] = {}
        # term → (docs, scores) decoded+merged arrays (bounded, FIFO) —
        # the hot-term working set a serving node would keep pinned.
        self._decoded_cache: dict[str, tuple] = {}
        self.decoded_cache_max = 256
        # (layer, test-value, literal?) → (Σcf, n_dict_values): the
        # router's pricing memo — a few ints per distinct test, filled
        # by batched conditional aggregates (_price_tests)
        self._cost_cache: dict[tuple, tuple[int, int]] = {}

    def _dataset(self, name: str, required: bool = True
                 ) -> DataFrame | None:
        if name not in self._datasets:
            p = self.root / name
            self._datasets[name] = (
                self.spark.read.parquet(str(p))
                if required or p.exists() else None)
        return self._datasets[name]

    @property
    def segments(self) -> DataFrame:
        return self._dataset("segments")

    @property
    def term_stats(self) -> DataFrame:
        return self._dataset("term_stats")

    @property
    def layers(self) -> DataFrame | None:
        return self._dataset("layers", required=False)

    @property
    def layer_stats(self) -> DataFrame | None:
        return self._dataset("layer_stats", required=False)

    def _budget_insert(self, cache: dict, tag: str, key, value,
                       max_entries: int) -> None:
        """Insert a doc→positions map into one of the two position
        caches, charging its bytes against the SHARED budget. Eviction
        is scoped to the pressure source: over the per-cache ENTRY cap,
        only the inserting cache's oldest entries go (one cache's
        churn must not flush the other's hot set — a warm-latency
        hazard, not correctness); over the shared BYTE budget, FIFO
        across both caches (memory pressure is global). The
        just-inserted entry is never evicted — a single over-budget
        working map must still serve the current query."""
        nb = 64
        for arr in value.values():
            nb += int(getattr(arr, "nbytes", 8 * len(arr))) + 64
        bk = (tag, key)
        cache[key] = value
        self._position_cache_bytes[bk] = nb
        while len(cache) > max_entries:
            old_key = next(iter(cache))
            if old_key == key:
                break
            cache.pop(old_key)
            self._position_cache_bytes.pop((tag, old_key), None)
        total = sum(self._position_cache_bytes.values())
        while total > self.position_cache_budget_bytes:
            old = next(iter(self._position_cache_bytes))
            if old == bk:
                break
            total -= self._position_cache_bytes.pop(old)
            old_tag, old_key = old
            tgt = (self._positions_cache if old_tag == "pos"
                   else self._test_map_cache)
            tgt.pop(old_key, None)

    def _filter_in(self, df: DataFrame, col: str, values: list
                   ) -> DataFrame:
        """``df`` restricted to ``col ∈ values``. Small sets inline as
        literals (the In-filter pushes into the parquet scan); large
        sets ship as ONE Arrow batch and broadcast-semi-join instead —
        ``Column.isin`` builds each literal through a py4j round-trip
        (~1 ms apiece), so a 5k-doc miss set would spend seconds on
        socket chatter before the job even starts."""
        if len(values) <= 64:
            return df.filter(F.col(col).isin(values))
        import pandas as pd

        ids = self.spark.createDataFrame(pd.DataFrame({col: values}))
        return df.join(F.broadcast(ids), col, "left_semi")

    # -- stats lookups ---------------------------------------------------
    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            rows = (
                self._filter_in(self.term_stats, "term", missing)
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
        the O(vocab) stats table, never of the postings (and cached:
        interactive serving repeats the same expansions)."""
        ck = ("term", pattern, max_terms)
        hit = self._expand_cache.get(ck)
        if hit is not None:
            return hit
        rows = (
            self.term_stats.filter(F.col("term").rlike(f"^(?:{pattern})$"))
            .orderBy(F.desc("df"), F.asc("term"))
            .select("term").limit(max_terms).collect()
        )
        out = [r["term"] for r in rows]
        if len(self._expand_cache) < 4096:
            self._expand_cache[ck] = out
        return out

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
            self._filter_in(self.segments, "term", missing)
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

    def _postings_with_positions(self, term: str, layer: str = "term"
                                 ) -> dict[int, "object"]:
        """doc_id → ascending positions array, merged across segments.

        A separate pruned scan fetches ``pos_vb`` only here — BM25
        queries never read the positions column (column pruning).
        ``layer != "term"`` reads the multi-layer postings dataset with
        the prefixed key (``"<layer>:<value>"``)."""
        import numpy as np

        from ..functions.codec import decode_positions, vbyte_decode

        return self._postings_with_positions_many([term], layer)[term]

    def _postings_with_positions_many(
            self, terms: list[str], layer: str = "term"
    ) -> dict[str, dict]:
        """Batched :meth:`_postings_with_positions`: ALL miss terms
        fetch in ONE pruned scan (a regex slot expands to up to 256
        dictionary terms — one Spark job per term was the dominant
        cold-pattern cost; one ``term IN (…)`` scan is the same bytes
        with one job's overhead)."""
        import numpy as np

        from ..functions.codec import decode_positions, vbyte_decode

        # snapshot hits FIRST: the budget inserts below may evict any
        # older entry, including another of this call's terms
        result = {t: self._positions_cache[(layer, t)] for t in terms
                  if (layer, t) in self._positions_cache}
        missing = sorted({t for t in terms if t not in result})
        if missing:
            if layer == "term":
                src = self.segments
                keys = {t: t for t in missing}
            else:
                self._require_layers()
                src = self.layers
                keys = {f"{layer}:{t}": t for t in missing}
            rows = (
                self._filter_in(src, "term", list(keys))
                .select("term", "n", "first_doc", "docs_vb", "pos_vb")
                .collect()
            )
            per_term: dict[str, dict[int, object]] = \
                {t: {} for t in missing}
            for r in rows:
                out = per_term[keys[r["term"]]]
                gaps = vbyte_decode(bytes(r["docs_vb"])).astype(np.int64)
                docs = np.cumsum(gaps) + r["first_doc"]
                pls = decode_positions(bytes(r["pos_vb"]), int(r["n"]))
                for d, pl in zip(docs, pls):
                    out[int(d)] = pl
            for t in missing:
                self._budget_insert(self._positions_cache, "pos",
                                    (layer, t), per_term[t],
                                    self.positions_cache_max)
            result.update(per_term)
        return {t: result[t] for t in terms}

    def _require_layers(self) -> None:
        if self.layers is None or self.layer_stats is None:
            raise NotImplementedError(
                "index has no annotation-layer postings — build them "
                "with index.build.build_layer_postings (reference "
                "conllu-sentences.blf.yaml multi-field analog)")

    def expand_layer_terms(self, layer: str, pattern: str,
                           max_terms: int = 256) -> list[str]:
        """Regex expansion through a layer's term dictionary (P1 over
        lemma/upos/xpos/deprel), df-descending like :meth:`expand_terms`."""
        if layer == "term":
            return self.expand_terms(pattern, max_terms)
        self._require_layers()
        ck = (layer, pattern, max_terms)
        hit = self._expand_cache.get(ck)
        if hit is not None:
            return hit
        rows = (
            self.layer_stats
            .filter((F.col("layer") == layer)
                    & F.col("value").rlike(f"^(?:{pattern})$"))
            .orderBy(F.desc("df"), F.asc("value"))
            .select("value").limit(max_terms).collect()
        )
        out = [r["value"] for r in rows]
        if len(self._expand_cache) < 4096:
            self._expand_cache[ck] = out
        return out

    def forward_layer(self, doc_ids: list[int], layer: str
                      ) -> dict[int, list]:
        """doc_id → value array (position order) for one annotation
        layer — the forward-index read that recovers "the lemma AT the
        matched position" for collocate grouping. One pruned scan per
        MISS set, cached per (layer, doc): a 41-relation sketch fan-out
        touches mostly the same candidate docs per relation, and one
        scan per relation would dominate serving latency."""
        cache = self._forward_cache.setdefault(layer, {})
        missing = [d for d in doc_ids if d not in cache]
        if missing:
            fwp = self.root / "forward_layers"
            if fwp.exists():
                fw = self.spark.read.parquet(str(fwp))
                col = layer
                if col not in fw.columns:
                    raise ValueError(f"forward layer {layer!r} not stored "
                                     f"(available: {sorted(fw.columns)})")
            elif layer == "term" and (self.root / "docstore").exists():
                # term-only index: the docstore's position-ordered token
                # array IS the term forward index
                fw = self.spark.read.parquet(str(self.root / "docstore"))
                col = "tokens"
            else:
                raise NotImplementedError(
                    "index has no forward_layers store — build with "
                    "index.build.build_conllu_index(store_docstore=True)")
            rows = self._filter_in(fw, "doc_id", missing) \
                .select("doc_id", col).collect()
            found = {int(r["doc_id"]): list(r[col]) for r in rows}
            for d in missing:
                cache[d] = found.get(d, [])
        return {d: cache[d] for d in doc_ids}

    def layer_cf(self, layer: str, values: list[str]) -> dict[str, int]:
        """Collection frequencies for specific layer values (pruned
        dictionary lookups, cached per value — the sketch scorer's
        stats joins)."""
        cache = self._cf_cache.setdefault(layer, {})
        missing = [v for v in values if v not in cache]
        if missing:
            if layer == "term":
                rows = (self._filter_in(self.term_stats, "term", missing)
                        .select(F.col("term").alias("value"), "cf")
                        .collect())
            else:
                self._require_layers()
                rows = (self._filter_in(
                        self.layer_stats.filter(F.col("layer") == layer),
                        "value", missing)
                        .select("value", "cf").collect())
            found = {r["value"]: int(r["cf"]) for r in rows}
            for v in missing:
                cache[v] = found.get(v, 0)
        return {v: cache[v] for v in values if cache[v] > 0}

    def forward_token_table(self, columns: set[str] | None = None
                            ) -> DataFrame | None:
        """DISTRIBUTED multi-layer token table derived from the index's
        own ``forward_layers`` store: ``posexplode`` of the per-doc
        value arrays → ``(doc_id, pos, term, lemma, upos, xpos, deprel,
        …)`` — exactly the shape :func:`..plans.cql.compile_cql`
        consumes. This is how a HOT pattern leaves the driver: the
        reference executes every pattern in its in-process index
        (``BlackLabQueryExecutor.java:117-144``) because one node holds
        the corpus; at 100× corpus the same query must shard, and the
        forward store already is a doc-partitioned parquet table.
        Falls back to the term-only ``docstore`` when no forward layers
        were built; ``None`` when neither exists.

        ``columns`` restricts which layer arrays are zipped: the
        ``arrays_zip`` consumes every requested array wholesale, so
        Catalyst cannot column-prune through it — a 2-layer pattern
        must not pay for scanning all 11 stored arrays. Callers pass
        the layers their plan actually tests/captures."""
        fwp = self.root / "forward_layers"
        if fwp.exists():
            fw = self.spark.read.parquet(str(fwp))
            cols = [c for c in fw.columns
                    if c != "doc_id"
                    and (columns is None or c in columns)]
            if not cols:
                return None
            return fw.select(
                "doc_id",
                F.posexplode(F.arrays_zip(*cols)).alias("pos", "z"),
            ).select("doc_id", F.col("pos").cast("long").alias("pos"),
                     *[F.col(f"z.{c}").alias(c) for c in cols])
        ds = self.root / "docstore"
        if ds.exists():
            return self.spark.read.parquet(str(ds)).select(
                "doc_id", F.posexplode("tokens").alias("pos", "term"))
        return None

    def _doc_lens(self, doc_ids: list[int]) -> dict[int, int]:
        """doc_id → token count (the doc_lens stage; pruned scan per
        miss set) — the position universe for complement (negation)
        slots."""
        missing = [d for d in doc_ids if d not in self._dl_cache]
        if missing:
            dl = self.spark.read.parquet(str(self.root / "doc_lens"))
            rows = self._filter_in(dl, "doc_id", missing) \
                .select("doc_id", "dl").collect()
            found = {int(r["doc_id"]): int(r["dl"]) for r in rows}
            for d in missing:
                self._dl_cache[d] = found.get(d, 0)
        return {d: self._dl_cache[d] for d in doc_ids}

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
        by_term = self._postings_with_positions_many(terms)
        per_term = [by_term[t] for t in terms]
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

    @staticmethod
    def _isect_sorted(a, b):
        """Intersection of two SORTED-UNIQUE int arrays via
        searchsorted membership — O(min log max), no re-sort
        (np.intersect1d re-sorts and re-uniques; at 150k calls per
        sketch fan-out that was the dominant warm-serving cost)."""
        import numpy as np

        if a.size > b.size:
            a, b = b, a
        if b.size == 0:
            return b if a.size == 0 else a[:0]
        idx = np.searchsorted(b, a)
        idx[idx == b.size] = 0
        return a[b[idx] == a]

    @staticmethod
    def _diff_sorted(a, b):
        """a \\ b for SORTED-UNIQUE int arrays (same trick)."""
        import numpy as np

        if a.size == 0 or b.size == 0:
            return a
        idx = np.searchsorted(b, a)
        idx[idx == b.size] = 0
        return a[b[idx] != a]

    def _slot_maps(self, steps, max_terms_per_slot: int):
        """Per constraint slot: (allowed-positions map | None, banned map
        | None). ``allowed`` merges every test layer per doc (positive
        tests intersect positionally — cross-LAYER conjunctions like
        ``[xpos="NN.*" & deprel="nsubj"]`` become per-doc position
        intersections, the Lucene AND-of-fields span analog); negated
        tests subtract. A slot with ONLY negated tests gets
        ``(None, banned)`` — resolved by window complement at chain
        time (the reference executes negation inside Lucene span
        queries; ``plans/concept-sketch-spec.md:60``)."""
        import numpy as np

        from ..plans.cql import DEFAULT_LAYERS, effective_test

        out = []
        for st in steps:
            if st.item.alts:
                raise NotImplementedError(
                    "cross-attr `|` disjunctions union positions ACROSS "
                    "layers — not expressible over per-layer postings; "
                    "route to the distributed compile (pattern_spans_df)")
            sig = tuple(
                ((e := effective_test(t)).attr, e.value, e.negated)
                for t in st.item.tests) + (max_terms_per_slot,)
            hit = self._slot_map_cache.get(sig)
            if hit is not None:
                out.append(hit)
                continue
            pos_maps, ban_maps = [], []
            for t in st.item.tests:
                t = effective_test(t)
                layer = DEFAULT_LAYERS.get(t.attr)
                if layer is None:
                    raise NotImplementedError(
                        f"attribute {t.attr!r} has no indexed layer "
                        f"(available: {sorted(DEFAULT_LAYERS)})")
                if t.is_literal:
                    values = [t.value.replace("\\", "")]
                else:
                    values = self.expand_layer_terms(
                        layer, t.value, max_terms_per_slot)
                ck = (layer, tuple(sorted(values)))
                merged = self._test_map_cache.get(ck)
                if merged is None:
                    merged = {}
                    by_term = self._postings_with_positions_many(
                        values, layer)
                    for v in values:
                        for d, pl in by_term[v].items():
                            if d in merged:
                                merged[d] = np.union1d(merged[d], pl)
                            else:
                                merged[d] = np.asarray(pl, dtype=np.int64)
                    self._budget_insert(self._test_map_cache, "test",
                                        ck, merged,
                                        self.test_map_cache_max)
                (ban_maps if t.negated else pos_maps).append(merged)
            if pos_maps:
                if len(pos_maps) == 1 and not ban_maps:
                    # single positive test: the merged test map IS the
                    # slot map — no per-doc copy loop
                    allowed = pos_maps[0]
                else:
                    docs = set(pos_maps[0])
                    for m in pos_maps[1:]:
                        docs &= set(m)
                    allowed = {}
                    for d in docs:
                        a = pos_maps[0][d]
                        for m in pos_maps[1:]:
                            a = self._isect_sorted(a, m[d])
                            if a.size == 0:
                                break
                        for bm in ban_maps:
                            if a.size and d in bm:
                                a = self._diff_sorted(a, bm[d])
                        if a.size:
                            allowed[d] = a
                res = (allowed, None)
            else:
                if not ban_maps:
                    raise NotImplementedError(
                        "constraint slot with no tests — use [] gaps")
                if len(ban_maps) == 1:
                    ban = ban_maps[0]
                else:
                    ban = {}
                    for bm in ban_maps:
                        for d, pl in bm.items():
                            ban[d] = (np.union1d(ban[d], pl) if d in ban
                                      else np.asarray(pl, dtype=np.int64))
                res = (None, ban)
            if len(self._slot_map_cache) >= self.slot_map_cache_max:
                self._slot_map_cache.pop(next(iter(self._slot_map_cache)))
            self._slot_map_cache[sig] = res
            out.append(res)
        return out

    def _sent_filter(self, mat, sents):
        """Keep only match rows whose first and last slot positions lie
        in the same sentence (``sent_no`` forward array; sentences are
        position-contiguous so the two ends bound every slot between).
        ``sents`` may be an empty list when the doc has no stored
        array — then nothing is constrained away (flat-stream corpus)."""
        import numpy as np

        if not len(sents):
            return mat
        s = np.asarray(sents, dtype=np.int64)
        return mat[s[mat[:, 0]] == s[mat[:, -1]]]

    def pattern_hits(self, pattern: str, max_terms_per_slot: int = 256,
                     within_sentence: bool = False
                     ) -> list[tuple[int, int, int]]:
        """Index-side mini-BCQL execution — the reference's main query
        path runs CQL against the Lucene index
        (``BlackLabQueryExecutor.java:117-144``); each token constraint
        expands through its LAYER's term dictionary (term/lemma/upos/
        xpos/deprel — multi-layer postings via
        ``index.build.build_layer_postings``), positional postings are
        fetched via pruned scans, and the constraint sequence chains
        doc-at-a-time over numpy position arrays with the
        ``[]{min,max}`` gap windows (the SpanNear generalization of
        :meth:`phrase_hits`).

        Negation: ``attr!="..."`` subtracts banned positions; a slot
        with ONLY negated tests matches any token in the gap window
        whose position is not banned (complement against the doc's
        position universe ``[0, dl)`` from the doc_lens stage). At
        least one slot must have a positive test (the candidate-doc
        driver); purely negative patterns are DataFrame-path only.

        ``within_sentence=True`` drops matches whose ends lie in
        different sentences (``sent_no`` forward array — the reference
        indexes ``<s>`` spans and gap patterns never cross them,
        ``conllu-sentences.blf.yaml:16``).

        Returns distinct ``[(doc_id, start, end)]`` sorted.

        A trailing BlackLab ``within <s/>`` clause in the pattern
        string sets ``within_sentence`` too; bounded token quantifiers
        (``[xpos="JJ.*"]{1,2}``) execute as the union of their
        concrete-length variants.
        """
        import numpy as np

        from ..plans.cql import (
            _steps,
            expand_repetitions,
            has_repetitions,
            parse_cql,
            strip_constraints,
            strip_within_sentence,
        )

        pattern, ws = strip_within_sentence(pattern)
        within_sentence = within_sentence or ws
        pattern, cons = strip_constraints(pattern)
        if cons:
            raise NotImplementedError(
                "inter-slot constraints compare layer VALUES at matched "
                "positions — the positional span chain only tracks "
                "position sets; use pattern_spans_df (routes to the "
                "forward-store distributed compile)")
        items = parse_cql(pattern)
        from ..plans.cql import has_alts

        if has_alts(items):
            raise NotImplementedError(
                "cross-attr `|` disjunctions union positions ACROSS "
                "layers — not expressible over per-layer postings; use "
                "pattern_spans_df (routes to the forward-store "
                "distributed compile)")
        if has_repetitions(items):
            out_set: set[tuple[int, int, int]] = set()
            for v in expand_repetitions(items):
                out_set.update(
                    (d, p[0], p[-1]) for d, p in self.pattern_matches(
                        v, max_terms_per_slot,
                        within_sentence=within_sentence))
            return sorted(out_set)
        steps = _steps(items)
        slots = self._slot_maps(steps, max_terms_per_slot)
        pos_slots = [allowed for allowed, _ in slots if allowed is not None]
        if not pos_slots:
            raise NotImplementedError(
                "pattern needs at least one non-negated constraint "
                "index-side (purely negative patterns are DataFrame-"
                "path only: plans.cql.compile_cql)")
        if any(not s for s in pos_slots):
            return []
        cand = set(pos_slots[0])
        for s in pos_slots[1:]:
            cand &= set(s)
        if not cand:
            return []
        need_dl = any(allowed is None for allowed, _ in slots)
        dls = self._doc_lens(sorted(cand)) if need_dl else {}
        sent_fw = (self.forward_layer(sorted(cand), "sent_no")
                   if within_sentence else None)
        out: list[tuple[int, int, int]] = []
        for d in sorted(cand):
            mat = self._chain_doc(d, steps, slots, dls)
            if mat is not None and within_sentence:
                mat = self._sent_filter(mat, sent_fw.get(d, []))
                if not mat.shape[0]:
                    mat = None
            if mat is not None:
                if mat.shape[0] > 64:
                    # vectorized span dedup (lexicographic np.unique):
                    # at 10⁵⁺ matches per hot pattern the python
                    # set-of-tuples pass dominated the wall. Small mats
                    # keep the set — np.unique's setup constant loses
                    # below ~64 rows, and most docs are small.
                    spans = np.unique(mat[:, [0, -1]], axis=0)
                    out.extend((d, int(s), int(e)) for s, e in spans)
                else:
                    uniq = {(int(r[0]), int(r[-1])) for r in mat}
                    out.extend((d, s, e) for s, e in sorted(uniq))
        return out

    def _chain_doc(self, d: int, steps, slots, dls):
        """Doc-at-a-time slot chaining, FULL position capture: returns
        the (n_matches × n_slots) position matrix for doc ``d`` (one row
        per distinct constraint-position assignment) or None.

        Each extension is fully vectorized: a batched ``searchsorted``
        range query of every partial row's gap window against the
        slot's sorted position array (no per-row python in the hot
        loop — a 41-relation sketch fan-out runs this for thousands of
        candidate docs)."""
        import numpy as np

        empty = np.empty(0, dtype=np.int64)
        allowed0, ban0 = slots[0]
        if allowed0 is None:
            uni = np.arange(dls.get(d, 0), dtype=np.int64)
            p0 = np.setdiff1d(uni, ban0.get(d, empty))
        else:
            p0 = np.asarray(allowed0.get(d, empty), dtype=np.int64)
        if p0.size == 0:
            return None
        mat = p0.reshape(-1, 1)
        for st, (allowed, ban) in zip(steps[1:], slots[1:]):
            prevs = mat[:, -1]
            if allowed is not None:
                nxt = allowed.get(d)
                if nxt is None:
                    return None
            else:
                # complement slot: window positions minus banned — the
                # candidate universe is [0, dl); materialize it once
                dl = dls.get(d, 0)
                nxt = np.setdiff1d(np.arange(dl, dtype=np.int64),
                                   ban.get(d, empty))
            # batched range query: positions of nxt within each row's
            # [prev+lo, prev+hi] window
            left = np.searchsorted(nxt, prevs + st.lo, side="left")
            right = np.searchsorted(nxt, prevs + st.hi, side="right")
            counts = right - left
            total = int(counts.sum())
            if total == 0:
                return None
            row_idx = np.repeat(np.arange(mat.shape[0]), counts)
            within = (np.arange(total)
                      - np.repeat(np.cumsum(counts) - counts, counts))
            sel = nxt[np.repeat(left, counts) + within]
            mat = np.column_stack([mat[row_idx], sel])
        return mat

    def pattern_matches(self, pattern: str | list,
                        max_terms_per_slot: int = 256,
                        within_sentence: bool = False
                        ) -> list[tuple[int, tuple[int, ...]]]:
        """Distinct full match assignments ``[(doc_id, (pos per token
        constraint...))]`` — the labeled-capture twin of
        :meth:`pattern_hits` (what collocate extraction needs: the
        position of EVERY slot, not just the span ends). Accepts a
        pattern string or pre-parsed items (for head-substituted
        patterns)."""
        import numpy as np

        from ..plans.cql import (
            _steps,
            has_repetitions,
            parse_cql,
            strip_within_sentence,
        )

        if isinstance(pattern, str):
            pattern, ws = strip_within_sentence(pattern)
            within_sentence = within_sentence or ws
        items = parse_cql(pattern) if isinstance(pattern, str) else pattern
        if has_repetitions(items):
            raise NotImplementedError(
                "labeled-capture matching with repetition quantifiers "
                "is ambiguous (variants have different slot counts) — "
                "use pattern_hits for spans")
        steps = _steps(items)
        slots = self._slot_maps(steps, max_terms_per_slot)
        pos_slots = [allowed for allowed, _ in slots if allowed is not None]
        if not pos_slots:
            raise NotImplementedError(
                "pattern needs at least one non-negated constraint "
                "index-side")
        if any(not s for s in pos_slots):
            return []
        cand = set(pos_slots[0])
        for s in pos_slots[1:]:
            cand &= set(s)
        if not cand:
            return []
        need_dl = any(allowed is None for allowed, _ in slots)
        dls = self._doc_lens(sorted(cand)) if need_dl else {}
        sent_fw = (self.forward_layer(sorted(cand), "sent_no")
                   if within_sentence else None)
        out: list[tuple[int, tuple[int, ...]]] = []
        for d in sorted(cand):
            mat = self._chain_doc(d, steps, slots, dls)
            if mat is not None and within_sentence:
                mat = self._sent_filter(mat, sent_fw.get(d, []))
            if mat is not None and mat.shape[0]:
                if mat.shape[0] > 64:
                    # vectorized dedup+sort (lexicographic np.unique);
                    # the python set pass dominated hot fan-outs
                    for r in np.unique(mat, axis=0):
                        out.append((d, tuple(int(x) for x in r)))
                else:
                    rows = {tuple(int(x) for x in r) for r in mat}
                    out.extend((d, r) for r in sorted(rows))
        return out

    def relation_matches(self, query, max_terms_per_slot: int = 256
                         ) -> list[tuple[int, int, int]]:
        """INDEX-side execution of a BCQL dependency-relation query
        ``SOURCE -deprel-> TARGET`` (``plans.cql.RelationQuery``) — the
        reference's relation-operator path
        (``BlackLabQueryExecutor.java:211-229``) over the engine's own
        artifacts: the DEPENDENT side (target tests + the positive
        ``deprel`` test) drives candidates through the layer postings,
        then the ``sent_no``/``token_id``/``head`` forward arrays
        resolve each dependent to its governor position (CoNLL-U token
        ids are dense 1..n per sentence, so governor position =
        sentence start + head-id − 1, verified against the stored
        token_id). Returns ``[(doc_id, gov_pos, dep_pos)]`` sorted.
        """
        import numpy as np

        from ..plans.cql import (
            AttrTest,
            TokenItem,
            _steps,
            parse_relation_query,
        )

        rq = (parse_relation_query(query) if isinstance(query, str)
              else query)
        if rq is None:
            raise ValueError(f"not a relation query: {query!r}")
        dep_item = TokenItem(list(rq.target.tests)
                             + [AttrTest("deprel", rq.deprel)])
        (dep_allowed, _), = self._slot_maps(_steps([dep_item]),
                                            max_terms_per_slot)
        src_allowed = None
        if rq.source.tests:
            if all(t.negated for t in rq.source.tests):
                raise NotImplementedError(
                    "purely negative source operand is DataFrame-path "
                    "only (operators.dependency.relation_query_pairs)")
            (src_allowed, _), = self._slot_maps(_steps([rq.source]),
                                                max_terms_per_slot)
        docs = sorted(set(dep_allowed)
                      & (set(src_allowed) if src_allowed is not None
                         else set(dep_allowed)))
        if not docs:
            return []
        fw_sent = self.forward_layer(docs, "sent_no")
        fw_tok = self.forward_layer(docs, "token_id")
        fw_head = self.forward_layer(docs, "head")
        out: list[tuple[int, int, int]] = []
        for d in docs:
            sent = np.asarray(fw_sent[d], dtype=np.int64)
            tok = np.asarray(fw_tok[d], dtype=np.int64)
            head = np.asarray(fw_head[d], dtype=np.int64)
            dp = np.asarray(dep_allowed[d], dtype=np.int64)
            if dp.size == 0 or sent.size == 0:
                continue
            hd = head[dp]
            gp = np.searchsorted(sent, sent[dp], side="left") + hd - 1
            ok = (hd > 0) & (gp >= 0) & (gp < sent.size)
            gp_c = np.clip(gp, 0, sent.size - 1)
            ok &= (tok[gp_c] == hd) & (sent[gp_c] == sent[dp])
            if src_allowed is not None:
                ok &= np.isin(gp_c, src_allowed[d])
            for g, p in zip(gp_c[ok], dp[ok]):
                out.append((d, int(g), int(p)))
        return out

    def relation_matches_auto(self, query, max_terms_per_slot: int = 256,
                              df_budget: int = 500_000
                              ) -> list[tuple[int, int, int]]:
        """:meth:`relation_matches` with the hot-slot guard: the
        dependent side always carries a positive ``deprel`` test whose
        Σcf is a fixed fraction of the CORPUS (every token has a
        deprel), so at scale the in-driver resolver would pull a
        corpus-sized postings map. Over ``df_budget`` the query runs as
        a distributed dependency join over the forward token table
        instead: governor side filtered by the source tests, dependent
        side by deprel + target tests, joined on ``(doc_id, sent_no,
        head == governor token_id)`` — the same join shape as
        ``operators.dependency.relation_query_pairs``, executed against
        the index's own store."""
        from ..plans.cql import (
            DEFAULT_LAYERS,
            AttrTest,
            TokenItem,
            _item_predicate,
            effective_test,
            parse_relation_query,
        )

        rq = (parse_relation_query(query) if isinstance(query, str)
              else query)
        if rq is None:
            raise ValueError(f"not a relation query: {query!r}")
        if self.relation_route_distributed(rq, max_terms_per_slot,
                                           df_budget):
            return self._relation_matches_distributed(rq)
        return self.relation_matches(rq, max_terms_per_slot)

    def relation_route_distributed(self, rq, max_terms_per_slot: int = 256,
                                   df_budget: int = 500_000) -> bool:
        """The relation-query router's cost model: the in-driver
        resolver pays (a) the postings pull (Σcf of every test) AND
        (b) FULL forward-array reads (sent_no/token_id/head + the
        collocate layer) for every candidate doc — (b) is
        O(candidate_docs × avgdl), ≈ the corpus for an unselective
        source, and dominates. Candidate docs are bounded by the most
        selective positive test's Σdf; when the combined estimate
        exceeds the budget (or an expansion hit the cap), serve
        distributed."""
        from ..plans.cql import AttrTest

        if rq.source.tests and all(t.negated for t in rq.source.tests):
            # purely-negative source: the in-driver resolver would need
            # the corpus-sized position complement — always distributed
            return True
        dep_tests = list(rq.target.tests) + [AttrTest("deprel", rq.deprel)]
        self._price_tests(dep_tests + list(rq.source.tests))  # one batch
        cost = 0
        capped = False
        doc_bounds = []
        for tests in (dep_tests, rq.source.tests):
            for t in tests:
                t2, c2 = self._tests_cost([t], max_terms_per_slot)
                cost += t2
                capped = capped or c2
                if not t.negated:
                    # Σdf of one positive test bounds candidate docs
                    # (cf ≥ df, so the cf sum is a safe upper estimate
                    # of df without a second dictionary scan)
                    doc_bounds.append(t2)
        est_docs = min(doc_bounds) if doc_bounds else self.stats["n_docs"]
        est_docs = min(est_docs, self.stats["n_docs"])
        forward_cost = int(est_docs * self.stats["avgdl"]) * 4
        return bool(cost + forward_cost > df_budget or capped)

    def relation_join_df(self, rq, dep_capture: str | None = None
                         ) -> DataFrame:
        """The distributed governor→dependent join over the forward
        token table (column-pruned): one row per match ``(doc_id, gp,
        dp[, colloc])``; ``dep_capture`` additionally projects the
        dependent's value on that layer (in-plan collocate identity —
        no per-doc forward pulls). Raises when the index has no
        forward store."""
        from ..plans.cql import (
            DEFAULT_LAYERS,
            AttrTest,
            TokenItem,
            _item_predicate,
            effective_test,
        )

        dep_tests = list(rq.target.tests) + [AttrTest("deprel", rq.deprel)]
        need = {"sent_no", "token_id", "head"}
        for t in [*dep_tests, *rq.source.tests]:
            a = effective_test(t).attr
            need.add("term" if a == "class" else DEFAULT_LAYERS.get(a, a))
        if dep_capture:
            need.add(DEFAULT_LAYERS.get(dep_capture, dep_capture))
        tokens = self.forward_token_table(columns=need)
        if tokens is None or not need <= set(tokens.columns):
            raise NotImplementedError(
                "distributed relation queries need the forward_layers "
                "store with structural arrays "
                "(index.build.build_conllu_index)")
        cols = tokens.columns
        gov = tokens.filter(_item_predicate(rq.source, cols)).select(
            F.col("doc_id").alias("gd"), F.col("sent_no").alias("gs"),
            F.col("token_id").alias("gt"), F.col("pos").alias("gp"))
        dsel = ["doc_id", "sent_no", "head", F.col("pos").alias("dp")]
        if dep_capture:
            dsel.append(F.col(DEFAULT_LAYERS.get(dep_capture, dep_capture))
                        .alias("colloc"))
        dep = tokens.filter(
            (F.col("head") > 0)
            & _item_predicate(TokenItem(dep_tests), cols)
        ).select(*dsel)
        out_cols = ["doc_id", "gp", "dp"] + (["colloc"] if dep_capture
                                             else [])
        return (dep.join(gov, (dep["doc_id"] == gov["gd"])
                         & (dep["sent_no"] == gov["gs"])
                         & (dep["head"] == gov["gt"]))
                .select(*out_cols))

    def _relation_matches_distributed(self, rq) -> list[tuple[int, int, int]]:
        """Materialized match list off the distributed join — one Arrow
        batch exchange; plan-shaped consumers (collocate counting)
        use :meth:`relation_join_df` directly and keep aggregation
        in-plan instead."""
        try:
            df = self.relation_join_df(rq)
        except NotImplementedError:
            return self.relation_matches(rq)
        pdf = df.orderBy("doc_id", "gp", "dp").toPandas()
        return list(zip(pdf["doc_id"].astype(int).tolist(),
                        pdf["gp"].astype(int).tolist(),
                        pdf["dp"].astype(int).tolist()))

    def pattern_cost(self, pattern: str, max_terms_per_slot: int = 256
                     ) -> tuple[int, bool]:
        """(Σcf over every test's dictionary expansion, hit-the-cap
        flag) — the postings-volume estimate that decides whether the
        in-process span chain is the right tool. The chain decodes
        POSITION lists, whose size is the collection frequency — a
        class-wide layer slot (``[xpos="NN.*"]``) has cf ≈ dl·df, so a
        df-based estimate under-counts it ~100× and keeps corpus-sized
        pulls in the driver. Dictionary-only scans (term_stats /
        layer_stats aggregates), never postings — and BATCHED: one
        conditional-aggregate job per dictionary table for the whole
        pattern's uncached tests, memoized per (layer, test), so a
        cold 41-relation fan-out prices in a handful of jobs instead
        of ~2 scheduler round-trips per slot (r4 verdict #5)."""
        from ..plans.cql import _steps, parse_cql, strip_within_sentence

        pattern, _ws = strip_within_sentence(pattern)
        steps = _steps(parse_cql(pattern))
        self._price_tests([t for st in steps for t in st.item.tests])
        total, capped = 0, False
        for st in steps:
            t2, c2 = self._tests_cost(st.item.tests, max_terms_per_slot)
            total += t2
            capped = capped or c2
        return total, capped

    def _price_tests(self, tests) -> None:
        """Fill the (layer, value, literal) → (Σcf, n_values) memo for
        every test in one conditional-aggregate job per dictionary
        table (term_stats; layer_stats once for ALL non-term layers)."""
        from ..plans.cql import DEFAULT_LAYERS, effective_test

        by_src: dict[str, list] = {}
        for t in tests:
            t = effective_test(t)
            layer = DEFAULT_LAYERS.get(t.attr)
            if layer is None:
                continue
            key = (layer, t.value, t.is_literal)
            if key in self._cost_cache:
                continue
            by_src.setdefault("term" if layer == "term" else "layers",
                              []).append(key)
        for src_name, keys in by_src.items():
            keys = list(dict.fromkeys(keys))
            if src_name == "term":
                src = self.term_stats.select(
                    F.col("term").alias("value"),
                    F.lit("term").alias("layer"), "cf")
            else:
                self._require_layers()
                src = self.layer_stats.select("value", "layer", "cf")
            aggs = []
            for i, (layer, value, lit) in enumerate(keys):
                if lit:
                    m = F.col("value") == value.replace("\\", "")
                else:
                    m = F.col("value").rlike(f"^(?:{value})$")
                m = m & (F.col("layer") == layer)
                aggs.append(F.sum(F.when(m, F.col("cf"))).alias(f"s{i}"))
                aggs.append(F.sum(F.when(m, F.lit(1))).alias(f"n{i}"))
            row = src.agg(*aggs).collect()[0]
            if len(self._cost_cache) > 16384:  # a few ints per entry
                self._cost_cache.clear()
            for i, key in enumerate(keys):
                self._cost_cache[key] = (int(row[f"s{i}"] or 0),
                                         int(row[f"n{i}"] or 0))

    def _tests_cost(self, tests, max_terms_per_slot: int
                    ) -> tuple[int, bool]:
        """Σcf + cap flag for one constraint's test list (the per-slot
        kernel of :meth:`pattern_cost`, reused by the relation-query
        router) — served from the pricing memo, filled on demand."""
        from ..plans.cql import DEFAULT_LAYERS, effective_test

        self._price_tests(tests)
        total, capped = 0, False
        for t in tests:
            t = effective_test(t)
            layer = DEFAULT_LAYERS.get(t.attr)
            if layer is None:
                continue
            scf, n = self._cost_cache[(layer, t.value, t.is_literal)]
            total += scf
            capped = capped or n > max_terms_per_slot
        return total, capped

    # a broadcast side above this many positions is a driver/executor
    # memory hazard (~0.5 GB of packed rows) — fall back to shuffle
    broadcast_slot_max_cf = 64_000_000

    def _selective_broadcast_safe(self, pattern: str) -> bool:
        """May compile_cql hint literal word/lemma slots broadcast for
        this pattern? Priced from the dictionary memo (already filled
        by :meth:`pattern_cost` on this path): every positive literal
        surface/lemma test must be under the broadcast cf cap — a
        stopword slot at web scale must shuffle, not broadcast."""
        from ..plans.cql import (
            DEFAULT_LAYERS,
            _steps,
            effective_test,
            parse_cql,
        )

        tests = [t for st in _steps(parse_cql(pattern))
                 for t in st.item.tests]
        self._price_tests(tests)
        for t in tests:
            t = effective_test(t)
            layer = DEFAULT_LAYERS.get(t.attr)
            if (layer in ("term", "lemma", "word_cs", "lemma_cs")
                    and t.is_literal and not t.negated):
                scf, _n = self._cost_cache[(layer, t.value, t.is_literal)]
                if scf > self.broadcast_slot_max_cf:
                    return False
        return True

    def _pattern_fallback_tokens(self, pattern: str,
                                 within_sentence: bool,
                                 extra_attrs: set[str] | None = None):
        """Column-pruned forward token table able to serve ``pattern``
        distributed, or ``None`` when the store is absent or lacks a
        tested layer (the pattern then stays on the capped index path,
        documented best-effort like the reference's max term
        expansion)."""
        from ..plans.cql import (
            DEFAULT_LAYERS,
            _steps,
            effective_test,
            parse_cql,
        )

        attrs = set()
        for st in _steps(parse_cql(pattern)):
            for t in st.item.tests:
                attrs.add(effective_test(t).attr)
            for group in st.item.alts or ():
                for t in group:
                    attrs.add(effective_test(t).attr)
        attrs |= extra_attrs or set()
        # the virtual `class` attr derives from the surface term column
        need = {"term" if a == "class" else DEFAULT_LAYERS.get(a, a)
                for a in attrs}
        if within_sentence:
            need.add("sent_no")
        tokens = self.forward_token_table(columns=need)
        if tokens is not None and not need <= set(tokens.columns):
            tokens = None
        return tokens

    def _meta_allowed_df(self, doc_filter: str) -> DataFrame:
        """Allowed-id PLAN for a metadata predicate (no collect): the
        in-plan twin of :meth:`filtered_doc_ids` for distributed
        consumers (semi-join side)."""
        p = self.root / "doc_meta"
        if not p.exists():
            raise NotImplementedError(
                "index has no doc_meta store — rebuild with build_index "
                "over pages that carry metadata columns")
        return (self.spark.read.parquet(str(p))
                .filter(F.expr(doc_filter)).select("doc_id"))

    def pattern_spans_df(self, pattern: str,
                         max_terms_per_slot: int = 256,
                         df_budget: int = 500_000,
                         within_sentence: bool = False,
                         doc_filter: str | None = None) -> DataFrame:
        """Pattern spans as a DATAFRAME ``(doc_id, start, end)`` —
        the plan-shaped twin of :meth:`pattern_hits_auto`. On the
        distributed route the returned plan never materializes spans on
        the driver (a hot pattern has O(corpus) matches; consumers push
        their own window/limit before any collect — see
        ``query.concordance.index_pattern_concordance``). Under the
        Σcf budget the in-driver span chain runs and its (bounded)
        span list is parallelized back — same result shape either way.

        ``doc_filter`` (SQL predicate over the ``doc_meta`` store)
        restricts matches to passing documents — semi-joined in-plan on
        the distributed route, masked driver-side on the bounded
        in-driver route (BlackLab's metadata-filtered CQL).
        """
        from ..plans.cql import (
            compile_cql,
            strip_constraints,
            strip_containing,
            strip_within_sentence,
        )

        core, mode = strip_containing(pattern)
        if mode is not None:
            # span-filter form: sentence spans, same (doc_id, start,
            # end) shape — KWIC/consumer plumbing works unchanged
            out = (self.sentence_spans_containing(
                core, negated=mode == "not_containing")
                .select("doc_id", "start", "end"))
            if doc_filter is not None:
                out = out.join(self._meta_allowed_df(doc_filter),
                               "doc_id", "left_semi")
            return out
        pattern, ws = strip_within_sentence(pattern)
        within_sentence = within_sentence or ws
        from ..plans.cql import has_alts, parse_cql

        core, cons = strip_constraints(pattern)
        core, ws2 = strip_within_sentence(core)
        within_sentence = within_sentence or ws2
        if cons or has_alts(parse_cql(core)):
            # inter-slot constraints need layer VALUES at two matched
            # positions, and cross-attr `|` disjunctions need a
            # position-set union ACROSS layers — the forward token
            # table serves both; the positional span chain only knows
            # per-layer position sets, so these patterns always route
            # to the distributed compile (the in-driver tier raises,
            # naming this method)
            tokens = self._pattern_fallback_tokens(
                core, within_sentence,
                extra_attrs={a for c in cons
                             for a in (c.attr_a, c.attr_b)})
            if tokens is None:
                raise NotImplementedError(
                    "inter-slot constraints need the forward token "
                    "store carrying every constrained layer — rebuild "
                    "with store_docstore=True / build_conllu_index, or "
                    "use plans.cql.compile_cql over a token DataFrame")
            out = (compile_cql(
                tokens, pattern, keep_terms=False,
                within_sentence=within_sentence,
                selective_broadcast=self._selective_broadcast_safe(
                    core))
                .select("doc_id", "start", "end"))
            if doc_filter is not None:
                out = out.join(self._meta_allowed_df(doc_filter),
                               "doc_id", "left_semi")
            return out
        cost, capped = self.pattern_cost(pattern, max_terms_per_slot)
        tokens = None
        if cost > df_budget or capped:
            tokens = self._pattern_fallback_tokens(pattern,
                                                   within_sentence)
        if tokens is not None:
            out = (compile_cql(
                tokens, pattern, keep_terms=False,
                within_sentence=within_sentence,
                selective_broadcast=self._selective_broadcast_safe(
                    pattern))
                .select("doc_id", "start", "end"))
            if doc_filter is not None:
                out = out.join(self._meta_allowed_df(doc_filter),
                               "doc_id", "left_semi")
            return out
        spans = self.pattern_hits(pattern, max_terms_per_slot,
                                  within_sentence=within_sentence)
        if doc_filter is not None:
            allowed = set(self.filtered_doc_ids(doc_filter).tolist())
            spans = [s for s in spans if s[0] in allowed]
        return bounded_rows_df(
            self.spark, [(int(d), int(s), int(e)) for d, s, e in spans],
            "doc_id long, start long, end long",
            ["doc_id", "start", "end"])

    def group_pattern_hits(self, pattern: str, layer_col: str = "term",
                           k: int = 20,
                           within_sentence: bool = False) -> DataFrame:
        """INDEX-served hit-text frequency list (BlackLab "group hits"):
        spans from whichever tier :meth:`pattern_spans_df` routes to,
        hit text gathered from the forward store's token table, grouped
        and ranked by the shared kernel — the whole trace is a plan;
        only the top-k rows ever reach the driver."""
        from ..plans.cql import spans_group_freq

        tokens = self.forward_token_table(columns={layer_col})
        if tokens is None or layer_col not in tokens.columns:
            raise NotImplementedError(
                f"index stores no '{layer_col}' forward layer — rebuild "
                "with store_docstore=True / build_conllu_index, or use "
                "plans.cql.group_pattern_hits over a token DataFrame")
        spans = self.pattern_spans_df(pattern,
                                      within_sentence=within_sentence)
        return spans_group_freq(spans, tokens, layer_col, k)

    def sample_pattern_hits(self, pattern: str, n: int,
                            seed: int = 0,
                            within_sentence: bool = False) -> DataFrame:
        """INDEX-served deterministic hit sample (BlackLab's
        ``sample``/``samplenumber`` parameters, seeded): spans from
        whichever tier :meth:`pattern_spans_df` routes to, sampled by
        the shared seeded-hash kernel — the top-n heap runs in-plan,
        so only n rows ever reach the driver even on the distributed
        route."""
        from .docs import sample_spans

        return sample_spans(
            self.pattern_spans_df(pattern,
                                  within_sentence=within_sentence),
            n, seed=seed)

    def docs_group_by(self, pattern: str,
                      facet_cols: tuple[str, ...] = ("lang",),
                      within_sentence: bool = False) -> DataFrame:
        """INDEX-served DOCS view (BlackLab ``/docs?group=field:...``):
        per-document hit counts for a pattern grouped by stored
        ``doc_meta`` metadata fields. The facet aggregate is id-free,
        so the index's dense internal doc ids never surface."""
        from .docs import docs_facets

        p = self.root / "doc_meta"
        if not p.exists():
            raise NotImplementedError(
                "index has no doc_meta store — rebuild with build_index "
                "over pages that carry metadata columns")
        return docs_facets(
            self.pattern_spans_df(pattern,
                                  within_sentence=within_sentence),
            self.spark.read.parquet(str(p)), facet_cols)

    def subcorpus_keywords(self, predicate: str, k: int = 20,
                           round_dp: int | None = 4) -> DataFrame:
        """INDEX-served keyword extraction: the subcorpus flag comes
        from the ``doc_meta`` store, term occurrences from the forward
        token table, scored by the shared Dunning-G² tail — everything
        in-plan, ids never leave the executors (the output is id-free,
        so the index's dense internal doc ids don't surface)."""
        from ..operators.keywords import keywords_from_flagged_tokens

        tokens = self.forward_token_table(columns={"term"})
        if tokens is None:
            raise NotImplementedError(
                "index has no forward store — rebuild with "
                "store_docstore=True, or use operators.keywords."
                "subcorpus_keywords over the document table")
        p = self.root / "doc_meta"
        if not p.exists():
            raise NotImplementedError(
                "index has no doc_meta store — rebuild with build_index "
                "over pages that carry metadata columns")
        flag = (self.spark.read.parquet(str(p))
                .select("doc_id",
                        F.expr(predicate).cast("int").alias("in_a")))
        tok = tokens.join(flag, "doc_id").select("in_a", "term")
        return keywords_from_flagged_tokens(tok, k, round_dp)

    def sentence_spans_containing(self, pattern: str,
                                  negated: bool = False) -> DataFrame:
        """Index-served ``<s/> [!]containing PATTERN``: sentence spans
        ``(doc_id, sent_no, start, end)`` holding (or, negated, NOT
        holding) a full match — the BlackLab span-filter operator over
        this index's forward-layer store. Always a DataFrame plan
        (``!containing`` enumerates the corpus's sentence complement,
        O(corpus) rows — never a driver list)."""
        from ..plans.cql import sentence_spans_containing, strip_containing

        core, mode = strip_containing(pattern)
        if mode is not None:
            negated = negated or mode == "not_containing"
        tokens = self._pattern_fallback_tokens(core, within_sentence=True)
        if tokens is None:
            raise NotImplementedError(
                "containing needs the forward-layer store (build the "
                "index with build_conllu_index/build_layer_postings); "
                "over a plain token table use "
                "plans.cql.sentence_spans_containing")
        return sentence_spans_containing(
            tokens, core, negated=negated,
            selective_broadcast=self._selective_broadcast_safe(core))

    def pattern_hits_auto(self, pattern: str,
                          max_terms_per_slot: int = 256,
                          df_budget: int = 500_000,
                          within_sentence: bool = False,
                          doc_filter: str | None = None
                          ) -> list[tuple[int, int, int]]:
        """:meth:`pattern_hits` with the hot-pattern guard: a
        vocabulary-wide slot (e.g. ``[word="[a-z0-9]+"]``) would pull a
        vocabulary-scale postings union driver-side, so when the Σcf
        estimate exceeds ``df_budget`` (or an expansion hit the term
        cap, which would silently truncate matches) the pattern runs as
        a distributed DataFrame plan over the forward token table
        instead — same spans, executor-side work, LAYER-complete: every
        attribute with a stored forward layer (term/lemma/upos/xpos/
        deprel + case variants) routes through the same fallback.

        NOTE the return type is a fully materialized span LIST — right
        for the in-driver path (bounded by the Σcf budget) and for
        tests; a routed-hot pattern's spans are O(corpus), so
        plan-shaped consumers (KWIC pages, collocate counting) should
        use :meth:`pattern_spans_df` and push their window/limit into
        the plan instead of collecting everything here. The transfer
        uses one Arrow batch exchange (``toPandas``), not row-at-a-time
        ``collect`` — ~5× cheaper at 10⁵⁺ spans.

        ``doc_filter`` restricts matches to documents passing a
        metadata predicate (delegates to :meth:`pattern_spans_df`,
        which applies it on whichever route runs)."""
        from ..plans.cql import (
            compile_cql,
            strip_containing,
            strip_within_sentence,
        )

        if doc_filter is not None:
            pdf = (self.pattern_spans_df(
                pattern, max_terms_per_slot, df_budget,
                within_sentence, doc_filter=doc_filter)
                .orderBy("doc_id", "start", "end").toPandas())
            return list(zip(pdf["doc_id"].astype(int).tolist(),
                            pdf["start"].astype(int).tolist(),
                            pdf["end"].astype(int).tolist()))
        core, mode = strip_containing(pattern)
        if mode is not None:
            pdf = (self.sentence_spans_containing(
                core, negated=mode == "not_containing")
                .select("doc_id", "start", "end")
                .orderBy("doc_id", "start", "end").toPandas())
            return list(zip(pdf["doc_id"].astype(int).tolist(),
                            pdf["start"].astype(int).tolist(),
                            pdf["end"].astype(int).tolist()))
        pattern, ws = strip_within_sentence(pattern)
        within_sentence = within_sentence or ws
        from ..plans.cql import has_alts, parse_cql, strip_constraints

        _core, _cons = strip_constraints(pattern)
        _core, _ws2 = strip_within_sentence(_core)
        if _cons or has_alts(parse_cql(_core)):
            # constrained/disjunctive patterns only run on the
            # distributed compile
            pdf = (self.pattern_spans_df(
                pattern, max_terms_per_slot, df_budget, within_sentence)
                .orderBy("doc_id", "start", "end").toPandas())
            return list(zip(pdf["doc_id"].astype(int).tolist(),
                            pdf["start"].astype(int).tolist(),
                            pdf["end"].astype(int).tolist()))
        cost, capped = self.pattern_cost(pattern, max_terms_per_slot)
        if cost <= df_budget and not capped:
            return self.pattern_hits(pattern, max_terms_per_slot,
                                     within_sentence=within_sentence)
        tokens = self._pattern_fallback_tokens(pattern, within_sentence)
        if tokens is None:
            return self.pattern_hits(pattern, max_terms_per_slot,
                                     within_sentence=within_sentence)
        pdf = (compile_cql(
            tokens, pattern, keep_terms=False,
            within_sentence=within_sentence,
            selective_broadcast=self._selective_broadcast_safe(pattern))
            .select("doc_id", "start", "end")
            .orderBy("doc_id", "start", "end").toPandas())
        return list(zip(pdf["doc_id"].astype(int).tolist(),
                        pdf["start"].astype(int).tolist(),
                        pdf["end"].astype(int).tolist()))

    def filtered_doc_ids(self, doc_filter: str):
        """Sorted doc_id array passing a SQL predicate over the stored
        ``doc_meta`` fields (the Lucene stored-metadata filter analog);
        cached per predicate. In-driver tier: O(selected docs) ids —
        right for interactive serving; a corpus-majority filter at web
        scale belongs on the in-plan path
        (``bm25_topk_df(doc_filter=…)`` semi-joins instead)."""
        import numpy as np

        hit = self._meta_filter_cache.get(doc_filter)
        if hit is not None:
            return hit
        p = self.root / "doc_meta"
        if not p.exists():
            raise NotImplementedError(
                "index has no doc_meta store — rebuild with build_index "
                "over pages that carry metadata columns (every non-id/"
                "non-text column is stored)")
        pdf = (self.spark.read.parquet(str(p))
               .filter(F.expr(doc_filter)).select("doc_id").toPandas())
        arr = np.sort(pdf["doc_id"].to_numpy(np.int64))
        if len(self._meta_filter_cache) < 64:
            self._meta_filter_cache[doc_filter] = arr
        return arr

    def search(self, query: str | list[str], k: int = 10, mode: str = "auto",
               doc_filter: str | None = None
               ) -> tuple[list[tuple[int, float]], dict]:
        """Top-k ``(doc_id, score)`` for a free-text query or term list.

        ``mode``: ``auto`` (vectorized for head-heavy queries, block-max
        WAND when a selective term makes pruning viable), ``bmw``,
        ``wand`` (global-bound), ``vec`` (vectorized exhaustive),
        ``daat`` (per-doc exhaustive — validation baseline).

        All modes are rank- and score-identical; they differ only in
        blocks decoded and constant factors.

        ``doc_filter`` (SQL predicate over the stored ``doc_meta``
        fields, e.g. ``"lang = 'en'"``) restricts candidates; collection
        statistics stay corpus-level (Lucene filter-query semantics).
        Filtered queries run on the vectorized tier with the allowed-id
        mask applied AFTER the per-term decode cache, so the cache stays
        filter-agnostic.
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
        if doc_filter is not None:
            return self._vec_cached(terms, dfs, k,
                                    allowed=self.filtered_doc_ids(doc_filter))
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

    def _vec_cached(self, terms: list[str], dfs: dict[str, int], k: int,
                    allowed=None
                    ) -> tuple[list[tuple[int, float]], dict]:
        """Vectorized path with a decoded-postings cache for hot terms.
        ``allowed`` (sorted int64 array) masks each term's postings to
        the metadata-filtered candidate set — applied on a copy, never
        to the cached arrays."""
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
            if allowed is not None and docs.size:
                # both sides sorted → membership via searchsorted
                pos = np.searchsorted(allowed, docs)
                pos[pos >= allowed.size] = 0
                m = allowed[pos] == docs if allowed.size else \
                    np.zeros(docs.size, dtype=bool)
                docs, scores = docs[m], scores[m]
            term_arrays.append((ti, docs, scores))
        out = topk_from_arrays(term_arrays, k)
        return out, {"decoded_blocks": decoded, "total_blocks": total}
