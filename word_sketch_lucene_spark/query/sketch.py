"""Index-side word sketches: the reference's interactive serving model.

The reference serves every sketch from the prebuilt index — BCQL
relation patterns run as Lucene span queries, hits group by the lemma
forward index, logDice ranks the collocates
(``SketchHandlers.java:127-143`` → ``CollocateQueryHelper``). This
module reproduces that loop over the engine's own artifacts:

- relation pattern → :meth:`IndexSearcher.pattern_matches` (per-layer
  positional postings, full constraint-position capture);
- collocate identity at the labeled position via the FORWARD layer
  store (``build_conllu_index`` writes doc → lemma array);
- stats from the layer term dictionary (``layer_cf``) — no corpus scan
  anywhere.

The DataFrame path (``plans.relations.word_sketch_patterns``) is the
batch/oracle-checked twin; a pytest pins rank-and-score identity
between the two.
"""

from __future__ import annotations

import math
from collections import Counter

from ..plans.cql import (
    DEFAULT_LAYERS,
    TokenItem,
    parse_cql,
    substitute_at_position,
)
from ..plans.relations import GrammarCatalog, RelationConfig, pattern_pos_group


def _logdice(fab: float, fa: float, fb: float) -> float:
    """Python twin of ``functions.scoring.logdice_expr``."""
    return max(0.0, math.log2(2.0 * fab / (fa + fb)) + 14.0)


def _round(x: float, dp: int | None) -> float:
    return x if dp is None else round(x, dp)


def relation_collocates(
    searcher,
    head: str,
    rel: RelationConfig,
    subst_attr: str = "lemma",
    colloc_attr: str = "lemma",
    min_logdice: float = 0.0,
    limit: int = 20,
    round_dp: int | None = None,
    max_terms_per_slot: int = 256,
    within_sentence: bool = False,
) -> list[tuple[str, int, float, float]]:
    """One relation's ranked collocates, fully index-side:
    ``[(colloc_term, pair_freq, logdice, rel_freq)]``.

    Counting unit = distinct (doc, head-pos, colloc-pos) — identical to
    ``plans.cql.pattern_collocates``. ``within_sentence`` constrains
    matches (and dual slop windows) to one sentence.
    """
    items = parse_cql(rel.pattern)
    token_items = [it for it in items if isinstance(it, TokenItem)]
    labels = {it.label for it in token_items if it.label}
    layer = DEFAULT_LAYERS[subst_attr]
    if rel.dual and "2" not in labels:
        pairs = _dual_window_pairs(searcher, head, rel, layer,
                                   max_terms_per_slot,
                                   within_sentence=within_sentence)
    else:
        hi, ci = rel.head_position - 1, rel.colloc_position - 1
        subst = substitute_at_position(items, head, rel.head_position,
                                       attr=subst_attr)
        matches = searcher.pattern_matches(subst, max_terms_per_slot,
                                           within_sentence=within_sentence)
        pairs = {(d, row[hi], row[ci]) for d, row in matches}
    if not pairs:
        return []
    fw = searcher.forward_layer(sorted({d for d, _, _ in pairs}),
                                DEFAULT_LAYERS[colloc_attr])
    counts: Counter[str] = Counter()
    for d, _hp, cp in pairs:
        arr = fw.get(d)
        if arr is not None and 0 <= cp < len(arr):
            counts[arr[cp]] += 1
    if not counts:
        return []
    cf = searcher.layer_cf(DEFAULT_LAYERS[colloc_attr],
                           sorted(counts) + [head])
    head_cf = cf.get(head, 0)
    if head_cf == 0:
        return []
    scored = []
    for value, fab in counts.items():
        fb = cf.get(value)
        if fb is None:
            continue
        # filter on the UNROUNDED score, round for output — the plan
        # tier's (score_collocate_pairs) order of operations
        ld = _logdice(fab, head_cf, fb)
        if ld < min_logdice:
            continue
        rf = _round(fab / head_cf, round_dp)
        scored.append((value, fab, _round(ld, round_dp), rf))
    scored.sort(key=lambda r: (-r[2], r[0]))
    return scored[:limit]


def _dual_window_pairs(searcher, head: str, rel: RelationConfig,
                       head_layer: str, max_terms_per_slot: int,
                       within_sentence: bool = False) -> set:
    """Dual single-position relation: collocate constraint within
    ``default_slop`` tokens of the head, either side (the DataFrame
    twin's slop-window branch)."""
    import numpy as np

    from ..plans.cql import _steps

    items = [it for it in parse_cql(rel.pattern)
             if isinstance(it, TokenItem)]
    citem = items[rel.head_position - 1]
    heads = searcher._postings_with_positions(head, head_layer)
    (allowed, _ban), = searcher._slot_maps(
        _steps([citem]), max_terms_per_slot)
    docs = sorted(set(heads) & set(allowed))
    sents = (searcher.forward_layer(docs, "sent_no")
             if within_sentence else None)
    pairs = set()
    for d in docs:
        hp = np.asarray(heads[d], dtype=np.int64)
        cp = np.asarray(allowed[d], dtype=np.int64)
        diff = np.abs(cp[None, :] - hp[:, None])
        ok = (diff >= 1) & (diff <= rel.default_slop)
        if within_sentence and len(sents.get(d, [])):
            s = np.asarray(sents[d], dtype=np.int64)
            ok &= s[hp][:, None] == s[cp][None, :]
        ii, jj = np.nonzero(ok)
        pairs.update((d, int(hp[i]), int(cp[j])) for i, j in zip(ii, jj))
    return pairs


def layer_stats_df(searcher, layer: str):
    """One layer's term dictionary as a ``(term, cf)`` DataFrame —
    the stats side every sketch scorer joins, served from the index's
    own ``layer_stats`` dataset (no corpus scan)."""
    from pyspark.sql import functions as F

    if layer == "term":
        return searcher.term_stats.select("term", "cf")
    searcher._require_layers()
    return (searcher.layer_stats.filter(F.col("layer") == layer)
            .select(F.col("value").alias("term"), "cf"))


def index_word_sketch_distributed(
    searcher,
    head: str,
    catalog: GrammarCatalog,
    head_pos: str | None = None,
    subst_attr: str = "lemma",
    colloc_attr: str = "lemma",
    limit_per_relation: int = 10,
    min_logdice: float = 0.0,
    round_dp: int | None = None,
    relation_types: tuple[str, ...] = ("SURFACE",),
    within_sentence: bool = False,
):
    """The full sketch fan-out as a DISTRIBUTED plan over the index's
    OWN artifacts — no corpus scan, no driver-resident postings:

    - token table = ``posexplode`` of the ``forward_layers`` store
      (``IndexSearcher.forward_token_table`` — doc-partitioned parquet,
      shards with the corpus);
    - collocate stats = the ``layer_stats`` dictionary
      (:func:`layer_stats_df`);
    - pattern execution/scoring = the ordinary CQL positional-join
      fan-out (``plans.relations.word_sketch_patterns``).

    Returns the same DataFrame shape as ``word_sketch_patterns``; a
    pytest pins row identity with :func:`index_word_sketch` (the
    in-driver span-chain path). This is the 100×-corpus serving shape:
    peak driver memory is O(collocate rows) — the span-chain path keeps
    sub-second warm latency on a pinned hot set, this path keeps the
    cold/huge-head case executor-side (the scale split the reference
    never needs at one node, ``BlackLabQueryExecutor.java:117-144``).
    """
    from ..plans.cql import effective_test, strip_constraints
    from ..plans.relations import pattern_pos_group, word_sketch_patterns

    # request only the layer arrays this fan-out tests/captures — the
    # posexplode consumes whole arrays, so an unrequested layer is a
    # scan column saved (arrays_zip blocks Catalyst pruning)
    need = {"term", DEFAULT_LAYERS[subst_attr], DEFAULT_LAYERS[colloc_attr]}
    if within_sentence:
        need.add("sent_no")

    def _need_attr(a: str) -> None:
        need.add("term" if a == "class" else DEFAULT_LAYERS.get(a, a))

    for rel in catalog.relations:
        if not rel.pattern or rel.type not in relation_types:
            continue
        if head_pos is not None and pattern_pos_group(rel) != head_pos:
            continue
        core, cons = strip_constraints(rel.pattern)
        for c in cons:
            _need_attr(c.attr_a)
            _need_attr(c.attr_b)
        for it in parse_cql(core):
            for t in getattr(it, "tests", ()):
                _need_attr(effective_test(t).attr)
            for group in getattr(it, "alts", None) or ():
                for t in group:
                    _need_attr(effective_test(t).attr)
    tokens = searcher.forward_token_table(columns=need)
    if tokens is None or DEFAULT_LAYERS[subst_attr] not in tokens.columns:
        raise NotImplementedError(
            "index has no forward_layers store — build with "
            "index.build.build_conllu_index(store_docstore=True)")
    stats = layer_stats_df(searcher, DEFAULT_LAYERS[colloc_attr])
    return word_sketch_patterns(
        tokens, stats, head, catalog, head_pos=head_pos,
        subst_attr=subst_attr, colloc_attr=colloc_attr,
        limit_per_relation=limit_per_relation, min_logdice=min_logdice,
        round_dp=round_dp, relation_types=relation_types,
        within_sentence=within_sentence)


def index_relation_collocates(
    searcher,
    query,
    colloc_attr: str = "lemma",
    min_logdice: float = 0.0,
    limit: int = 20,
    round_dp: int | None = None,
    max_terms_per_slot: int = 256,
    df_budget: int = 500_000,
) -> list[tuple[str, int, float]]:
    """BCQL relation query → ranked dependent collocates, fully
    index-side: ``[(dep_term, pair_freq, logdice)]`` — the serving twin
    of ``operators.dependency.relation_query_collocates`` (identical
    counting unit: one governor→dependent match = one pair), the
    reference's ``queryAndRankDepCollocates``
    (``BlackLabQueryExecutor.java:231-244``). Match resolution
    auto-routes: in-driver forward-array resolver under the Σcf
    budget, distributed dependency join over the forward token table
    above it (``IndexSearcher.relation_matches_auto``)."""
    from ..plans.cql import parse_relation_query

    rq = parse_relation_query(query) if isinstance(query, str) else query
    if rq is None:
        raise ValueError(f"not a relation query: {query!r}")
    head = next((t.value.replace("\\", "") for t in rq.source.tests
                 if t.attr in ("lemma", "word", "term") and not t.negated
                 and t.is_literal), None)
    if head is None:
        raise ValueError("relation-query collocates need a literal "
                         "lemma/word test on the source operand")
    layer = DEFAULT_LAYERS[colloc_attr]
    if searcher.relation_route_distributed(rq, max_terms_per_slot,
                                           df_budget):
        # hot slots: matches AND collocate identity in ONE distributed
        # plan (per-doc forward pulls would cost O(corpus) driver-side)
        from pyspark.sql import functions as F

        counts = Counter({r["colloc"]: r["n"] for r in
                          searcher.relation_join_df(rq, dep_capture=colloc_attr)
                          .groupBy("colloc")
                          .agg(F.count("*").alias("n")).collect()})
    else:
        matches = searcher.relation_matches(rq, max_terms_per_slot)
        fw = searcher.forward_layer(sorted({d for d, _, _ in matches}),
                                    layer)
        counts = Counter()
        for d, _gp, dp in matches:
            arr = fw.get(d)
            if arr is not None and 0 <= dp < len(arr):
                counts[arr[dp]] += 1
    if not counts:
        return []
    cf = searcher.layer_cf(layer, sorted(counts) + [head])
    head_cf = cf.get(head, 0)
    if head_cf == 0:
        return []
    scored = []
    for value, fab in counts.items():
        fb = cf.get(value)
        if fb is None:
            continue
        ld = _logdice(fab, head_cf, fb)
        if ld < min_logdice:
            continue
        scored.append((value, fab, _round(ld, round_dp)))
    scored.sort(key=lambda r: (-r[2], r[0]))
    return scored[:limit]


def index_word_sketch(
    searcher,
    head: str,
    catalog: GrammarCatalog,
    head_pos: str | None = None,
    subst_attr: str = "lemma",
    colloc_attr: str = "lemma",
    limit_per_relation: int = 10,
    min_logdice: float = 0.0,
    round_dp: int | None = None,
    relation_types: tuple[str, ...] = ("SURFACE",),
    max_terms_per_slot: int = 256,
    within_sentence: bool = False,
    use_store: bool | str = "auto",
) -> list[tuple[str, str, int, float, float]]:
    """Full word sketch SERVED FROM THE INDEX: every applicable pattern
    relation's ranked collocates —
    ``[(relation, colloc_term, pair_freq, logdice, rel_freq)]`` — no
    corpus scan, interactive latency (warm postings/dictionary caches).
    Same fan-out, filters, and counting as
    ``plans.relations.word_sketch_patterns``.

    ``use_store="auto"`` (default): when a MATERIALIZED collocation
    store exists at this root with a compatible configuration
    (``index.colloc_store`` — the reference's precomputed
    ``collocations.bin`` tier), serve from it instead of running the
    pattern fan-out: one pruned per-head scan on first touch, pure
    cached scoring after — row-identical output, orders of magnitude
    cheaper warm. ``False`` forces the live span-chain fan-out;
    ``True`` requires the store (raises when absent/incompatible).
    """
    if use_store:
        from ..index.colloc_store import serve_sketch_cached, store_can_serve

        compatible = store_can_serve(
            searcher, catalog, subst_attr=subst_attr,
            colloc_attr=colloc_attr, within_sentence=within_sentence,
            relation_types=relation_types)
        if use_store is True and not compatible:
            raise NotImplementedError(
                "use_store=True but no compatible collocation store at "
                "this root — index.colloc_store.build_collocation_store")
        if compatible:
            return serve_sketch_cached(
                searcher, head, catalog, head_pos=head_pos,
                colloc_attr=colloc_attr,
                limit_per_relation=limit_per_relation,
                min_logdice=min_logdice, round_dp=round_dp,
                relation_types=relation_types)
    rels = [r for r in catalog.relations
            if r.pattern and r.type in relation_types]
    if head_pos is not None:
        rels = [r for r in rels if pattern_pos_group(r) == head_pos]
    out = []
    for rel in rels:
        for row in relation_collocates(
                searcher, head, rel, subst_attr=subst_attr,
                colloc_attr=colloc_attr, min_logdice=min_logdice,
                limit=limit_per_relation, round_dp=round_dp,
                max_terms_per_slot=max_terms_per_slot,
                within_sentence=within_sentence):
            out.append((rel.id, *row))
    return out
