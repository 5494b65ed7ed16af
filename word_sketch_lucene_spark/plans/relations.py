"""Grammar-relation catalog: declarative BCQL-style relations → plans.

Reference parity (U2): the reference loads 69 JSON relations
(``grammars/relations.json:1-553``) with fields ``id, name, type
(SURFACE|DEP), pattern, head/collocate labels, default_slop, dual``,
validated with hard errors on duplicates/missing fields
(``config/GrammarConfigLoader.java:84-221``). Here each relation is a
parameterized DataFrame plan template: token-class predicates replace
the BCQL token constraints (P1), slop maps to the window join (J2),
DEP-typed relations compile to the dependency join (J3).

The catalog ships in ``grammars/relations.json`` at the repo root —
same declarative shape, engine-appropriate predicates.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_CATALOG = Path(__file__).resolve().parents[2] / "grammars" / "relations.json"

# word classes for the synthetic/driver corpora (the engine analog of
# xpos constraints like [xpos="NN.*"]; a real deployment generates these
# from the tagger — tag_with_stanza.py upstream in the reference)
WORD_CLASSES: dict[str, str] = {
    **dict.fromkeys(
        ["table", "row", "column", "key", "value", "data", "line", "part",
         "customer", "order", "group", "window", "hash", "batch", "stream",
         "vector", "query", "spark"], "NOUN"),
    **dict.fromkeys(
        ["scan", "merge", "join", "sort", "filter", "agg", "dup"], "VERB"),
    **dict.fromkeys(["fast", "slow", "small", "big"], "ADJ"),
    **dict.fromkeys(["the", "a"], "DET"),
}


def word_class_expr(col: Column) -> Column:
    """Deterministic word-class column (CASE chain — JVM-side, and
    reproducible in the DuckDB oracle as the same CASE expression)."""
    expr = F.lit("X")
    # build reverse: chain WHENs per class
    by_class: dict[str, list[str]] = {}
    for w, c in WORD_CLASSES.items():
        by_class.setdefault(c, []).append(w)
    out = F.when(col.isin(by_class["NOUN"]), F.lit("NOUN"))
    out = out.when(col.isin(by_class["VERB"]), F.lit("VERB"))
    out = out.when(col.isin(by_class["ADJ"]), F.lit("ADJ"))
    out = out.when(col.isin(by_class["DET"]), F.lit("DET"))
    return out.otherwise(expr)


@dataclass
class RelationConfig:
    """One declarative relation (``config/RelationConfig.java:21-33``)."""

    id: str
    name: str
    type: str  # SURFACE | DEP
    head_class: str | None = None
    colloc_class: str | None = None
    min_gap: int = 1
    max_gap: int = 5
    ordered: bool = False
    deprel: str | None = None  # DEP relations
    dual: bool = False
    pattern: str | None = None  # BCQL pattern (labeled 1:/2:) — compiled
    description: str = ""      # via plans.cql instead of the window join
    extra: dict = field(default_factory=dict)

    def head_filter(self) -> Column | None:
        if not self.head_class:
            return None
        return word_class_expr(F.col("head_term")) == self.head_class

    def colloc_filter(self) -> Column | None:
        if not self.colloc_class:
            return None
        return word_class_expr(F.col("colloc_term")) == self.colloc_class


class GrammarCatalog:
    """Loads + validates the relation catalog (hard errors on duplicate
    ids / missing fields / bad types — ``GrammarConfigLoader.java:150-221``)."""

    REQUIRED = {"id", "name", "type"}

    def __init__(self, relations: list[RelationConfig]):
        self.relations = relations
        self.by_id = {r.id: r for r in relations}

    @classmethod
    def load(cls, path: str | Path = DEFAULT_CATALOG) -> "GrammarCatalog":
        raw = json.loads(Path(path).read_text())
        if not isinstance(raw, list):
            raise ValueError("relations catalog must be a JSON array")
        seen: set[str] = set()
        rels = []
        for i, obj in enumerate(raw):
            missing = cls.REQUIRED - obj.keys()
            if missing:
                raise ValueError(f"relation #{i}: missing fields {sorted(missing)}")
            if obj["id"] in seen:
                raise ValueError(f"duplicate relation id: {obj['id']}")
            if obj["type"] not in ("SURFACE", "DEP"):
                raise ValueError(f"relation {obj['id']}: bad type {obj['type']}")
            if obj["type"] == "DEP" and not obj.get("deprel"):
                raise ValueError(f"relation {obj['id']}: DEP requires deprel")
            lo = obj.get("min_gap", 1)
            hi = obj.get("max_gap", 5)
            # ordered gaps may be negative (collocate before head) but a
            # range spanning 0 would match the head position itself
            if lo > hi or lo <= 0 <= hi:
                raise ValueError(
                    f"relation {obj['id']}: bad gap range [{lo},{hi}] "
                    f"(must not span 0; negative = before the head)")
            if obj.get("pattern"):
                # hard error on unparseable patterns at load time, like
                # the reference's GrammarConfigLoader (fail fast, not at
                # query time); labels 1:/2: must both be present
                from .cql import TokenItem, parse_cql

                items = parse_cql(obj["pattern"])
                labels = {it.label for it in items
                          if isinstance(it, TokenItem) and it.label}
                if not {"1", "2"} <= labels:
                    raise ValueError(
                        f"relation {obj['id']}: pattern needs 1: and 2: labels")
            seen.add(obj["id"])
            known = {f for f in RelationConfig.__dataclass_fields__ if f != "extra"}
            rels.append(RelationConfig(
                **{k: v for k, v in obj.items() if k in known},
                extra={k: v for k, v in obj.items() if k not in known},
            ))
        return cls(rels)

    def surface(self) -> list[RelationConfig]:
        return [r for r in self.relations if r.type == "SURFACE"]

    def dep(self) -> list[RelationConfig]:
        return [r for r in self.relations if r.type == "DEP"]


@dataclass
class SketchBranch:
    """One executable branch of a word sketch for a concrete head word.

    ``reversed=True`` is the mirrored side of a ``dual`` relation — the
    head word plays the relation's collocate role (Sketch Engine's
    "X_of" mirror; the reference's ``dual`` flag), so the gap direction
    flips for ordered patterns and the collocate takes the head class.
    """

    id: str
    colloc_class: str | None
    min_gap: int
    max_gap: int
    ordered: bool
    reversed: bool = False


def sketch_branches(catalog: GrammarCatalog, head_term: str
                    ) -> list[SketchBranch]:
    """Branches applicable to this head word: relations whose head-class
    constraint the head satisfies, plus the mirrored branch of each
    ``dual`` relation whose COLLOCATE class the head satisfies. Shared
    by the Spark plan and the DuckDB oracle generator so both engines
    enumerate identically."""
    wc = WORD_CLASSES.get(head_term, "X")
    out = []
    for rel in catalog.surface():
        if rel.pattern:
            continue  # pattern relations compile via plans.cql instead
        if rel.head_class in (None, wc):
            out.append(SketchBranch(rel.id, rel.colloc_class,
                                    rel.min_gap, rel.max_gap, rel.ordered))
        # mirrored dual branch: the head word plays the COLLOCATE role.
        # Skipped when it would duplicate the forward branch (unordered
        # with identical class constraints on both ends).
        mirror_dupes = (not rel.ordered
                        and rel.head_class == rel.colloc_class)
        if rel.dual and rel.colloc_class in (None, wc) and not mirror_dupes:
            out.append(SketchBranch(f"{rel.id}~of", rel.head_class,
                                    rel.min_gap, rel.max_gap, rel.ordered,
                                    reversed=True))
    return out


def word_sketch(
    tokens: DataFrame,
    term_stats: DataFrame,
    head_term: str,
    catalog: GrammarCatalog,
    limit_per_relation: int = 20,
    min_logdice: float = 0.0,
    round_dp: int | None = None,
) -> DataFrame:
    """V1 full word sketch: every applicable SURFACE relation's ranked
    collocates in ONE job (``SketchHandlers.java:48-49,227-230``).

    Plan shape (one scan, not one per relation): a single window join
    at the catalog-wide max slop builds the head's pair table once;
    each pair row then explodes into the relation ids it satisfies
    (gap/order/class predicates as an ``array_compact`` of CASEs —
    pure Catalyst), one groupBy counts (relation, collocate), ONE join
    fetches collocate stats, and a per-relation ``row_number`` window
    takes the top-k. N relations cost N cheap predicates, not N scans
    and N stats joins.
    """
    from pyspark.sql import Window

    from ..functions.scoring import logdice_expr, rel_freq_expr

    branches = sketch_branches(catalog, head_term)
    pattern_rels = [r for r in catalog.surface() if r.pattern]
    if not branches and not pattern_rels:
        return tokens.sparkSession.createDataFrame(
            [], "relation string, colloc_term string, pair_freq long, "
                "logdice double, rel_freq double")
    if pattern_rels:
        # each pattern branch joins 2-3 filtered token projections AND a
        # stats lookup; without materialization every branch re-derives
        # term_stats (a full-corpus aggregate) and re-scans the token
        # table — persist both once (term_stats is vocab-sized; tokens
        # is the already-exploded working set). Tracked: the session
        # owner releases via caching.release_all() after the action.
        from ..caching import persist_tracked

        tokens = persist_tracked(tokens)
        term_stats = persist_tracked(term_stats)
    from ..operators.proximity import window_pairs

    # ordered gaps may be NEGATIVE (collocate strictly BEFORE the head,
    # the reference's `2:[...] 1:[...]` direction); the shared pair
    # window covers every branch as |gap| ∈ [1, max|bound|]
    if branches:
        coverage = max(max(abs(b.min_gap), abs(b.max_gap))
                       for b in branches)
    else:
        coverage = 1
    pairs = window_pairs(tokens, 1, coverage, ordered=False,
                         head_filter=F.col("head_term") == head_term)
    gap = F.col("colloc_pos") - F.col("head_pos")
    whens = []
    for br in branches:
        if br.ordered:
            g = -gap if br.reversed else gap
            c = (g >= br.min_gap) & (g <= br.max_gap)
        else:
            c = (F.abs(gap) >= br.min_gap) & (F.abs(gap) <= br.max_gap)
        if br.colloc_class:
            c = c & (word_class_expr(F.col("colloc_term")) == br.colloc_class)
        whens.append(F.when(c, F.lit(br.id)))
    counted = (
        pairs.select(
            "colloc_term",
            F.explode(F.array_compact(F.array(*whens))).alias("relation"))
        .groupBy("relation", "colloc_term")
        .agg(F.count("*").alias("pair_freq"))
    )
    head_cf = term_stats.filter(F.col("term") == head_term).select(
        F.col("cf").alias("head_cf"))
    scored = (
        counted.join(term_stats.select(
            F.col("term").alias("colloc_term"),
            F.col("cf").alias("colloc_cf")), "colloc_term")
        .crossJoin(F.broadcast(head_cf))
        .withColumn("logdice", logdice_expr(
            F.col("pair_freq").cast("double"),
            F.col("head_cf").cast("double"),
            F.col("colloc_cf").cast("double")))
        .withColumn("rel_freq", rel_freq_expr(
            F.col("pair_freq").cast("double"),
            F.col("head_cf").cast("double")))
        .filter(F.col("logdice") >= F.lit(min_logdice))
    )
    if round_dp is not None:
        scored = scored.withColumn("logdice", F.round("logdice", round_dp)) \
                       .withColumn("rel_freq", F.round("rel_freq", round_dp))
    w = Window.partitionBy("relation").orderBy(
        F.desc("logdice"), F.asc("colloc_term"))
    out = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= limit_per_relation)
        .select("relation", "colloc_term", "pair_freq", "logdice", "rel_freq")
    ) if branches else None
    # pattern relations (BCQL-defined, e.g. copula shapes) compile via
    # the CQL positional-join chain; each is its own bounded branch
    for rel in pattern_rels:
        from .cql import pattern_collocates

        b = pattern_collocates(
            tokens, term_stats, rel.pattern, head_term,
            min_logdice=min_logdice, limit=limit_per_relation,
            round_dp=round_dp,
        ).select(F.lit(rel.id).alias("relation"), "colloc_term",
                 "pair_freq", "logdice", "rel_freq")
        out = b if out is None else out.unionByName(b)
    return out
