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
    description: str = ""
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


def word_sketch(
    tokens: DataFrame,
    term_stats: DataFrame,
    head_term: str,
    catalog: GrammarCatalog,
    limit_per_relation: int = 20,
    min_logdice: float = 0.0,
    round_dp: int | None = None,
) -> DataFrame:
    """V1 full word sketch: every SURFACE relation's ranked collocates,
    unioned with a ``relation`` literal column and executed as ONE job —
    Spark's scheduler replaces the reference's bounded thread pool
    (``SketchHandlers.java:48-49,227-230``; SURVEY §3.1 trace)."""
    from ..operators.collocation import collocates_for_head

    parts = []
    for rel in catalog.surface():
        c = collocates_for_head(
            tokens, term_stats, head_term,
            min_gap=rel.min_gap, max_gap=rel.max_gap, ordered=rel.ordered,
            min_logdice=min_logdice, limit=limit_per_relation,
            colloc_filter=rel.colloc_filter(), round_dp=round_dp,
        ).withColumn("relation", F.lit(rel.id))
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("relation", "colloc_term", "pair_freq", "logdice", "rel_freq")
