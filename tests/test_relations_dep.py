"""Grammar catalog validation, word sketch fan-out, dependency joins,
KWIC concordances."""

import json

import pytest
from pyspark.sql import functions as F

from word_sketch_lucene_spark.functions.tokenize import explode_tokens, tokens_expr
from word_sketch_lucene_spark.index.stats import term_stats
from word_sketch_lucene_spark.operators.dependency import (
    annotate_tokens,
    dependency_pairs,
    dependency_sketch,
)
from word_sketch_lucene_spark.plans.relations import GrammarCatalog, word_sketch
from word_sketch_lucene_spark.query.concordance import (
    concordance_page,
    dedup_examples,
    find_hits,
    find_phrase_hits,
)


def test_catalog_loads_and_validates():
    cat = GrammarCatalog.load()
    assert len(cat.relations) >= 30
    assert len(cat.surface()) >= 18 and len(cat.dep()) >= 12
    assert cat.by_id["adj_modifier"].colloc_class == "ADJ"
    assert any(r.pattern for r in cat.surface())  # BCQL pattern relations
    assert any(r.dual for r in cat.surface())


@pytest.mark.parametrize("bad,msg", [
    ([{"id": "x", "name": "n"}], "missing"),
    ([{"id": "x", "name": "n", "type": "SURFACE"},
      {"id": "x", "name": "n2", "type": "SURFACE"}], "duplicate"),
    ([{"id": "x", "name": "n", "type": "WEIRD"}], "bad type"),
    ([{"id": "x", "name": "n", "type": "DEP"}], "deprel"),
])
def test_catalog_validation_errors(tmp_path, bad, msg):
    p = tmp_path / "rel.json"
    p.write_text(json.dumps(bad))
    with pytest.raises(ValueError, match=msg):
        GrammarCatalog.load(p)


def test_word_sketch_fanout(spark, docs_small):
    from word_sketch_lucene_spark.plans.relations import sketch_branches

    tokens = explode_tokens(docs_small)
    ts = term_stats(tokens)
    cat = GrammarCatalog.load()
    sk = word_sketch(tokens, ts, "table", cat, limit_per_relation=5)
    rows = sk.collect()
    rels = {r["relation"] for r in rows}
    allowed = ({b.id for b in sketch_branches(cat, "table")}
               | {r.id for r in cat.surface() if r.pattern})
    assert rels <= allowed
    assert {"adj_modifier", "near_5", "pred_adj"} <= rels
    # dual mirrors fire for a NOUN head (noun plays the collocate role)
    assert "object_of_strict~of" in rels and "det_noun~of" in rels
    # per-relation cap respected
    for rel in rels:
        assert sum(1 for r in rows if r["relation"] == rel) <= 5


def test_dual_mirror_semantics(spark):
    """Golden: det_noun is DET→NOUN ordered; its ~of mirror for a NOUN
    head must count determiners PRECEDING the noun within the gap."""
    df = spark.createDataFrame([(0, "the table scan the fast table")],
                               ["doc_id", "text"])
    toks = explode_tokens(df)
    sk = word_sketch(toks, term_stats(toks), "table", GrammarCatalog.load(),
                     limit_per_relation=10)
    rows = {(r["relation"], r["colloc_term"]): r["pair_freq"]
            for r in sk.collect()}
    # 'table' at pos 1 (the@0, gap 1) and pos 5 (the@3, gap 2) → freq 2
    assert rows[("det_noun~of", "the")] == 2
    # forward branch must NOT fire for a NOUN head (det_noun head is DET)
    assert not any(r == "det_noun" for r, _ in rows)


def test_annotate_deterministic_and_shaped(spark, docs_small):
    ann = annotate_tokens(explode_tokens(docs_small))
    r = ann.filter((F.col("doc_id") == 0) & (F.col("sent_id") == 0)).orderBy(
        "token_id").collect()
    assert r[0]["token_id"] == 1 and r[0]["head_id"] == 0  # sentence root
    assert all(x["head_id"] == x["token_id"] - 1 for x in r)
    assert {x["deprel"] for x in r} <= {"det", "amod", "nsubj", "conj", "dep"}


def test_dependency_pairs_structure(spark, docs_small):
    ann = annotate_tokens(explode_tokens(docs_small))
    pairs = dependency_pairs(ann)
    # every dependent with head_id>0 joins exactly one governor
    n_dep = ann.filter(F.col("head_id") > 0).count()
    assert pairs.count() == n_dep


def test_dependency_sketch_runs_and_ranked(spark, docs_small):
    tokens = explode_tokens(docs_small)
    ann = annotate_tokens(tokens)
    ts = term_stats(tokens)
    sk = dependency_sketch(ann, ts, "table", "nsubj", limit=10).collect()
    assert sk, "expected nsubj dependents of 'table'"
    scores = [r["logdice"] for r in sk]
    assert scores == sorted(scores, reverse=True)


def test_concordance_page_golden(spark):
    docs = [(0, "a b target c d e"), (1, "x target y")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    tokens = explode_tokens(df)
    docstore = df.select("doc_id", tokens_expr("text").alias("tokens"))
    hits = find_hits(tokens, "target")
    assert hits.count() == 2
    page = concordance_page(hits, docstore, offset=0, page_size=10,
                            context=2).collect()
    assert (page[0]["left"], page[0]["kw"], page[0]["right"]) == ("a b", "target", "c d")
    assert (page[1]["left"], page[1]["kw"], page[1]["right"]) == ("x", "target", "y")
    # pagination window
    p2 = concordance_page(hits, docstore, offset=1, page_size=1, context=2).collect()
    assert len(p2) == 1 and p2[0]["rank"] == 2


def test_phrase_hits(spark):
    docs = [(0, "the quick brown fox"), (1, "quick brown shoes"),
            (2, "quick red brown")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    tokens = explode_tokens(df)
    hits = find_phrase_hits(tokens, ["quick", "brown"]).collect()
    assert {(h["doc_id"], h["pos"]) for h in hits} == {(0, 1), (1, 0)}


def test_dedup_examples(spark):
    df = spark.createDataFrame(
        [("s1",), ("s1",), ("s2",), ("s3",)], ["kw_context"])
    assert dedup_examples(df, max_examples=2).count() == 2
