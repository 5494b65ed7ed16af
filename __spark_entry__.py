"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k on sf0.001.
``queries()``    — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query for the driver's
row-count / schema / value-hash comparison at sf0.01.

Float contract: every float column is rounded to 4 dp on both sides,
and ordering keys for LIMIT queries use the rounded value plus a
deterministic tie-break, so cutoffs agree across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from word_sketch_lucene_spark import oracle_sql as osql
from word_sketch_lucene_spark.functions.tokenize import doc_lengths, explode_tokens
from word_sketch_lucene_spark.index.stats import term_stats
from word_sketch_lucene_spark.operators.collocation import collocates_for_head
from word_sketch_lucene_spark.operators.dependency import (
    annotate_tokens,
    dependency_sketch,
)
from word_sketch_lucene_spark.operators.exploration import (
    common_collocates,
    seed_collocates,
)
from word_sketch_lucene_spark.operators.proximity import adjacent_pairs
from word_sketch_lucene_spark.operators.textqc import FP_MOD, FP_MUL
from word_sketch_lucene_spark.plans.relations import GrammarCatalog, word_sketch
from word_sketch_lucene_spark.query.concordance import concordance_page, find_hits
from word_sketch_lucene_spark.query.engine import bm25_topk_df
from word_sketch_lucene_spark.sources.pages import (
    BOILERPLATE_PREFIXES as _BOILERPLATE_PREFIXES,
)

FLAGSHIP_TERMS = ["spark", "join"]


def _en_catalog():
    from word_sketch_lucene_spark.plans.relations import EN_CATALOG

    return GrammarCatalog.load(EN_CATALOG)


def _wsdef_catalog(skip_unary: bool = True):
    from word_sketch_lucene_spark.plans.wsdef import parse_wsdef

    return parse_wsdef(WSDEF_GRAMMAR, skip_unary=skip_unary)
POSTINGS_TERMS = ["spark", "customer", "vector"]
SKETCH_HEAD = "table"
SEEDS = ["table", "row", "column"]


BM25_DOC_FILTER = "lang = 'en' AND source LIKE 'src1%'"


def q_bm25_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered BM25 (Lucene filter-query semantics): the
    candidate set restricts to pages passing a metadata predicate via a
    semi-join on the column-pruned metadata scan; collection statistics
    stay corpus-level."""
    return bm25_topk_df(_docs(spark, sf_dir), FLAGSHIP_TERMS, k=10,
                        round_dp=4, doc_filter=BM25_DOC_FILTER)


def q_bm25_index_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INDEX path of the metadata filter: the predicate resolves
    against the build-time ``doc_meta`` store and masks the decoded
    postings (cache stays filter-agnostic) — same oracle as the
    DataFrame twin."""
    from word_sketch_lucene_spark.query.engine import IndexSearcher

    searcher = IndexSearcher(spark, _contract_index_root(spark, sf_dir))
    hits, _ = searcher.search(FLAGSHIP_TERMS, k=30,
                              doc_filter=BM25_DOC_FILTER)
    rows = sorted(((d, round(s, 4)) for d, s in hits),
                  key=lambda x: (-x[1], x[0]))[:10]
    from word_sketch_lucene_spark.query.engine import bounded_rows_df

    return bounded_rows_df(
        spark, [(int(d), float(s)) for d, s in rows],
        "doc_id long, score double", ["doc_id", "score"])


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# annotate→render→reparse is the expensive part of the CoNLL-U contract
# queries; the PARSED table is shared across dep_sketch_conllu /
# dep_sketch_catalog / word_sketch_conllu (each derives its shape by a
# cheap projection). localCheckpoint (not persist): survives
# catalog.clearCache() between bench queries and truncates the 3-stage
# lineage; blocks are freed by the ContextCleaner on GC.
_PARSED_CACHE: dict[tuple[str, str], DataFrame] = {}
CONLLU_SENT_LEN = 10


def _parsed_conllu(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    parsed = _PARSED_CACHE.get(key)
    if parsed is None:
        from word_sketch_lucene_spark.operators.dependency import rule_annotate
        from word_sketch_lucene_spark.sources.conllu import (
            parse_conllu_docs,
            to_conllu_text,
        )

        toks = explode_tokens(_docs(spark, sf_dir))
        conllu = to_conllu_text(rule_annotate(toks, sent_len=CONLLU_SENT_LEN))
        parsed = parse_conllu_docs(conllu).localCheckpoint(eager=True)
        _PARSED_CACHE[key] = parsed
    return parsed


def _annotated_conllu(spark: SparkSession, sf_dir: str) -> DataFrame:
    from word_sketch_lucene_spark.operators.dependency import (
        annotated_from_conllu,
    )

    return annotated_from_conllu(_parsed_conllu(spark, sf_dir))


# --------------------------------------------------------------- queries
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: BM25 top-10 (W1 TakeOrderedAndProject; A3/A4/J4 analogs)."""
    return bm25_topk_df(_docs(spark, sf_dir), FLAGSHIP_TERMS, k=10, round_dp=4)


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-term df/cf — the reference's stats.tsv as one aggregate."""
    return term_stats(explode_tokens(_docs(spark, sf_dir)))


def q_term_posdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+: per-term POS distribution (the reference stats.tsv posDist
    column) in the same single aggregation pass as df/cf."""
    from word_sketch_lucene_spark.index.stats import term_stats_posdist

    return term_stats_posdist(explode_tokens(_docs(spark, sf_dir)))


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: collection stats (N, total tokens, avgdl) for BM25.

    avgdl is computed as half-up integer division at 4 dp scale
    (``(total·2e4 + n) div (2n) / 1e4``) so the value is bit-identical
    across engines — ``avg()`` + ``round()`` of doubles can land on a
    .00005 boundary where Spark (HALF_UP on shortest-repr) and DuckDB
    (half-away on the scaled double) disagree.
    """
    dl = doc_lengths(explode_tokens(_docs(spark, sf_dir)))
    agg = dl.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    )
    return agg.select(
        "n_docs", "total_tokens",
        (F.expr("(total_tokens * 20000 + n_docs) div (2 * n_docs)")
         / F.lit(10000.0)).alias("avgdl"),
    )


def q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer (U1/S1 analog): per-doc token counts."""
    return doc_lengths(explode_tokens(_docs(spark, sf_dir)))


def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: top-20 terms by collection frequency, tie-break term asc."""
    return (
        explode_tokens(_docs(spark, sf_dir))
        .groupBy("term").agg(F.count("*").alias("cf"))
        .orderBy(F.desc("cf"), F.asc("term")).limit(20)
    )


def q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list build (S3 analog): (term, doc, tf, position summary)."""
    toks = explode_tokens(_docs(spark, sf_dir)).filter(
        F.col("term").isin(POSTINGS_TERMS))
    return toks.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"),
        F.min("pos").alias("first_pos"),
        F.max("pos").alias("last_pos"),
    )


def q_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 span adjacency join → top-20 bigrams."""
    return (
        adjacent_pairs(explode_tokens(_docs(spark, sf_dir)))
        .groupBy("head_term", "colloc_term")
        .agg(F.count("*").alias("pair_freq"))
        .orderBy(F.desc("pair_freq"), F.asc("head_term"), F.asc("colloc_term"))
        .limit(20)
    )


def q_colloc_logdice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A4+J2+J4: logDice-ranked collocates of one head (the
    reference's per-relation sketch core)."""
    toks = explode_tokens(_docs(spark, sf_dir))
    return collocates_for_head(toks, term_stats(toks), "spark",
                               min_gap=1, max_gap=2, ordered=False,
                               limit=20, round_dp=4)


def q_word_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1 full word sketch: all SURFACE relations, one unioned job."""
    toks = explode_tokens(_docs(spark, sf_dir))
    return word_sketch(toks, term_stats(toks), SKETCH_HEAD,
                       GrammarCatalog.load(), limit_per_relation=10,
                       round_dp=4)


def q_word_sketch_verb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1 with a VERB head: exercises the mirrored ``dual`` branches
    (verb_object~of, subject_of~of, …) — the head as collocate role."""
    toks = explode_tokens(_docs(spark, sf_dir))
    return word_sketch(toks, term_stats(toks), "join",
                       GrammarCatalog.load(), limit_per_relation=10,
                       round_dp=4)


def q_dep_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 dependency sketch (CLI blacklab-query analog, stub annotation)."""
    toks = explode_tokens(_docs(spark, sf_dir))
    return dependency_sketch(annotate_tokens(toks), term_stats(toks),
                             SKETCH_HEAD, "nsubj", limit=20, round_dp=4)


def q_dep_sketch_conllu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 over REAL CoNLL-U layers: rule-annotate → render CoNLL-U text
    → parse with the production parser → route (lemma, upos, head,
    deprel) into the dependency join. The oracle computes the same
    layers directly, so a match proves the text+parser round trip AND
    the layer routing."""
    ann = _annotated_conllu(spark, sf_dir)
    lemma_stats = ann.groupBy("term").agg(F.count("*").alias("cf"))
    return dependency_sketch(ann, lemma_stats, SKETCH_HEAD, "amod",
                             limit=20, round_dp=4)


def q_dep_sketch_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-driven DEP relation with CLASS constraints on both ends
    (reference dep_nsubj: 2:[NN.*&deprel=nsubj] 1:[VB.*]) over the
    CoNLL-U-routed layers."""
    from word_sketch_lucene_spark.operators.dependency import (
        dependency_sketch_catalog,
    )

    ann = _annotated_conllu(spark, sf_dir)
    lemma_stats = ann.groupBy("term").agg(F.count("*").alias("cf"))
    rel = GrammarCatalog.load().by_id["dep_nsubj"]
    return dependency_sketch_catalog(ann, lemma_stats, "scan", rel,
                                     limit=20, round_dp=4)


def q_word_sketch_conllu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1 over REAL CoNLL-U layers with the ported 69-relation English
    catalog: SURFACE relations with xpos/lemma constraints (reference
    grammars/relations.json patterns) run by the CQL compiler against
    the parsed lemma/xpos columns — head_pos=NOUN mirrors the
    reference's ?head_pos= relation filter."""
    from word_sketch_lucene_spark.plans.relations import (
        EN_CATALOG,
        word_sketch_patterns,
    )
    from word_sketch_lucene_spark.sources.conllu import layer_tokens

    lt = layer_tokens(_parsed_conllu(spark, sf_dir),
                      sent_len=CONLLU_SENT_LEN)
    lemma_stats = lt.groupBy(F.col("lemma").alias("term")) \
        .agg(F.count("*").alias("cf"))
    return word_sketch_patterns(
        lt, lemma_stats, SKETCH_HEAD, GrammarCatalog.load(EN_CATALOG),
        head_pos="NOUN", limit_per_relation=10, round_dp=4)


WSDEF_GRAMMAR = """\
*DEFAULTATTR tag

=modifiers of "%w"
*UNIMAP wmod
\t2:"JJ" [tag="DT"]{0,1} 1:"NN.*"
\t2:"JJ" [tag="JJ"|word="very"]{0,2} 1:"NN.*"

*DUAL
=objects of "%w"/verbs with "%w" as object
*UNIMAP wobj/wobj_of
\t1:"VB" [tag="DT"|word="the"]{0,2} 2:"NN.*"

=coordination of "%w"
*UNIMAP wcoord
*SYMMETRIC
\t1:"(NN|VB)" []{0,1} 2:"(NN|VB)" & 1.tag = 2.tag

*TRINARY
="%w" %(3.lemma) ...
*UNIMAP wvia
\t1:"NN.*" 3:"VB" [tag="DT"]{0,1} 2:"NN.*"

*UNARY
=before a verb
*UNIMAP wverbal
\t1:"NN.*" [tag="DT"]{0,1} "VB"

*UNARY
=determined
*UNIMAP wdet
\t"DT" []{0,1} 1:"NN.*"
"""


def q_word_sketch_wsdef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full word sketch from a Sketch-Engine ``.wsdef`` GRAMMAR FILE
    (the reference ships its original SkE grammars beside the JSON
    catalog — grammars/penn_3.1_en.txt): the loader compiles DUAL /
    SYMMETRIC sections, bare default-attr tokens, optional-token
    quantifiers, cross-attr ``|`` and ``& 1.tag = 2.tag`` constraints
    into the same catalog shape, and the fan-out runs them through the
    interval-DP compiler. Multi-line relations union under one id
    before the count — SkE gramrel semantics."""
    from word_sketch_lucene_spark.plans.relations import (
        word_sketch_patterns,
    )
    from word_sketch_lucene_spark.plans.wsdef import parse_wsdef
    from word_sketch_lucene_spark.sources.conllu import layer_tokens

    lt = layer_tokens(_parsed_conllu(spark, sf_dir),
                      sent_len=CONLLU_SENT_LEN)
    lemma_stats = lt.groupBy(F.col("lemma").alias("term")) \
        .agg(F.count("*").alias("cf"))
    return word_sketch_patterns(
        lt, lemma_stats, SKETCH_HEAD, parse_wsdef(WSDEF_GRAMMAR),
        limit_per_relation=10, round_dp=4)


def q_word_sketch_unary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-Engine UNARY gramrels ('in passive'-style): the wsdef
    grammar's *UNARY sections loaded with ``skip_unary=False``, served
    as per-relation head match frequencies — one unioned compile, one
    count-distinct aggregate."""
    from word_sketch_lucene_spark.plans.relations import unary_counts
    from word_sketch_lucene_spark.plans.wsdef import parse_wsdef
    from word_sketch_lucene_spark.sources.conllu import layer_tokens

    lt = layer_tokens(_parsed_conllu(spark, sf_dir),
                      sent_len=CONLLU_SENT_LEN)
    return unary_counts(lt, parse_wsdef(WSDEF_GRAMMAR,
                                        skip_unary=False), SKETCH_HEAD)


def q_word_sketch_dep_conllu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EN catalog's DEP relations (adjacency patterns with deprel
    constraints, e.g. ``1:[xpos="VB.*"] 2:[xpos="NN.*" & deprel="obj"]``)
    run over the parsed CoNLL-U deprel layer — VERB-headed fan-out, the
    reference's /api/sketch/{lemma}/dep per-relation model."""
    from word_sketch_lucene_spark.plans.relations import word_sketch_patterns
    from word_sketch_lucene_spark.sources.conllu import layer_tokens

    lt = layer_tokens(_parsed_conllu(spark, sf_dir),
                      sent_len=CONLLU_SENT_LEN)
    lemma_stats = lt.groupBy(F.col("lemma").alias("term")) \
        .agg(F.count("*").alias("cf"))
    return word_sketch_patterns(
        lt, lemma_stats, "scan", _en_catalog(), head_pos="VERB",
        relation_types=("DEP",), limit_per_relation=10, round_dp=4)


def q_multiseed_common(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO1/A7/A8 multi-seed intersection (explore-multi endpoint)."""
    toks = explode_tokens(_docs(spark, sf_dir))
    per_seed = seed_collocates(toks, term_stats(toks), SEEDS,
                               limit_per_seed=50, min_gap=1, max_gap=2,
                               ordered=False, round_dp=4)
    return common_collocates(per_seed, min_shared=2, round_dp=4)


def q_boilerplate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 raw-text boilerplate filter over the documents table."""
    from word_sketch_lucene_spark.sources.pages import (
        BOILERPLATE_PREFIXES,
        boilerplate_filter,
    )

    kept = boilerplate_filter(_docs(spark, sf_dir))
    return kept.select("doc_id", F.length("text").alias("n_chars"))


def q_relation_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 per-relation totals: Σ pair_freq of a ranked collocate table
    (SketchHandlers.java:134-135 analog)."""
    from word_sketch_lucene_spark.operators.collocation import relation_totals

    return relation_totals(q_colloc_logdice(spark, sf_dir))


def q_core_collocates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 core collocates: shared by ≥ max(2, ceil(n/3)) seeds,
    engine-stable scaled-integer averaging."""
    from word_sketch_lucene_spark.operators.exploration import core_collocates

    toks = explode_tokens(_docs(spark, sf_dir))
    per_seed = seed_collocates(toks, term_stats(toks), SEEDS,
                               limit_per_seed=50, min_gap=1, max_gap=2,
                               ordered=False, round_dp=4)
    return core_collocates(per_seed, n_nouns=len(SEEDS), round_dp=4)


def q_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2+W6+J5 paginated KWIC over the forward index."""
    docs = _docs(spark, sf_dir)
    from word_sketch_lucene_spark.functions.tokenize import tokens_expr

    toks = explode_tokens(docs)
    docstore = docs.select("doc_id", tokens_expr("text").alias("tokens"))
    page = concordance_page(find_hits(toks, "spark"), docstore,
                            offset=0, page_size=10, context=3)
    return page.select("rank", "doc_id", "pos",
                       F.col("left").alias("left_ctx"), "kw",
                       F.col("right").alias("right_ctx"))


def q_concordance_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KWIC page SORTED BY RIGHT CONTEXT (BlackLab's hit-sort modes):
    the context text is the ranking key, so every hit's window
    materializes before the bounded top-k — the documented cost of
    context sorting, still ≤ page-size rows on the driver."""
    docs = _docs(spark, sf_dir)
    from word_sketch_lucene_spark.functions.tokenize import tokens_expr

    toks = explode_tokens(docs)
    docstore = docs.select("doc_id", tokens_expr("text").alias("tokens"))
    page = concordance_page(find_hits(toks, "spark"), docstore,
                            offset=0, page_size=10, context=3,
                            sort="right")
    return page.select("rank", "doc_id", "pos",
                       F.col("left").alias("left_ctx"), "kw",
                       F.col("right").alias("right_ctx"))


# ---------------------------------------------- training-data pipeline ops
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups by content digest (hash-groupBy)."""
    return (
        _docs(spark, sf_dir)
        .select(F.md5("text").alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keeper"))
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (inverted-shingle blocking,
    hot-shingle df cap — the web-scale quadratic guard)."""
    from word_sketch_lucene_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.1,
                               round_dp=4, max_shingle_df=100)


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from word_sketch_lucene_spark.operators.textqc import token_counts

    return token_counts(_docs(spark, sf_dir))


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from word_sketch_lucene_spark.operators.textqc import quality_features

    return quality_features(_docs(spark, sf_dir), round_dp=4)


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from word_sketch_lucene_spark.operators.textqc import lang_id

    return lang_id(_docs(spark, sf_dir))


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from word_sketch_lucene_spark.operators.textqc import fingerprints

    return fingerprints(_docs(spark, sf_dir))


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the exact ANN baseline)."""
    from word_sketch_lucene_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return cosine_topk(emb, queries, k=10, round_dp=4)


def q_cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (the LSH tier's oracle)."""
    from word_sketch_lucene_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )

    # The exact tier is O(n²·d) by definition — bound it to the first
    # 2000 vectors (a no-op at the sf0.01 contract scale; at larger SF
    # the LSH/IVF tiers are the scale path). Synthetic embeddings are
    # near-orthogonal (max pair cosine ~0.51) — 0.4 yields real pairs.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .filter(F.col("vec_id") < 2000)
    return cosine_near_dup_pairs(emb, threshold=0.4, round_dp=4)


def q_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic cells + n_probe search — the scale path,
    oracle-checked because the centroid choice is deterministic."""
    from word_sketch_lucene_spark.operators.similarity import ivf_cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return ivf_cosine_topk(emb, queries, k=10, n_centroids=8, n_probe=2,
                           round_dp=4)


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dups, ORACLE-CHECKED end to end (md5-LE shingle
    keys — ``md5_number_upper`` in DuckDB reproduces them exactly; the
    affine-permutation signatures, band candidates, and capped-Jaccard
    verify are all recomputed SQL-side from first principles)."""
    from word_sketch_lucene_spark.operators.dedup import minhash_near_dups

    return minhash_near_dups(_docs(spark, sf_dir), threshold=0.1,
                             num_hashes=64, bands=16, max_shingle_df=100,
                             shingle_hash="md5le", round_dp=4)


def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash pairs closed into duplicate CLUSTERS (distributed
    large-star/small-star connected components) with the per-cluster
    dedup decision; the oracle recomputes the pair set in SQL and
    closes it with a recursive CTE, so the cluster labels themselves
    are verified."""
    from word_sketch_lucene_spark.operators.components import (
        near_dup_clusters)
    from word_sketch_lucene_spark.operators.dedup import minhash_near_dups

    pairs = minhash_near_dups(_docs(spark, sf_dir), threshold=0.1,
                              num_hashes=64, bands=16, max_shingle_df=100,
                              shingle_hash="md5le", round_dp=4)
    return (near_dup_clusters(pairs)
            .withColumn("keep", F.col("keep").cast("int")))


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups, ORACLE-CHECKED: the oracle recomputes the
    bit-vote signatures and applies the all-pairs Hamming filter (the
    pigeonhole block join is lossless ≤ d, so the pair sets agree)."""
    from word_sketch_lucene_spark.operators.dedup import simhash_near_dups

    return simhash_near_dups(_docs(spark, sf_dir), max_hamming=6)


def q_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN, ORACLE-CHECKED end to end: the deterministic
    plane matrix, sign-bit buckets, multiprobe set, and rounded-cosine
    ranking are all recomputed SQL-side — the oracle reproduces the
    APPROXIMATE result, misses included."""
    from word_sketch_lucene_spark.operators.similarity import lsh_cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return lsh_cosine_topk(emb, queries, k=10, n_planes=6, round_dp=4)


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: synthetic binary payloads → parsed metadata."""
    from word_sketch_lucene_spark.operators.multimodal import (
        extract_media_meta,
        generate_media,
    )

    return extract_media_meta(generate_media(spark, 200, seed=3))


def q_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 collocate profile comparison (variance, commonality,
    distinctiveness) across the seed set."""
    from word_sketch_lucene_spark.operators.exploration import profile_stats

    toks = explode_tokens(_docs(spark, sf_dir))
    per_seed = seed_collocates(toks, term_stats(toks), SEEDS,
                               limit_per_seed=50, min_gap=1, max_gap=2,
                               ordered=False, round_dp=4)
    return profile_stats(per_seed, n_seeds=len(SEEDS), round_dp=4)


def q_topk_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window demo on the generic events table: top-3 events per
    user by value (W-class row_number capability)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "event_id", "event_type",
                F.round("value", 4).alias("value"), "rk")
    )


def q_bm25_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SEGMENT-INDEX path (build → block-max WAND) checked against
    the SAME SQL oracle as the DataFrame path: proves the compressed
    index + kernel reproduce first-principles BM25 end to end.

    The index builds into a per-sf cache dir; stage manifests make
    re-runs no-ops.
    """
    from word_sketch_lucene_spark.query.engine import IndexSearcher

    searcher = IndexSearcher(spark, _contract_index_root(spark, sf_dir))
    hits, _ = searcher.search(FLAGSHIP_TERMS, k=30, mode="auto")
    # adopt the oracle's rounded ordering contract before the cutoff
    rows = sorted(((d, round(s, 4)) for d, s in hits),
                  key=lambda x: (-x[1], x[0]))[:10]
    from word_sketch_lucene_spark.query.engine import bounded_rows_df

    return bounded_rows_df(
        spark, [(int(d), float(s)) for d, s in rows],
        "doc_id long, score double", ["doc_id", "score"])


# annotator revision — part of the cached contract-index identity: the
# stage manifests fingerprint INPUT FILES + build config, but not the
# in-code annotation rules, so an annotator change (r5: real FEATS
# values) must relocate the cached roots or they serve stale layers
_ANNOTATOR_REV = "r5feats1"


def _contract_index_root(spark: SparkSession, sf_dir: str):
    """Per-sf cached index dir (stage manifests make re-builds no-ops)."""
    import hashlib
    import tempfile
    from pathlib import Path

    from word_sketch_lucene_spark.index.build import build_index

    tag = hashlib.sha1(f"{sf_dir}:{_ANNOTATOR_REV}".encode()) \
        .hexdigest()[:10]
    root = Path(tempfile.gettempdir()) / f"wsl_contract_idx_{tag}"
    # docstore kept: the term forward arrays serve index-side
    # exploration (multiseed_common_index) and the hot-pattern fallback
    build_index(spark, _docs(spark, sf_dir), root, store_docstore=True,
                input_paths=[f"{sf_dir}/documents.parquet"])
    return root


CQL_HITS_PATTERN = '1:[word="sp.*"] []{0,2} 2:[word="(join|table|group|row)"]'
CQL_COLLOC_PATTERN = '1:[word="[a-z0-9]+"] []{0,2} 2:[word!="the|a"]'
# multi-layer index-side pattern: xpos constraints + a negated surface
# test + a bounded gap, served from layer postings (V9 index path)
CQL_LAYERS_PATTERN = '[xpos="JJ.*"] []{0,1} [xpos="NN.*" & word!="table"]'
# FEATS layer end-to-end (r5): UD-style morphology values from the
# annotator, rendered to CoNLL-U col 6, parsed back, layer-indexed,
# queried as BCQL slots on BOTH positions (reference
# conllu-sentences.blf.yaml:18-74 indexes feats as a searchable field)
CQL_FEATS_PATTERN = '[feats="Number=Sing"] []{0,1} [feats="VerbForm=Fin"]'
# BlackLab span-filter operator: sentence spans holding (or, !containing,
# NOT holding) a full match of the clause — the dual of `within <s/>`
CQL_CONTAINING_PATTERN = (
    '<s/> containing [xpos="JJ.*"] []{0,1} [xpos="NN.*" & word!="table"]')
CQL_NOT_CONTAINING_PATTERN = (
    '<s/> !containing [upos="NOUN"]')


def q_cql_hits_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V9 INDEX-side mini-BCQL: the same pattern as ``cql_hits`` executed
    by ``IndexSearcher.pattern_hits`` (term-dictionary expansion →
    positional postings → gap chaining), oracle-checked against the
    first-principles SQL span join — proves the compressed positional
    index reproduces the DataFrame compiler span for span."""
    from word_sketch_lucene_spark.query.engine import IndexSearcher

    from word_sketch_lucene_spark.query.engine import bounded_rows_df

    s = IndexSearcher(spark, _contract_index_root(spark, sf_dir))
    spans = s.pattern_hits(CQL_HITS_PATTERN)
    return bounded_rows_df(
        spark, [(int(d), int(a), int(b)) for d, a, b in spans],
        "doc_id long, start long, end long", ["doc_id", "start", "end"])


def q_cql_layers_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-LAYER index-side CQL: xpos/negation pattern served from the
    layer postings (``build_layer_postings``) of the parsed CoNLL-U
    corpus — the reference's five-parallel-Lucene-fields model
    (conllu-sentences.blf.yaml:18-74) as one prefixed-key dataset."""
    from word_sketch_lucene_spark.index.build import build_layer_postings
    from word_sketch_lucene_spark.query.engine import IndexSearcher
    from word_sketch_lucene_spark.sources.conllu import layer_tokens

    root = _contract_index_root(spark, sf_dir)
    lt = layer_tokens(_parsed_conllu(spark, sf_dir),
                      sent_len=CONLLU_SENT_LEN) \
        .withColumn("doc_id", F.col("doc_id").cast("long"))
    build_layer_postings(spark, lt, root,
                         input_paths=[f"{sf_dir}/documents.parquet"])
    from word_sketch_lucene_spark.query.engine import bounded_rows_df

    s = IndexSearcher(spark, root)
    spans = s.pattern_hits(CQL_LAYERS_PATTERN)
    return bounded_rows_df(
        spark, [(int(d), int(a), int(b)) for d, a, b in spans],
        "doc_id long, start long, end long", ["doc_id", "start", "end"])


def q_cql_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FEATS-layer BCQL served from the INDEX layer postings: the
    morphology slot (``[feats="Number=Plur"]``) expands through the
    feats term dictionary and chains with the xpos slot — the full
    CoNLL-U col-6 round trip (annotate → render → parse → index →
    query), oracled against the same first-principles layer CTE as
    ``cql_layers_index``."""
    from word_sketch_lucene_spark.query.engine import IndexSearcher

    root = _contract_conllu_index_root(spark, sf_dir)
    s = IndexSearcher(spark, root)
    spans = s.pattern_hits(CQL_FEATS_PATTERN)
    # the conllu index assigns DENSE ids (sorted doc_name); map back to
    # the corpus ids the oracle sees via the index's own doc_names table
    from word_sketch_lucene_spark.query.engine import bounded_rows_df

    id2name = {int(r["doc_id"]): int(r["doc_name"]) for r in
               spark.read.parquet(str(root / "doc_names")).collect()}
    return bounded_rows_df(
        spark, [(id2name[int(d)], int(a), int(b)) for d, a, b in spans],
        "doc_id long, start long, end long", ["doc_id", "start", "end"])


def q_cql_containing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BlackLab's ``<s/> containing PATTERN`` span filter on the
    DataFrame path: sentence extents semi-joined with the distinct
    sentences holding a full within-sentence match (BlackLab span
    queries compose the indexed ``<s>`` spans,
    ``conllu-sentences.blf.yaml:16``, with ``containing``)."""
    from word_sketch_lucene_spark.plans.cql import (
        sentence_spans_containing,
    )
    from word_sketch_lucene_spark.sources.conllu import layer_tokens

    lt = layer_tokens(_parsed_conllu(spark, sf_dir),
                      sent_len=CONLLU_SENT_LEN) \
        .withColumn("doc_id", F.col("doc_id").cast("long"))
    return (sentence_spans_containing(lt, CQL_CONTAINING_PATTERN)
            .withColumn("sent_no", F.col("sent_no").cast("long")))


def q_cql_not_containing_index(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """``<s/> !containing PATTERN`` served from the INDEX forward
    layers — the complement anti-join runs as a distributed plan over
    the index's own forward store (never a driver span list: the
    complement is O(corpus) sentences)."""
    from word_sketch_lucene_spark.query.engine import IndexSearcher

    root = _contract_conllu_index_root(spark, sf_dir)
    s = IndexSearcher(spark, root)
    out = s.sentence_spans_containing(CQL_NOT_CONTAINING_PATTERN)
    # the conllu index assigns DENSE ids (sorted doc_name); map back to
    # corpus ids via the index's doc_names table (broadcast: one row
    # per document NAME, not per token)
    names = spark.read.parquet(str(root / "doc_names")).select(
        F.col("doc_id").alias("_idx_id"),
        F.col("doc_name").cast("long").alias("corpus_doc_id"))
    return (out.withColumnRenamed("doc_id", "_idx_id")
            .join(F.broadcast(names), "_idx_id")
            .select(F.col("corpus_doc_id").alias("doc_id"),
                    F.col("sent_no").cast("long").alias("sent_no"),
                    "start", "end"))


def q_cql_hits_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED pattern search (BlackLab's subcorpus use case:
    CQL restricted to documents passing a metadata predicate): the
    doc_meta store resolves the predicate and the span route applies it
    on whichever tier runs (semi-join in-plan / driver mask)."""
    from word_sketch_lucene_spark.query.engine import IndexSearcher

    s = IndexSearcher(spark, _contract_index_root(spark, sf_dir))
    return s.pattern_spans_df(CQL_HITS_PATTERN,
                              doc_filter=BM25_DOC_FILTER)


def q_cql_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V9/P1 mini-BCQL: labeled constraint sequence with a bounded gap
    compiled to chained positional joins (the POST /api/bcql analog)."""
    from word_sketch_lucene_spark.plans.cql import compile_cql

    return compile_cql(explode_tokens(_docs(spark, sf_dir)), CQL_HITS_PATTERN)


def q_cql_group_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BlackLab "group hits" frequency list over the DataFrame path:
    every distinct match of the shared BCQL pattern grouped by its hit
    text, ranked by hit count."""
    from word_sketch_lucene_spark.plans.cql import group_pattern_hits

    return group_pattern_hits(explode_tokens(_docs(spark, sf_dir)),
                              CQL_HITS_PATTERN, k=20)


def q_cql_group_freq_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INDEX-served twin: spans from the routed pattern tier, hit
    text from the forward store, grouping in-plan — only 20 rows reach
    the driver. Same oracle as ``cql_group_freq``."""
    from word_sketch_lucene_spark.query.engine import IndexSearcher

    s = IndexSearcher(spark, _contract_index_root(spark, sf_dir))
    return s.group_pattern_hits(CQL_HITS_PATTERN, k=20)


CQL_CONSTRAINT_PATTERN = \
    '1:[word=".*"] [] 2:[word=".*"] & 1.word = 2.word'


def q_cql_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-slot constraint (the Sketch-Engine grammar's
    ``& 1.tag = 2.tag`` construct / BlackLab's ``::`` global
    constraint): word reduplication at distance 2 — the constraint
    compiles to a column equality Catalyst folds into the join."""
    from word_sketch_lucene_spark.plans.cql import compile_cql

    return compile_cql(explode_tokens(_docs(spark, sf_dir)),
                       CQL_CONSTRAINT_PATTERN)


def q_cql_constraint_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INDEX-served twin: constrained patterns route to the
    forward-store distributed compile (layer values at matched
    positions come from capture columns; the positional span chain is
    guarded). Spans-only shape, same span set."""
    from word_sketch_lucene_spark.query.engine import IndexSearcher

    s = IndexSearcher(spark, _contract_index_root(spark, sf_dir))
    return s.pattern_spans_df(CQL_CONSTRAINT_PATTERN)


def q_cql_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic hit sample (BlackLab's ``sample`` request
    parameter, reproducible variant): uniform over the pattern's
    distinct spans via a per-span content hash; the top-n heap is the
    only shuffle-free bound the plan needs."""
    from word_sketch_lucene_spark.plans.cql import compile_cql
    from word_sketch_lucene_spark.query.docs import sample_spans

    spans = compile_cql(explode_tokens(_docs(spark, sf_dir)),
                        CQL_HITS_PATTERN, keep_terms=False)
    return sample_spans(spans.select("doc_id", "start", "end"),
                        25, seed=7)


def q_cql_sample_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INDEX-served twin: spans from the routed pattern tier,
    sampling in-plan — ≤ n rows reach the driver on every route. Same
    oracle as ``cql_sample``."""
    from word_sketch_lucene_spark.query.engine import IndexSearcher

    s = IndexSearcher(spark, _contract_index_root(spark, sf_dir))
    return s.sample_pattern_hits(CQL_HITS_PATTERN, 25, seed=7)


def q_docs_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOCS view (BlackLab ``/docs?group=field:...``): documents with
    ≥1 hit of the shared pattern, grouped by ``(lang, source)`` with
    doc and hit counts — facet cardinality bounds the result."""
    from word_sketch_lucene_spark.plans.cql import compile_cql
    from word_sketch_lucene_spark.query.docs import docs_facets

    docs = _docs(spark, sf_dir)
    spans = compile_cql(explode_tokens(docs), CQL_HITS_PATTERN,
                        keep_terms=False)
    return docs_facets(spans.select("doc_id", "start", "end"),
                       docs.select("doc_id", "lang", "source"),
                       ("lang", "source"))


def q_docs_facets_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INDEX-served DOCS view: spans from the routed tier, facets
    from the build-time ``doc_meta`` store. Same oracle as
    ``docs_facets``."""
    from word_sketch_lucene_spark.query.engine import IndexSearcher

    s = IndexSearcher(spark, _contract_index_root(spark, sf_dir))
    return s.docs_group_by(CQL_HITS_PATTERN, ("lang", "source"))


KEYWORDS_PREDICATE = "lang <> 'en'"


def q_keywords_g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subcorpus keyword extraction (Dunning G² keyness): terms of the
    non-English subcorpus vs the rest — one conditional aggregate, the
    flag attached BEFORE the token explode so no doc-level join."""
    from word_sketch_lucene_spark.operators.keywords import (
        subcorpus_keywords)

    return subcorpus_keywords(_docs(spark, sf_dir),
                              KEYWORDS_PREDICATE, k=20)


def q_keywords_g2_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDEX-served twin: flag from the doc_meta store, occurrences
    from the forward token table, same G² tail — same oracle."""
    from word_sketch_lucene_spark.query.engine import IndexSearcher

    s = IndexSearcher(spark, _contract_index_root(spark, sf_dir))
    return s.subcorpus_keywords(KEYWORDS_PREDICATE, k=20)


def q_cql_collocates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollocateQueryHelper analog: lemma substituted into the 1: label,
    negated collocate constraint, distinct-pair counting, logDice rank."""
    from word_sketch_lucene_spark.plans.cql import pattern_collocates

    toks = explode_tokens(_docs(spark, sf_dir))
    return pattern_collocates(toks, term_stats(toks), CQL_COLLOC_PATTERN,
                              head="spark", limit=20, round_dp=4)


def q_multiseed_common_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO1/A7/A8 exploration SERVED FROM THE INDEX (term postings +
    forward-array stored-hit windows + dictionary stats —
    ``query/explore.py``), checked against the SAME first-principles
    SQL oracle as the DataFrame path: proves the serving tier computes
    the exact multi-seed intersection, not an approximation of it."""
    from word_sketch_lucene_spark.query.engine import IndexSearcher
    from word_sketch_lucene_spark.query.explore import (
        index_common_collocates,
        index_seed_collocates,
    )

    s = IndexSearcher(spark, _contract_index_root(spark, sf_dir))
    per_seed = index_seed_collocates(s, SEEDS, limit_per_seed=50,
                                     min_gap=1, max_gap=2, ordered=False,
                                     round_dp=4)
    rows = index_common_collocates(per_seed, min_shared=2, round_dp=4)
    from word_sketch_lucene_spark.query.engine import bounded_rows_df

    return bounded_rows_df(
        spark, [(t, int(sb), int(tf), float(mx), float(av), float(sm))
                for t, sb, tf, mx, av, sm in rows],
        "colloc_term string, shared_by long, total_freq long, "
        "max_logdice double, avg_logdice double, sum_logdice double",
        ["colloc_term", "shared_by", "total_freq", "max_logdice",
         "avg_logdice", "sum_logdice"])


def q_cql_deprel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V9 BCQL dependency-relation OPERATOR (``[lemma="scan"] -nsubj->
    _`` — ``BlackLabQueryExecutor.java:211-229``): parsed by
    ``plans.cql.parse_relation_query``, executed as the sentence-co-
    keyed governor→dependent join over the parsed CoNLL-U layers,
    logDice-ranked — the arbitrary-query surface for dependency
    relations (the catalog/dependency_sketch API is the other route to
    the same machinery)."""
    from word_sketch_lucene_spark.operators.dependency import (
        relation_query_collocates,
    )

    parsed = _parsed_conllu(spark, sf_dir)
    lemma_stats = parsed.groupBy(F.lower("lemma").alias("term")) \
        .agg(F.count("*").alias("cf"))
    return relation_query_collocates(
        parsed, lemma_stats, '[lemma="scan"] -nsubj-> _',
        limit=20, round_dp=4)


_CONLLU_IDX_CACHE: dict[str, object] = {}


def _contract_conllu_index_root(spark: SparkSession, sf_dir: str):
    """Per-sf cached FULL CoNLL-U index (layer postings + forward
    layers); stage manifests make re-builds no-ops."""
    import hashlib
    import tempfile
    from pathlib import Path

    from word_sketch_lucene_spark.index.build import build_conllu_index

    tag = hashlib.sha1(f"{sf_dir}:{_ANNOTATOR_REV}".encode()) \
        .hexdigest()[:10]
    root = Path(tempfile.gettempdir()) / f"wsl_contract_cidx_{tag}"
    key = str(root)
    if key not in _CONLLU_IDX_CACHE:
        build_conllu_index(spark, _parsed_conllu(spark, sf_dir), root,
                           input_paths=[f"{sf_dir}/documents.parquet"])
        _CONLLU_IDX_CACHE[key] = True
    return root


def q_word_sketch_index_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1 word sketch served from the INDEX as a DISTRIBUTED plan
    (forward_layers posexplode + layer_stats dictionary — no corpus
    scan, no driver-resident postings): the 100×-corpus serving route,
    oracle-checked against the same first-principles SQL as the
    DataFrame fan-out."""
    from word_sketch_lucene_spark.query.engine import IndexSearcher
    from word_sketch_lucene_spark.query.sketch import (
        index_word_sketch_distributed,
    )

    s = IndexSearcher(spark, _contract_conllu_index_root(spark, sf_dir))
    return index_word_sketch_distributed(
        s, SKETCH_HEAD, _en_catalog(), head_pos="NOUN",
        limit_per_relation=10, round_dp=4)


def q_word_sketch_wsdef_index(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The wsdef-grammar sketch served from the INDEX as a distributed
    plan: same Sketch-Engine catalog (optional tokens via interval-DP,
    mixed-attr `|`, `& 1.tag = 2.tag`), token table from the
    forward_layers store pruned to the grammar's tested layers,
    stats from the layer dictionary. Same oracle as
    ``word_sketch_wsdef``."""
    from word_sketch_lucene_spark.query.engine import IndexSearcher
    from word_sketch_lucene_spark.query.sketch import (
        index_word_sketch_distributed,
    )

    s = IndexSearcher(spark, _contract_conllu_index_root(spark, sf_dir))
    return index_word_sketch_distributed(
        s, SKETCH_HEAD, _wsdef_catalog(), limit_per_relation=10,
        round_dp=4)


_COLLOC_STORE_CACHE: dict[str, bool] = {}


def q_word_sketch_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1 word sketch served from the MATERIALIZED collocation store
    (the reference's precomputed ``collocations.bin`` tier,
    ``CLAUDE.md:190-196``): build-time all-heads pair counts →
    pruned per-head scan → shared scoring tail. Hash-identical to
    ``word_sketch_conllu`` by construction — same counting unit, same
    stats, same ranking — proving the store IS the live aggregate."""
    from word_sketch_lucene_spark.index.colloc_store import (
        build_collocation_store,
        sketch_from_store,
    )
    from word_sketch_lucene_spark.query.engine import IndexSearcher

    root = _contract_conllu_index_root(spark, sf_dir)
    s = IndexSearcher(spark, root)
    if str(root) not in _COLLOC_STORE_CACHE:
        build_collocation_store(s, _en_catalog())
        _COLLOC_STORE_CACHE[str(root)] = True
    return sketch_from_store(s, SKETCH_HEAD, _en_catalog(),
                             head_pos="NOUN", limit_per_relation=10,
                             round_dp=4)


def q_relation_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relation-query KWIC off the index artifacts (r5): dependency
    matches of ``[lemma="scan"] -nsubj-> _`` as concordance lines —
    governor→dependent keyword span, docstore contexts, deterministic
    (doc, pos, width) rank; auto-routed like every relation query."""
    from word_sketch_lucene_spark.query.concordance import (
        index_relation_concordance,
    )
    from word_sketch_lucene_spark.query.engine import IndexSearcher

    root = _contract_conllu_index_root(spark, sf_dir)
    s = IndexSearcher(spark, root)
    # rank in CORPUS-id space (the index's dense ids are
    # partition-order-dependent): the doc_names dimension maps before
    # paging, inside the plan
    id_map = spark.read.parquet(str(root / "doc_names")).select(
        "doc_id", F.col("doc_name").cast("long").alias("ext_id"))
    page = index_relation_concordance(s, '[lemma="scan"] -nsubj-> _',
                                      page_size=10, context=3,
                                      doc_id_map=id_map)
    return page.select("rank", "doc_id", "pos",
                       F.col("left").alias("left_ctx"), "kw",
                       F.col("right").alias("right_ctx"))


def q_cql_deprel_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INDEX-SERVED twin of ``cql_deprel`` (deprel postings +
    structural forward arrays, auto-routed to the distributed
    dependency join when the deprel slot is hot), checked against the
    SAME first-principles SQL oracle — proves the serving tier, not
    just the DataFrame compile, reproduces relation-query semantics."""
    from word_sketch_lucene_spark.query.engine import IndexSearcher
    from word_sketch_lucene_spark.query.sketch import (
        index_relation_collocates,
    )

    s = IndexSearcher(spark, _contract_conllu_index_root(spark, sf_dir))
    rows = index_relation_collocates(s, '[lemma="scan"] -nsubj-> _',
                                     limit=20, round_dp=4)
    from word_sketch_lucene_spark.query.engine import bounded_rows_df

    return bounded_rows_df(
        spark, [(t, int(f), float(ld)) for t, f, ld in rows],
        "dep_term string, pair_freq long, logdice double",
        ["dep_term", "pair_freq", "logdice"])


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def _scoped(fn: Callable[[SparkSession, str], DataFrame]
            ) -> Callable[[SparkSession, str], DataFrame]:
    """Release the PREVIOUS query's tracked caches before building the
    next plan — the driver's harness runs the 40 contract queries in
    one session without cache hygiene of its own, and leaked persists
    would accumulate across queries (worst case evicting each other).
    Safe because unpersist only ever forces recompute, never changes
    results, and the prior query's action has completed by the time the
    next query is built."""
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from word_sketch_lucene_spark.caching import release_all

        release_all()
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER (r6): the 18 queries that sat beyond the driver gate's
    # 50-entry cap every round (cql_feats / cql_containing /
    # cql_not_containing_index / near_dup_clusters / media_meta had
    # never had a driver-green row) now sit at positions 33-50, inside
    # the cap; the original first 32 stay first so the session's
    # JIT/codegen warm-up lands on the same queries as every prior
    # round's numbers. Names, implementations, oracles unchanged.
    return {name: _scoped(fn) for name, fn in {
        "bm25_topk": q_bm25_topk,
        "bm25_index_topk": q_bm25_index_topk,
        "bm25_filtered": q_bm25_filtered,
        "bm25_index_filtered": q_bm25_index_filtered,
        "term_stats": q_term_stats,
        "term_posdist": q_term_posdist,
        "corpus_stats": q_corpus_stats,
        "doc_lengths": q_doc_lengths,
        "top_terms": q_top_terms,
        "postings": q_postings,
        "bigram_counts": q_bigram_counts,
        "colloc_logdice": q_colloc_logdice,
        "word_sketch": q_word_sketch,
        "word_sketch_verb": q_word_sketch_verb,
        "dep_sketch": q_dep_sketch,
        "dep_sketch_conllu": q_dep_sketch_conllu,
        "dep_sketch_catalog": q_dep_sketch_catalog,
        "word_sketch_conllu": q_word_sketch_conllu,
        "word_sketch_wsdef": q_word_sketch_wsdef,
        "word_sketch_unary": q_word_sketch_unary,
        "word_sketch_wsdef_index": q_word_sketch_wsdef_index,
        "word_sketch_dep_conllu": q_word_sketch_dep_conllu,
        "word_sketch_index_dist": q_word_sketch_index_dist,
        "word_sketch_store": q_word_sketch_store,
        "cql_deprel": q_cql_deprel,
        "cql_deprel_index": q_cql_deprel_index,
        "relation_concordance": q_relation_concordance,
        "multiseed_common": q_multiseed_common,
        "multiseed_common_index": q_multiseed_common_index,
        "profile_stats": q_profile_stats,
        "core_collocates": q_core_collocates,
        "relation_totals": q_relation_totals,
        "cql_feats": q_cql_feats,
        "cql_containing": q_cql_containing,
        "cql_not_containing_index": q_cql_not_containing_index,
        "cql_collocates": q_cql_collocates,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard": q_ngram_jaccard,
        "token_counts": q_token_counts,
        "quality": q_quality,
        "lang_id": q_lang_id,
        "fingerprints": q_fingerprints,
        "cosine_topk": q_cosine_topk,
        "cosine_near_dups": q_cosine_near_dups,
        "ivf_cosine_topk": q_ivf_cosine_topk,
        "minhash_near_dups": q_minhash_near_dups,
        "near_dup_clusters": q_near_dup_clusters,
        "simhash_near_dups": q_simhash_near_dups,
        "lsh_cosine_topk": q_lsh_cosine_topk,
        "media_meta": q_media_meta,
        "boilerplate_filter": q_boilerplate_filter,
        "topk_events_per_user": q_topk_events_per_user,
        "concordance": q_concordance,
        "concordance_right": q_concordance_right,
        "cql_hits": q_cql_hits,
        "keywords_g2": q_keywords_g2,
        "keywords_g2_index": q_keywords_g2_index,
        "cql_group_freq": q_cql_group_freq,
        "cql_group_freq_index": q_cql_group_freq_index,
        "cql_constraint": q_cql_constraint,
        "cql_constraint_index": q_cql_constraint_index,
        "cql_sample": q_cql_sample,
        "cql_sample_index": q_cql_sample_index,
        "docs_facets": q_docs_facets,
        "docs_facets_index": q_docs_facets_index,
        "cql_hits_index": q_cql_hits_index,
        "cql_hits_filtered": q_cql_hits_filtered,
        "cql_layers_index": q_cql_layers_index,
    }.items()}


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk": osql.sql_bm25_topk(FLAGSHIP_TERMS, k=10),
        "bm25_index_topk": osql.sql_bm25_topk(FLAGSHIP_TERMS, k=10),
        "bm25_filtered": osql.sql_bm25_topk(
            FLAGSHIP_TERMS, k=10, doc_filter=BM25_DOC_FILTER),
        "bm25_index_filtered": osql.sql_bm25_topk(
            FLAGSHIP_TERMS, k=10, doc_filter=BM25_DOC_FILTER),
        "term_stats": osql.sql_term_stats(),
        "term_posdist": osql.sql_term_posdist(),
        "corpus_stats": osql.sql_corpus_stats(),
        "doc_lengths": osql.sql_doc_lengths(),
        "top_terms": osql.sql_top_terms(20),
        "postings": osql.sql_postings(POSTINGS_TERMS),
        "bigram_counts": osql.sql_bigram_counts(20),
        "colloc_logdice": osql.sql_colloc_logdice("spark", 1, 2, 20),
        "word_sketch": osql.sql_word_sketch(SKETCH_HEAD, GrammarCatalog.load(), 10),
        "word_sketch_verb": osql.sql_word_sketch("join", GrammarCatalog.load(), 10),
        "dep_sketch": osql.sql_dependency_sketch(SKETCH_HEAD, "nsubj"),
        "dep_sketch_conllu": osql.sql_dep_sketch_conllu(SKETCH_HEAD, "amod"),
        "dep_sketch_catalog": osql.sql_dep_sketch_conllu(
            "scan", "nsubj", head_class="VERB", colloc_class="NOUN"),
        "word_sketch_conllu": osql.sql_word_sketch_conllu(
            SKETCH_HEAD, _en_catalog(), head_pos="NOUN", k_per_relation=10),
        "word_sketch_dep_conllu": osql.sql_word_sketch_conllu(
            "scan", _en_catalog(), head_pos="VERB", k_per_relation=10,
            relation_types=("DEP",)),
        "word_sketch_index_dist": osql.sql_word_sketch_conllu(
            SKETCH_HEAD, _en_catalog(), head_pos="NOUN", k_per_relation=10),
        "word_sketch_store": osql.sql_word_sketch_conllu(
            SKETCH_HEAD, _en_catalog(), head_pos="NOUN", k_per_relation=10),
        "word_sketch_wsdef": osql.sql_word_sketch_conllu(
            SKETCH_HEAD, _wsdef_catalog(), k_per_relation=10),
        "word_sketch_unary": osql.sql_unary_counts(
            SKETCH_HEAD, _wsdef_catalog(skip_unary=False)),
        "word_sketch_wsdef_index": osql.sql_word_sketch_conllu(
            SKETCH_HEAD, _wsdef_catalog(), k_per_relation=10),
        "cql_deprel": osql.sql_dep_sketch_conllu("scan", "nsubj"),
        "cql_deprel_index": osql.sql_dep_sketch_conllu("scan", "nsubj"),
        "relation_concordance": osql.sql_relation_concordance(
            "scan", "nsubj", page_size=10, context=3),
        "multiseed_common": osql.sql_multiseed_common(SEEDS, 1, 2, 50, 2),
        "multiseed_common_index": osql.sql_multiseed_common(SEEDS, 1, 2,
                                                            50, 2),
        "profile_stats": osql.sql_profile_stats(SEEDS, 1, 2, 50),
        "core_collocates": osql.sql_core_collocates(SEEDS, 1, 2, 50,
                                                    len(SEEDS)),
        "relation_totals": osql.sql_relation_totals("spark", 1, 2, 20),
        "boilerplate_filter": osql.sql_boilerplate_filter(
            _BOILERPLATE_PREFIXES),
        "topk_events_per_user": osql.sql_topk_events_per_user(3),
        "concordance": osql.sql_concordance("spark", 10, 3),
        "concordance_right": osql.sql_concordance_sorted("spark", 10, 3,
                                                         sort="right"),
        "cql_hits": osql.sql_pattern_hits(CQL_HITS_PATTERN),
        "keywords_g2": osql.sql_subcorpus_keywords(KEYWORDS_PREDICATE,
                                                   k=20),
        "keywords_g2_index": osql.sql_subcorpus_keywords(KEYWORDS_PREDICATE,
                                                         k=20),
        "cql_group_freq": osql.sql_group_pattern_hits(CQL_HITS_PATTERN,
                                                      k=20),
        "cql_group_freq_index": osql.sql_group_pattern_hits(
            CQL_HITS_PATTERN, k=20),
        "cql_constraint": osql.sql_pattern_hits(CQL_CONSTRAINT_PATTERN),
        "cql_constraint_index": osql.sql_pattern_hits(
            CQL_CONSTRAINT_PATTERN, spans_only=True),
        "cql_sample": osql.sql_sample_pattern_hits(CQL_HITS_PATTERN,
                                                   25, seed=7),
        "cql_sample_index": osql.sql_sample_pattern_hits(
            CQL_HITS_PATTERN, 25, seed=7),
        "docs_facets": osql.sql_docs_facets(CQL_HITS_PATTERN,
                                            ("lang", "source")),
        "docs_facets_index": osql.sql_docs_facets(
            CQL_HITS_PATTERN, ("lang", "source")),
        "cql_hits_index": osql.sql_pattern_hits(CQL_HITS_PATTERN,
                                                spans_only=True),
        "cql_hits_filtered": osql.sql_pattern_hits(
            CQL_HITS_PATTERN, spans_only=True,
            doc_filter=BM25_DOC_FILTER),
        "cql_layers_index": osql.sql_pattern_spans_conllu(
            CQL_LAYERS_PATTERN),
        "cql_feats": osql.sql_pattern_spans_conllu(CQL_FEATS_PATTERN),
        "cql_containing": osql.sql_sentence_containing(
            CQL_CONTAINING_PATTERN, sent_len=CONLLU_SENT_LEN),
        "cql_not_containing_index": osql.sql_sentence_containing(
            CQL_NOT_CONTAINING_PATTERN, sent_len=CONLLU_SENT_LEN),
        "cql_collocates": osql.sql_pattern_collocates(
            CQL_COLLOC_PATTERN, "spark", k=20),
        "dedup_exact": osql.sql_exact_dup_groups(),
        "ngram_jaccard": osql.sql_ngram_jaccard(3, 0.1, max_shingle_df=100),
        "token_counts": osql.sql_token_counts(),
        "quality": osql.sql_quality_features(),
        "lang_id": osql.sql_lang_id(),
        "fingerprints": osql.sql_fingerprints(FP_MUL, FP_MOD),
        "cosine_topk": osql.sql_cosine_topk([0, 1, 2], k=10),
        "cosine_near_dups": osql.sql_cosine_near_dups(0.4),
        "ivf_cosine_topk": osql.sql_ivf_cosine_topk([0, 1, 2], k=10,
                                                    n_centroids=8, n_probe=2),
        "near_dup_clusters": osql.sql_near_dup_clusters(
            threshold=0.1, num_hashes=64, bands=16, shingle_n=3, seed=7,
            max_shingle_df=100),
        "minhash_near_dups": osql.sql_minhash_near_dups(
            threshold=0.1, num_hashes=64, bands=16, shingle_n=3, seed=7,
            max_shingle_df=100),
        "simhash_near_dups": osql.sql_simhash_near_dups(
            max_hamming=6, shingle_n=2),
        "lsh_cosine_topk": osql.sql_lsh_cosine_topk(
            [0, 1, 2], k=10, n_planes=6, seed=5),
        # media_meta: Spark GENERATES binary payloads and PARSES the
        # headers back; the oracle derives the expected fields in
        # closed form from the same seeded splitmix64 streams (pure
        # SQL, HUGEINT wrap arithmetic) — the parse round-trip is what
        # the hash match proves
        "media_meta": osql.sql_media_meta(200, seed=3),
    }
