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
from word_sketch_lucene_spark.query.engine import bm25_topk_df

FLAGSHIP_TERMS = ["spark", "join"]
POSTINGS_TERMS = ["spark", "customer", "vector"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------- queries
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: BM25 top-10 (W1 TakeOrderedAndProject; A3/A4/J4 analogs)."""
    return bm25_topk_df(_docs(spark, sf_dir), FLAGSHIP_TERMS, k=10, round_dp=4)


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-term df/cf — the reference's stats.tsv as one aggregate."""
    return term_stats(explode_tokens(_docs(spark, sf_dir)))


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: collection stats (N, total tokens, avgdl) for BM25."""
    dl = doc_lengths(explode_tokens(_docs(spark, sf_dir)))
    return dl.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        F.round(F.avg("dl"), 4).alias("avgdl"),
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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk": q_bm25_topk,
        "term_stats": q_term_stats,
        "corpus_stats": q_corpus_stats,
        "doc_lengths": q_doc_lengths,
        "top_terms": q_top_terms,
        "postings": q_postings,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk": osql.sql_bm25_topk(FLAGSHIP_TERMS, k=10),
        "term_stats": osql.sql_term_stats(),
        "corpus_stats": osql.sql_corpus_stats(),
        "doc_lengths": osql.sql_doc_lengths(),
        "top_terms": osql.sql_top_terms(20),
        "postings": osql.sql_postings(POSTINGS_TERMS),
    }
