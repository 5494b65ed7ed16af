"""spark-fulltext: PySpark-native inverted-index build + BM25 top-k query engine.

A from-scratch rebuild of the *capabilities* of milekpl/word-sketch-lucene
(BlackLab/Lucene corpus engine — see SURVEY.md) as an idiomatic Spark system:

- ``sources``    — page/CoNLL-U scans, parquet-backed table layer, export sinks
- ``functions``  — tokenizer pandas UDFs, scoring expressions, VByte codec
- ``index``      — distributed inverted-index build: postings, segments,
                   manifests (resumable), LSM merge, corpus statistics
- ``query``      — BM25 top-k engines (DataFrame path + block-max WAND kernel),
                   multi-layer index-side CQL patterns, index-served word
                   sketches (``query.sketch``), concordance/KWIC
- ``caching``    — tracked persists + per-query release (cache hygiene
                   for long-lived sessions)
- ``operators``  — collocation sketches (logDice), proximity/dependency joins,
                   semantic-field exploration, dedup, similarity search, text QC
- ``plans``      — grammar-relation catalog → DataFrame plan templates;
                   mini-BCQL pattern compiler (``plans.cql``)
- ``streaming``  — incremental (availableNow) index ingestion,
                   stateful streaming dedup

Everything is DataFrame/Arrow-first: no per-row Python UDFs, no RDDs.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
