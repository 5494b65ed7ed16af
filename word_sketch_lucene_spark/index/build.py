"""Index build pipeline: pages → tokens → postings → stats → segments.

Reference parity: this is the Spark-first re-expression of the whole
reference index build (``Main.java:111-144`` driving
``ConlluConverter`` chunking + ``BlackLabConllUIndexer`` → Lucene
segments). Stage map:

1. **tokenize** — Arrow-vectorized UDF (U1, ``tag_with_stanza.py``
   analog) → exploded ``(doc_id, pos, term)``.
2. **postings** — ``groupBy(term, doc_id)`` → ``(tf, positions)``;
   map-side partial aggregation absorbs head-term skew (every (term,
   doc) pair is unique, so the shuffle key is well-spread).
3. **stats** — the collocation-style single-pass grouped aggregate
   (``CollocateQueryHelper.java:102-136`` analog) → ``term_stats`` +
   ``(N, avgdl)``.
4. **segments** — *salted* repartition by ``(term, pmod(hash(doc_id),
   doc_salt))`` (explicit skew defense: a head term's postings split
   across ``doc_salt`` segments, each sorted by doc_id — query-side
   merge is a cheap disjoint concat), ``sortWithinPartitions(term,
   doc_id)``, then the ``mapInPandas`` codec kernel of
   ``segments.py``.
5. **docstore** — the forward index (``BlackLabQueryExecutor.java:159``
   FORWARD_INDEX concordances): ``(doc_id, text, tokens)``.

Every stage commits a :class:`~.manifest.StageManifest`; re-running
``build_index`` with identical inputs+config skips completed stages
(resumable builds, north rule).
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scoring import B, K1
from ..functions.tokenize import doc_lengths, explode_tokens, tokens_expr
from .manifest import StageManifest, config_fingerprint, input_fingerprint
from .segments import BLOCK_SIZE, SEGMENT_SCHEMA, make_segment_writer
from .stats import corpus_stats, term_stats

STATS_FILE = "stats.json"


def build_postings(tokens: DataFrame) -> DataFrame:
    """Exploded tokens → ``(term, doc_id, tf, positions)``.

    ``sort_array(collect_list(pos))`` restores ascending positions
    regardless of shuffle arrival order (positions are distinct ints
    per (term, doc)).
    """
    return tokens.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )


class IndexPaths:
    """Directory layout of one index build."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.tokens = self.root / "tokens"
        self.doc_lens = self.root / "doc_lens"
        self.term_stats = self.root / "term_stats"
        self.segments = self.root / "segments"
        self.docstore = self.root / "docstore"
        self.stats = self.root / STATS_FILE


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str | Path,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    doc_salt: int = 4,
    n_partitions: int | None = None,
    block_size: int = BLOCK_SIZE,
    k1: float = K1,
    b: float = B,
    use_pandas_udf: bool = True,
    store_docstore: bool = True,
    input_paths: list[str] | None = None,
) -> dict:
    """Run (or resume) the full index build; returns the stats dict."""
    paths = IndexPaths(out_dir)
    paths.root.mkdir(parents=True, exist_ok=True)
    nparts = n_partitions or spark.sparkContext.defaultParallelism
    config = {
        "doc_salt": doc_salt, "n_partitions": nparts, "block_size": block_size,
        "k1": k1, "b": b, "use_pandas_udf": use_pandas_udf,
        "tokenizer": "lower-split-[^a-z0-9]+",
    }
    cfg_fp = config_fingerprint(config)
    inputs_fp = input_fingerprint(input_paths) if input_paths else "unspecified"

    # ---- stage: tokens (materialized once, read by every later pass) --
    # A compressed parquet stage instead of an in-heap persist: columnar,
    # spill-free, identical layout at any executor count, and the natural
    # resume point after a crash mid-build. Downstream aggregates read
    # only the columns they need (column pruning on the token table).
    st_tok = StageManifest(paths.tokens, "tokens")
    if not st_tok.is_complete(inputs_fp, cfg_fp):
        (
            explode_tokens(pages, doc_id_col, text_col,
                           use_pandas_udf=use_pandas_udf)
            .write.mode("overwrite").parquet(str(paths.tokens))
        )
        st_tok.commit(inputs_fp, cfg_fp,
                      lineage={"inputs": input_paths or [], "config": config})
    tokens = spark.read.parquet(str(paths.tokens))

    # ---- stages: doc_lens + corpus stats ∥ term_stats -----------------
    # Two independent aggregates over the tokens stage — submitted as
    # CONCURRENT Spark jobs (the scheduler interleaves their stages), the
    # engine-level analog of the reference's relation fan-out thread pool
    # (SketchHandlers.java:48-49).
    def _stage_doc_lens() -> None:
        st_stats = StageManifest(paths.doc_lens, "doc_lens")
        if st_stats.is_complete(inputs_fp, cfg_fp):
            return
        doc_lengths(tokens).write.mode("overwrite").parquet(str(paths.doc_lens))
        dl = spark.read.parquet(str(paths.doc_lens))
        s = corpus_stats(dl)
        s.update({"k1": k1, "b": b, "block_size": block_size, "doc_salt": doc_salt})
        tmp = paths.stats.with_suffix(".tmp")
        tmp.write_text(json.dumps(s, indent=1, sort_keys=True))
        os.replace(tmp, paths.stats)
        st_stats.commit(inputs_fp, cfg_fp, metrics=s,
                        lineage={"inputs": input_paths or [], "config": config})

    def _stage_term_stats() -> None:
        st_ts = StageManifest(paths.term_stats, "term_stats")
        if st_ts.is_complete(inputs_fp, cfg_fp):
            return
        term_stats(tokens).write.mode("overwrite").parquet(str(paths.term_stats))
        st_ts.commit(inputs_fp, cfg_fp, lineage={"inputs": input_paths or []})

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [pool.submit(_stage_doc_lens), pool.submit(_stage_term_stats)]
        for f in futs:
            f.result()
    stats = json.loads(paths.stats.read_text())

    # ---- stage: segments ---------------------------------------------
    st_seg = StageManifest(paths.segments, "segments")
    if not st_seg.is_complete(inputs_fp, cfg_fp):
        ts = spark.read.parquet(str(paths.term_stats)).select("term", "df")
        dl = spark.read.parquet(str(paths.doc_lens))
        # ONE shuffle of flat int columns: raw tokens (+dl, +df) hash-keyed
        # by (term, doc-salt), sorted (term, doc_id, pos); the kernel does
        # the (term, doc)→(tf, positions) aggregation itself. No JVM array
        # building, half the shuffle volume of a groupBy(collect_list).
        feed = (
            tokens
            .join(dl, "doc_id")          # per-posting dl (exact query-time BM25)
            .join(ts, "term")            # per-term df (block max_score bounds)
            .withColumn("salt", F.pmod(F.hash("doc_id"), F.lit(doc_salt)))
        )
        writer = make_segment_writer(
            stats["n_docs"], stats["avgdl"], block_size=block_size, k1=k1, b=b)
        (
            feed.repartition(nparts, F.col("term"), F.col("salt"))
            .sortWithinPartitions("term", "doc_id", "pos")
            .select("term", "doc_id", "pos", "dl", "df")
            .mapInPandas(writer, schema=SEGMENT_SCHEMA)
            .write.mode("overwrite")
            .parquet(str(paths.segments))
        )
        # per-partition lineage + skew metrics (north rule)
        seg = spark.read.parquet(str(paths.segments))
        parts = [r.asDict() for r in (
            seg.groupBy("seg_part").agg(
                F.count("*").alias("n_blocks"),
                F.sum("n").alias("n_postings"),
                F.countDistinct("term").alias("n_terms"),
                F.min("term").alias("term_min"),
                F.max("term").alias("term_max"),
            ).orderBy("seg_part").collect())]
        counts = sorted(p["n_postings"] for p in parts) or [0]
        metrics = {
            "n_blocks": sum(p["n_blocks"] for p in parts),
            "n_postings": sum(p["n_postings"] for p in parts),
            "n_seg_parts": len(parts),
            "max_partition_postings": counts[-1],
            "median_partition_postings": counts[len(counts) // 2],
        }
        st_seg.commit(inputs_fp, cfg_fp, metrics=metrics, partitions=parts,
                      lineage={"inputs": input_paths or [], "config": config})

    # ---- stage: docstore (forward index) ------------------------------
    if store_docstore:
        st_ds = StageManifest(paths.docstore, "docstore")
        if not st_ds.is_complete(inputs_fp, cfg_fp):
            (
                pages.select(
                    F.col(doc_id_col).alias("doc_id"),
                    F.col(text_col).alias("text"),
                    tokens_expr(text_col).alias("tokens"),
                )
                .write.mode("overwrite").parquet(str(paths.docstore))
            )
            st_ds.commit(inputs_fp, cfg_fp, lineage={"inputs": input_paths or []})

    return stats
