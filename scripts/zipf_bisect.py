"""Bisect harness for the r4 Zipf serving regression (VERDICT r4 #1).

Builds the exact bench_zipf_queries corpus/index once, then times the
three cql_pattern_latency patterns + the 50-query BM25 set under the
CURRENT engine, with calibration burns bracketing every phase so VM
drift is visible. Optionally pass a path to an alternative engine.py
(e.g. the r3 version) to A/B the module in-place.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SCALE_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 72000


def calib() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    from word_sketch_lucene_spark.index.build import build_index
    from word_sketch_lucene_spark.query.engine import IndexSearcher
    from word_sketch_lucene_spark.session import get_spark
    from word_sketch_lucene_spark.sources.pages import generate_pages
    from pyspark.sql import functions as F

    spark = get_spark("zipf_bisect", master="local[32]",
                      shuffle_partitions=64)
    pages_dir = tempfile.mkdtemp(prefix="zb_pages_")
    root = tempfile.mkdtemp(prefix="zb_idx_")
    out: dict = {"docs": SCALE_DOCS, "calib_start": calib()}
    try:
        generate_pages(spark, SCALE_DOCS, seed=42, n_partitions=64) \
            .write.mode("overwrite").parquet(pages_dir)
        t0 = time.perf_counter()
        build_index(spark, spark.read.parquet(pages_dir), root,
                    n_partitions=64, store_docstore=False,
                    input_paths=[pages_dir])
        out["build_sec"] = round(time.perf_counter() - t0, 3)
        out["calib_after_build"] = calib()

        searcher = IndexSearcher(spark, root)
        terms = [r["term"] for r in
                 searcher.term_stats.orderBy(F.desc("cf"), F.asc("term"))
                 .select("term").limit(40).collect()]
        pats = [f'[word="{terms[0]}"] []{{0,2}} [word="{terms[1]}"]',
                f'[word="{terms[2]}"] [word="{terms[3]}"]',
                f'[word="{terms[0][:2]}.*"] [word="{terms[1]}"]']
        out["patterns"] = {}
        for p in pats:
            walls = []
            spans = 0
            for _ in range(3):
                t0 = time.perf_counter()
                spans = len(searcher.pattern_hits(p))
                walls.append(round(time.perf_counter() - t0, 3))
            out["patterns"][p] = {"walls": walls, "spans": spans,
                                  "calib": calib()}

        # BM25 50-query phase (bench_queries shape)
        from bench import _query_set
        qs = _query_set(terms)
        all_terms = sorted({t for q in qs for t in q})
        t0 = time.perf_counter()
        searcher.prefetch(all_terms)
        out["prefetch_sec"] = round(time.perf_counter() - t0, 3)
        for rep in range(2):
            t0 = time.perf_counter()
            for q in qs:
                searcher.search(q, k=10, mode="auto")
            s = time.perf_counter() - t0
            out[f"bm25_qps_rep{rep}"] = round(len(qs) / s, 1)
        out["calib_end"] = calib()
    finally:
        shutil.rmtree(pages_dir, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
