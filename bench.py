"""Benchmark harness: headline queries + index build/query throughput + scaling.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "build": {...}, "query_engine": {...}, "scaling": {...}}

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
  BENCH_SCALE_DOCS    synthetic pages for the N-vs-4N scaling runs
                      (default 24000; 0 disables scaling runs)

Scaling evidence (north rule, sandbox variant): the same
generate→tokenize→index job at local[N] and local[4N] on identical
deterministic input; efficiency = (tp_4N / tp_N) / 4.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE_DOCS = int(os.environ.get("BENCH_SCALE_DOCS", "48000"))


def _sf_from_dir(d: str) -> float:
    name = Path(d).name
    return float(name[2:]) if name.startswith("sf") else -1.0


def _fresh_spark(master_cores: int, app: str, shuffle_partitions: int | None = None):
    from word_sketch_lucene_spark.session import get_spark

    return get_spark(app, master=f"local[{master_cores}]",
                     shuffle_partitions=shuffle_partitions or master_cores)


def _query_set(terms_by_cf: list[str]) -> list[list[str]]:
    """~50 deterministic queries: heads, pairs, triples, rare+head, zero-hit."""
    heads = terms_by_cf[:8]
    mids = terms_by_cf[8:20] or heads
    qs: list[list[str]] = []
    qs += [[t] for t in heads]
    qs += [[heads[i], mids[i % len(mids)]] for i in range(8)]
    qs += [[heads[i], heads[(i + 1) % len(heads)], mids[(i + 2) % len(mids)]]
           for i in range(8)]
    qs += [[terms_by_cf[-1 - i], heads[i % len(heads)]] for i in range(8)]
    qs += [[f"zzz_nohit_{i}"] for i in range(4)]
    qs += [[f"zzz_nohit_{i}", heads[i % len(heads)]] for i in range(4)]
    return qs[:50]


def bench_headline(spark) -> dict[str, float]:
    import __spark_entry__ as entrymod

    out = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        out[name] = round(time.perf_counter() - t0, 3)
        _ = n
    return out


def bench_index(spark) -> tuple[dict, dict]:
    from pyspark.sql import functions as F

    from word_sketch_lucene_spark.index.build import build_index
    from word_sketch_lucene_spark.query.engine import IndexSearcher

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    root = tempfile.mkdtemp(prefix="bench_idx_")
    try:
        t0 = time.perf_counter()
        build_index(spark, docs, root, input_paths=[f"{SF_DIR}/documents.parquet"])
        build_s = time.perf_counter() - t0
        build = {"docs": n_docs, "sec": round(build_s, 3),
                 "docs_per_sec": round(n_docs / build_s, 1)}

        qe = bench_queries(spark, root)
        return build, qe
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_queries(spark, index_root) -> dict:
    """Query throughput: one cold prefetch scan, then in-memory kernel qps
    (the reference's model: open index once, serve point queries)."""
    from pyspark.sql import functions as F

    from word_sketch_lucene_spark.query.engine import IndexSearcher

    searcher = IndexSearcher(spark, index_root)
    terms = [r["term"] for r in
             searcher.term_stats.orderBy(F.desc("cf"), F.asc("term"))
             .select("term").limit(40).collect()]
    qs = _query_set(terms)
    all_terms = sorted({t for q in qs for t in q})
    t0 = time.perf_counter()
    searcher.prefetch(all_terms)
    cold_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    decoded = total = 0
    for q in qs:
        _, st = searcher.search(q, k=10, mode="auto")
        decoded += st["decoded_blocks"]
        total += st["total_blocks"]
    q_s = time.perf_counter() - t0
    return {"n_queries": len(qs), "prefetch_sec": round(cold_s, 3),
            "sec": round(q_s, 3), "qps": round(len(qs) / q_s, 1),
            "block_decode_ratio": round(decoded / max(total, 1), 3)}


def _scale_run(cores: int, nparts: int, pages_dir: str, reps: int = 3) -> dict:
    """One scaling level in its own subprocess (fresh JVM per level, no
    state leaks between levels). Inside: one untimed warmup build (JIT +
    python-worker warm, as on a long-lived cluster executor), then
    ``reps`` timed builds; min wall time is reported (least-noise
    estimator)."""
    import subprocess

    prog = f"""
import sys, time, tempfile, shutil
sys.path.insert(0, {str(Path(__file__).resolve().parent)!r})
from word_sketch_lucene_spark.session import get_spark
from word_sketch_lucene_spark.index.build import build_index
spark = get_spark('scale', master='local[{cores}]', shuffle_partitions={nparts})
pages = spark.read.parquet({pages_dir!r})
for rep in range({reps + 1}):
    root = tempfile.mkdtemp(prefix='bscale_')
    t0 = time.perf_counter()
    build_index(spark, pages, root, n_partitions={nparts},
                store_docstore=False, input_paths=[{pages_dir!r}])
    print('BENCH_SEC', time.perf_counter() - t0, flush=True)
    shutil.rmtree(root, ignore_errors=True)
spark.stop()
"""
    out = subprocess.run([sys.executable, "-c", prog],
                         capture_output=True, text=True, timeout=2400)
    secs = [float(line.split()[1]) for line in out.stdout.splitlines()
            if line.startswith("BENCH_SEC")]
    if not secs:
        raise RuntimeError(f"scale run failed: {out.stderr[-2000:]}")
    best = min(secs[1:]) if len(secs) > 1 else secs[0]  # drop warmup
    return {"docs": SCALE_DOCS, "sec": round(best, 3),
            "docs_per_sec": round(SCALE_DOCS / best, 1),
            "all_runs_sec": [round(s, 1) for s in secs]}


def bench_scaling() -> dict:
    """Same job at local[N] and local[4N]; identical deterministic input.

    Each level is subprocess-isolated with an identical shuffle layout —
    only concurrency differs. Levels (2 and 8 at CPUS=32) sit below the
    vCPU saturation zone of this sandbox (a pure-Python burn test shows
    per-process throughput degrading ~1.2× at 16 and ~1.7× at 32
    concurrent processes — see BENCH.md); on a real cluster N and 4N
    would be executor counts with dedicated cores.
    """
    from word_sketch_lucene_spark.index.build import build_index
    from word_sketch_lucene_spark.sources.pages import generate_pages

    levels = [max(1, CPUS // 16), max(4, CPUS // 4)]
    nparts = CPUS * 2
    results = {}
    # Generate the corpus ONCE (untimed): build throughput is measured from
    # an existing pages table, as in production.
    pages_dir = tempfile.mkdtemp(prefix="bench_pages_")
    gen = _fresh_spark(CPUS, "bench-gen")
    generate_pages(gen, SCALE_DOCS, seed=42, n_partitions=nparts) \
        .write.mode("overwrite").parquet(pages_dir)
    gen.stop()
    try:
        for cores in levels:
            results[cores] = _scale_run(cores, nparts, pages_dir)
        # Zipf corpus (10k vocab) — the realistic WAND-pruning query bench
        spark = _fresh_spark(CPUS, "bench-zipf-queries",
                             shuffle_partitions=nparts)
        root = tempfile.mkdtemp(prefix="bench_zipfq_")
        try:
            build_index(spark, spark.read.parquet(pages_dir), root,
                        n_partitions=nparts, store_docstore=False,
                        input_paths=[pages_dir])
            zipf_queries = bench_queries(spark, root)
        finally:
            shutil.rmtree(root, ignore_errors=True)
            spark.stop()
    finally:
        shutil.rmtree(pages_dir, ignore_errors=True)
    n, n4 = levels
    eff = (results[n4]["docs_per_sec"] / results[n]["docs_per_sec"]) / (n4 / n)
    return {"levels": levels, "runs": results,
            "efficiency": round(eff, 3),
            "zipf_query_engine": zipf_queries}


def main() -> None:
    t_all = time.perf_counter()
    spark = _fresh_spark(CPUS, "bench")
    queries = bench_headline(spark)
    build, qe = bench_index(spark)
    spark.stop()
    scaling = bench_scaling() if SCALE_DOCS > 0 else {}
    total = time.perf_counter() - t_all
    out = {
        "metric": "index-build docs/sec + BM25 top-10 qps + scaling efficiency",
        "value": round(total, 2),
        "unit": "sec",
        "queries": queries,
        "sf": _sf_from_dir(SF_DIR),
        "build": build,
        "query_engine": qe,
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
