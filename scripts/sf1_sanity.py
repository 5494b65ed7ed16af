"""sf1 sanity pass (r4 verdict #9): run the full contract at 10× data
and compare per-query walls against sf0.1 IN THE SAME SESSION — catches
scale-dependent routing/caching cliffs before the driver does.

No sf1 fixture exists, so one is SYNTHESIZED deterministically from
sf0.1 (no external data): 10 replicas per table with shifted ids.
Replicas k>0 prefix every token with ``q<k>`` — each replica becomes a
disjoint vocabulary universe with the same distribution shape, so
dedup/near-dup structure scales LINEARLY (true copies would make every
doc a 10-way near-duplicate and the quadratic pair output would
measure the data, not the engine). ``cosine_near_dups`` is excluded:
it is the documented O(n²) exact oracle tier (the scale path is
``lsh_near_dup_pairs``), so its wall grows 100× at 10× rows by design.

Usage: python scripts/sf1_sanity.py [query1,query2,...]
Prints one JSON line with per-query sf0.1/sf1 walls and ratios.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF01 = "/root/testdata/sf0.1"
REPLICAS = 10
SKIP = {"cosine_near_dups"}  # O(n²)-by-design exact tier


def build_sf1(spark) -> str:
    from pyspark.sql import functions as F

    out = Path("/tmp/wsl_sf1_r5")
    marker = out / "_COMPLETE"
    if marker.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    events = spark.read.parquet(f"{SF01}/events.parquet")
    embs = spark.read.parquet(f"{SF01}/embeddings.parquet")
    d_parts, e_parts, v_parts = [], [], []
    for k in range(REPLICAS):
        text = (F.col("text") if k == 0 else
                F.regexp_replace("text", "([A-Za-z0-9]+)", f"q{k}$1"))
        d_parts.append(docs.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            text.alias("text"), "lang", "source",
            F.length(text).alias("n_chars")))
        e_parts.append(events.select(
            (F.col("event_id") + F.lit(k * 10**12)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(k * 10**9)).alias("user_id"),
            "event_type", "value", "props"))
        v_parts.append(embs.select(
            (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
            "embedding", "label"))
    for name, parts in (("documents", d_parts), ("events", e_parts),
                        ("embeddings", v_parts)):
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.repartition(32).write.mode("overwrite") \
            .parquet(str(out / f"{name}.parquet"))
    # the TPC-H side tables are read by no contract query; symlink the
    # sf0.1 files so the dir is a complete sf layout
    import os

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        dst = out / f"{t}.parquet"
        if not dst.exists():
            os.symlink(f"{SF01}/{t}.parquet", dst)
    marker.write_text("ok")
    return str(out)


def main() -> None:
    import __spark_entry__ as e
    from word_sketch_lucene_spark import get_spark
    from word_sketch_lucene_spark.caching import release_all

    only = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None
    spark = get_spark("sf1_sanity", master="local[32]",
                      shuffle_partitions=64)
    sf1 = build_sf1(spark)
    e.queries()["doc_lengths"](spark, SF01).count()  # session warmup
    out = {"replicas": REPLICAS, "sf1_dir": sf1, "queries": {}}

    def run(fn, sf_dir):
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        w = time.perf_counter() - t0
        release_all()
        spark.catalog.clearCache()
        return round(w, 2), n

    for name, fn in e.queries().items():
        if name in SKIP or (only and name not in only):
            continue
        try:
            w01, n01 = run(fn, SF01)
            w1, n1 = run(fn, sf1)
        except Exception as ex:  # noqa: BLE001
            out["queries"][name] = {"error": str(ex)[:200]}
            print(f"{name}: ERROR {str(ex)[:120]}", flush=True)
            continue
        ratio = round(w1 / max(w01, 1e-9), 1)
        out["queries"][name] = {"sf0.1_sec": w01, "sf1_sec": w1,
                                "ratio": ratio, "sf0.1_rows": n01,
                                "sf1_rows": n1}
        flag = " <-- >10x" if ratio > 10 else ""
        print(f"{name}: {w01}s -> {w1}s ({ratio}x){flag}", flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
