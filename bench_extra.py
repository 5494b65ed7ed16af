"""Optimization-round measurement harness (guide §1).

NOT the frozen driver bench — this isolates per-query cost so changes
can be attributed:

- per-query wall (same min-of-N / cache-isolation protocol as
  ``bench.py``'s ``bench_headline``), but with a separate breakdown of
  DataFrame CONSTRUCTION time (driver/Catalyst plan building) vs the
  ``.count()`` action, plus an optional noop-sink wall (computes every
  column, guide §1.4);
- optional ``.explain("formatted")`` capture into ``plans/r06/``.

Usage:
  python bench_extra.py [--reps 2] [--explain] [--noop] [query ...]

Prints one JSON line:  {"queries": {name: {...}}, "sf": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = Path(__file__).resolve().parent / "plans" / "r06"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", action="store_true",
                    help="capture explain('formatted') per query")
    ap.add_argument("--explain-suffix", default="before")
    ap.add_argument("--noop", action="store_true",
                    help="also time a noop-sink write (all columns)")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from word_sketch_lucene_spark.caching import release_all
    from word_sketch_lucene_spark.session import get_spark

    spark = get_spark("bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    qs = entrymod.queries()
    names = args.names or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # untimed warmup (same as bench.py)
    qs["doc_lengths"](spark, SF_DIR).count()

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        build_walls, walls, noop_walls = [], [], []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            build_walls.append(t1 - t0)
            walls.append(t2 - t0)
            release_all()
            spark.catalog.clearCache()
        if args.noop:
            for _ in range(args.reps):
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                noop_walls.append(time.perf_counter() - t0)
                release_all()
                spark.catalog.clearCache()
        if args.explain:
            import contextlib
            import io

            PLANS_DIR.mkdir(parents=True, exist_ok=True)
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (PLANS_DIR / f"{name}_{args.explain_suffix}.txt").write_text(
                buf.getvalue())
            release_all()
            spark.catalog.clearCache()
        rec = {
            "sec": round(min(walls), 3),
            "all_sec": [round(w, 3) for w in walls],
            "build_sec": round(min(build_walls), 3),
            "build_all_sec": [round(w, 3) for w in build_walls],
        }
        if noop_walls:
            rec["noop_sec"] = round(min(noop_walls), 3)
            rec["noop_all_sec"] = [round(w, 3) for w in noop_walls]
        out[name] = rec
        print(f"# {name}: {rec}", file=sys.stderr, flush=True)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": out, "sf": SF_DIR, "reps": args.reps}))


if __name__ == "__main__":
    main()
