"""spark-submit entry point: query a built index (BM25 top-k / phrase).

    spark-submit --py-files dist/word_sketch_lucene_spark.zip \
        scripts/query_index_cli.py --index /path/idx --query "spark join" -k 10
    python scripts/query_index_cli.py --index /tmp/idx --phrase "t0 t1"
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description="Query a BM25 inverted index")
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", help="free-text OR query")
    ap.add_argument("--phrase", help="exact-sequence phrase query")
    ap.add_argument("--cql", help="mini-BCQL pattern, e.g. "
                    "'[word=\"sp.*\"] []{0,2} [word=\"join\"]'; span "
                    "filters work too: '<s/> containing [lemma=\"x\"]'")
    ap.add_argument("--relation", help="dependency-relation query, e.g. "
                    "'[lemma=\"theory\"] -nsubj-> _' (ranked dependents)")
    ap.add_argument("--regex", help="regex term query (dictionary expansion)")
    ap.add_argument("--within-sentence", action="store_true",
                    help="CQL matches may not cross sentence boundaries")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--doc-filter", default=None,
                    help="SQL metadata predicate over the doc_meta "
                         "store, e.g. \"lang = 'en'\"")
    ap.add_argument("--mode", default="auto",
                    choices=["auto", "bmw", "wand", "vec", "daat"])
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if not (args.query or args.phrase or args.cql or args.regex
            or args.relation):
        ap.error("one of --query / --phrase / --cql / --relation / "
                 "--regex required")

    from word_sketch_lucene_spark.query.engine import IndexSearcher
    from word_sketch_lucene_spark.session import get_spark

    spark = get_spark("query-index", master=args.master)
    s = IndexSearcher(spark, args.index)
    t0 = time.perf_counter()
    if args.query:
        hits, st = s.search(args.query, k=args.k, mode=args.mode,
                            doc_filter=args.doc_filter)
        out = {"query": args.query, "mode": args.mode,
               "hits": [{"doc_id": d, "score": round(sc, 6)} for d, sc in hits],
               "decoded_blocks": st["decoded_blocks"],
               "total_blocks": st["total_blocks"]}
    elif args.phrase:
        matches = s.phrase_hits(args.phrase)
        out = {"phrase": args.phrase,
               "hits": [{"doc_id": d, "positions": p} for d, p in matches[:args.k]],
               "total_docs": len(matches)}
    elif args.cql:
        # auto: Σcf-budgeted — hot slots run as a distributed
        # DataFrame plan over the forward token table instead of a
        # driver-side postings union
        spans = s.pattern_hits_auto(args.cql,
                                    within_sentence=args.within_sentence,
                                    doc_filter=args.doc_filter)
        out = {"cql": args.cql,
               "hits": [{"doc_id": d, "start": a, "end": b}
                        for d, a, b in spans[:args.k]],
               "total_spans": len(spans)}
    elif args.relation:
        from word_sketch_lucene_spark.query.sketch import (
            index_relation_collocates,
        )

        rows = index_relation_collocates(s, args.relation, limit=args.k,
                                         round_dp=4)
        out = {"relation": args.relation,
               "collocates": [{"dep_term": t, "pair_freq": f,
                               "logdice": ld} for t, f, ld in rows]}
    else:
        hits, st = s.search_regex(args.regex, k=args.k, mode=args.mode)
        out = {"regex": args.regex,
               "expanded_terms": s.expand_terms(args.regex)[:20],
               "hits": [{"doc_id": d, "score": round(sc, 6)} for d, sc in hits],
               "decoded_blocks": st["decoded_blocks"]}
    out["latency_ms"] = round(1000 * (time.perf_counter() - t0), 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
