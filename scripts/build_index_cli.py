"""spark-submit entry point: build (or resume) an index.

Cluster launch (the north-rule deployment shape):

    python scripts/package.py   # → dist/word_sketch_lucene_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/word_sketch_lucene_spark.zip \
        scripts/build_index_cli.py \
        --input s3://bucket/pages/ --output s3://bucket/index/ \
        --partitions 4096 --doc-salt 16

Local smoke:

    python scripts/build_index_cli.py --synthetic 5000 --output /tmp/idx
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description="Build a BM25 inverted index")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="pages table: parquet path or "
                     "Iceberg identifier (url/text or doc_id/text)")
    src.add_argument("--conllu", help="directory/glob of .conllu files: "
                     "multi-layer index (term + lemma/upos/xpos/deprel "
                     "postings) from tagger output — the reference's "
                     "primary ingestion")
    src.add_argument("--synthetic", type=int, metavar="N",
                     help="generate N synthetic pages instead")
    ap.add_argument("--output", required=True, help="index root directory")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--doc-salt", type=int, default=4)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--no-docstore", action="store_true")
    ap.add_argument("--master", default=None,
                    help="override master (else spark-submit's)")
    args = ap.parse_args()

    from word_sketch_lucene_spark.index.build import build_index
    from word_sketch_lucene_spark.session import get_spark
    from word_sketch_lucene_spark.sources.pages import generate_pages

    spark = get_spark("build-index", master=args.master)
    if args.conllu:
        from pathlib import Path as _P

        from word_sketch_lucene_spark.index.build import build_conllu_index
        from word_sketch_lucene_spark.sources.conllu import read_conllu

        t0 = time.perf_counter()
        stats = build_conllu_index(
            spark, read_conllu(spark, args.conllu), args.output,
            doc_salt=args.doc_salt, n_partitions=args.partitions,
            block_size=args.block_size,
            store_docstore=not args.no_docstore,
            input_paths=[args.conllu] if _P(args.conllu).exists() else None)
        dt = time.perf_counter() - t0
        print(json.dumps({"stats": stats, "build_sec": round(dt, 2),
                          "docs_per_sec": round(stats["n_docs"] / dt, 1)}))
        spark.stop()
        return
    if args.synthetic:
        pages = generate_pages(spark, args.synthetic, seed=42)
        input_paths = None
    else:
        # parquet path OR an Iceberg table identifier (north-rule
        # ingest shape; needs the iceberg runtime on the cluster)
        from word_sketch_lucene_spark.sources.iceberg import read_table

        pages = read_table(spark, args.input)
        if args.id_col not in pages.columns:
            # two-phase distributed id assignment — a global
            # row_number() window would shuffle the 100-TB ingest to
            # ONE task (see sources.pages.assign_doc_ids)
            from word_sketch_lucene_spark.sources.pages import assign_doc_ids

            order = "url" if "url" in pages.columns else None
            pages = assign_doc_ids(pages, args.id_col, order_col=order)
        input_paths = [args.input]

    t0 = time.perf_counter()
    stats = build_index(
        spark, pages, args.output,
        doc_id_col=args.id_col, text_col=args.text_col,
        doc_salt=args.doc_salt, n_partitions=args.partitions,
        block_size=args.block_size, store_docstore=not args.no_docstore,
        input_paths=input_paths,
    )
    dt = time.perf_counter() - t0
    print(json.dumps({"stats": stats, "build_sec": round(dt, 2),
                      "docs_per_sec": round(stats["n_docs"] / dt, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
