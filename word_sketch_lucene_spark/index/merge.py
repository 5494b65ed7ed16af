"""Log-structured segment merge: many indexes → one compacted index.

Reference parity: Lucene/BlackLab segment merging — the reference
grows its index by re-invoking ``IndexTool add`` and letting Lucene
merge segments in the background (``README.md`` "add more documents";
chunked indexing ``Main.java:130-133``). Here the same LSM idea is a
Spark job:

    decode (mapInPandas) → union → ONE salted shuffle → encode (the
    SAME segment-writer kernel as the initial build)

Decoding emits raw token rows ``(term, doc_id, pos, dl)`` — the
identical interchange shape the build uses, so merge is literally a
re-run of the build's last stage over the union of inputs. Tiered
compaction (``compact_if_needed``) keeps the number of live indexes
bounded, and every merge commits a manifest with the input lineage —
resumable like every other stage.

Doc-id spaces must be disjoint across the merged indexes (the caller
owns id assignment; ``add_documents`` offsets are the usual scheme).
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.codec import decode_positions, vbyte_decode
from .build import STATS_FILE, IndexPaths, build_index
from .manifest import StageManifest, config_fingerprint, input_fingerprint
from .segments import BLOCK_SIZE, SEGMENT_SCHEMA, TOKEN_INPUT_COLUMNS, make_segment_writer

DECODE_SCHEMA = "term string, doc_id long, pos long, dl long"


def decode_segments_to_tokens(segments: DataFrame) -> DataFrame:
    """Inverse of the segment writer: block rows → raw token rows.

    Arrow-batched numpy decode; one output row per (term, doc,
    position) — the build's interchange shape.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms, docs, poss, dls = [], [], [], []
            for r in pdf.itertuples(index=False):
                gaps = vbyte_decode(bytes(r.docs_vb)).astype(np.int64)
                d = np.cumsum(gaps) + r.first_doc
                tf = vbyte_decode(bytes(r.tfs_vb)).astype(np.int64)
                dl = vbyte_decode(bytes(r.dls_vb)).astype(np.int64)
                pls = decode_positions(bytes(r.pos_vb), int(r.n))
                n_tok = int(tf.sum())
                terms.append(np.full(n_tok, r.term, dtype=object))
                docs.append(np.repeat(d, tf))
                poss.append(np.concatenate(pls) if pls else np.empty(0, np.int64))
                dls.append(np.repeat(dl, tf))
            if terms:
                yield pd.DataFrame({
                    "term": np.concatenate(terms),
                    "doc_id": np.concatenate(docs),
                    "pos": np.concatenate(poss),
                    "dl": np.concatenate(dls),
                })

    cols = ["term", "n", "first_doc", "docs_vb", "tfs_vb", "dls_vb", "pos_vb"]
    return segments.select(*cols).mapInPandas(decode, schema=DECODE_SCHEMA)


def merge_indexes(
    spark: SparkSession,
    in_roots: list[str | Path],
    out_root: str | Path,
    *,
    doc_salt: int = 4,
    n_partitions: int | None = None,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Merge N built indexes into one compacted index (docstores and
    stats folded too). Resumable via the output manifest."""
    paths = IndexPaths(out_root)
    paths.root.mkdir(parents=True, exist_ok=True)
    nparts = n_partitions or spark.sparkContext.defaultParallelism
    in_roots = [str(r) for r in in_roots]
    config = {"doc_salt": doc_salt, "n_partitions": nparts,
              "block_size": block_size, "op": "merge"}
    cfg_fp = config_fingerprint(config)
    inputs_fp = input_fingerprint(in_roots)

    st = StageManifest(paths.root, "merge")
    if st.is_complete(inputs_fp, cfg_fp):
        return json.loads(paths.stats.read_text())

    # union of decoded token streams — the LSM merge input
    tokens = None
    for r in in_roots:
        t = decode_segments_to_tokens(spark.read.parquet(str(Path(r) / "segments")))
        tokens = t if tokens is None else tokens.unionByName(t)

    writer = make_segment_writer(block_size=block_size)
    (
        tokens
        .withColumn("salt", F.pmod(F.hash("doc_id"), F.lit(doc_salt)))
        .repartition(nparts, F.col("term"), F.col("salt"))
        .sortWithinPartitions("term", "doc_id", "pos")
        .select(*TOKEN_INPUT_COLUMNS)
        .mapInPandas(writer, schema=SEGMENT_SCHEMA)
        .write.mode("overwrite").parquet(str(paths.segments))
    )

    # fold per-index doc_lens / stats / term_stats / docstore
    dl = None
    for r in in_roots:
        d = spark.read.parquet(str(Path(r) / "doc_lens"))
        dl = d if dl is None else dl.unionByName(d)
    dl.write.mode("overwrite").parquet(str(paths.doc_lens))
    row = spark.read.parquet(str(paths.doc_lens)).agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("tt")).collect()[0]
    all_stats = [json.loads((Path(r) / STATS_FILE).read_text())
                 for r in in_roots]
    base = all_stats[0]
    # scoring/codec params must agree across inputs — a delta built with
    # different k1/b would make the merged stats misreport what the
    # searcher will score with
    for param in ("k1", "b", "block_size"):
        vals = {s.get(param) for s in all_stats}
        if len(vals) > 1:
            raise ValueError(
                f"merge_indexes: inputs disagree on {param!r}: {sorted(vals)} "
                f"(rebuild the outlier or merge compatible indexes only)")
    stats = {**base, "n_docs": int(row["n"]), "avgdl": float(row["avgdl"]),
             "total_tokens": int(row["tt"])}
    paths.stats.write_text(json.dumps(stats, indent=1, sort_keys=True))

    seg = spark.read.parquet(str(paths.segments))
    seg.groupBy("term").agg(
        F.sum("n").alias("df"), F.sum("sum_tf").alias("cf")
    ).write.mode("overwrite").parquet(str(paths.term_stats))

    stores = [str(Path(r) / "docstore") for r in in_roots
              if (Path(r) / "docstore").exists()]
    if stores:
        ds = None
        for s in stores:
            d = spark.read.parquet(s)
            ds = d if ds is None else ds.unionByName(d)
        ds.write.mode("overwrite").parquet(str(paths.docstore))

    # annotation-layer postings merge the same way as the term segments
    # (the prefixed key IS the term for the writer kernel); layer_stats
    # re-derives from merged block metadata
    layer_dirs = [str(Path(r) / "layers") for r in in_roots
                  if (Path(r) / "layers").exists()]
    if layer_dirs:
        from .build import write_layer_stats

        lt = None
        for lr in layer_dirs:
            t = decode_segments_to_tokens(spark.read.parquet(lr))
            lt = t if lt is None else lt.unionByName(t)
        (
            lt
            .withColumn("salt", F.pmod(F.hash("doc_id"), F.lit(doc_salt)))
            .repartition(nparts, F.col("term"), F.col("salt"))
            .sortWithinPartitions("term", "doc_id", "pos")
            .select(*TOKEN_INPUT_COLUMNS)
            .mapInPandas(writer, schema=SEGMENT_SCHEMA)
            .write.mode("overwrite").parquet(str(paths.layers))
        )
        write_layer_stats(spark, paths.layers, paths.layer_stats)

    # per-doc auxiliary stores fold by disjoint union (doc ids must not
    # collide across inputs — the add_documents contract)
    for aux in ("forward_layers", "doc_names"):
        dirs = [str(Path(r) / aux) for r in in_roots
                if (Path(r) / aux).exists()]
        if dirs:
            u = None
            for p in dirs:
                d = spark.read.parquet(p)
                u = d if u is None else u.unionByName(d)
            u.write.mode("overwrite").parquet(str(paths.root / aux))

    n_blocks = seg.count()
    st.commit(inputs_fp, cfg_fp,
              metrics={"n_blocks": n_blocks, "n_docs": stats["n_docs"]},
              lineage={"merged": in_roots, "config": config})
    return stats


def add_documents(
    spark: SparkSession,
    index_root: str | Path,
    new_pages: DataFrame,
    staging_root: str | Path,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    **build_kw,
) -> Path:
    """Incremental indexing: build a delta index for ``new_pages``,
    then LSM-merge it with the existing index into
    ``staging_root/merged``. Returns the merged root (caller swaps it
    in — an atomic directory rename, the parquet analog of an Iceberg
    snapshot commit).

    Doc ids in ``new_pages`` must not collide with the base index.
    """
    staging = Path(staging_root)
    delta = staging / "delta"
    merged = staging / "merged"
    build_index(spark, new_pages, delta, doc_id_col=doc_id_col,
                text_col=text_col, **build_kw)
    merge_indexes(spark, [index_root, delta], merged)
    return merged


def add_conllu_documents(
    spark: SparkSession,
    index_root: str | Path,
    new_parsed: DataFrame,
    staging_root: str | Path,
    **build_kw,
) -> Path:
    """Incremental MULTI-LAYER indexing: delta ``build_conllu_index``
    with doc ids offset past the base index's max id, then an LSM merge
    that folds segments, layers, forward layers, and the name↔id
    mapping. Returns the merged root (atomic-swap contract as
    :func:`add_documents`)."""
    from .build import build_conllu_index

    staging = Path(staging_root)
    delta = staging / "delta"
    merged = staging / "merged"
    offset = int(
        spark.read.parquet(str(Path(index_root) / "doc_lens"))
        .agg(F.max("doc_id")).collect()[0][0]) + 1
    build_conllu_index(spark, new_parsed, delta, id_offset=offset,
                       **build_kw)
    merge_indexes(spark, [index_root, delta], merged)
    return merged


def compact_if_needed(spark: SparkSession, roots: list[str | Path],
                      out_root: str | Path, max_live: int = 4) -> list[Path]:
    """Tiered compaction policy: when more than ``max_live`` delta
    indexes exist, merge them all into one (the L0→L1 step)."""
    roots = [Path(r) for r in roots]
    if len(roots) <= max_live:
        return roots
    merge_indexes(spark, roots, out_root)
    return [Path(out_root)]
