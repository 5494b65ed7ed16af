"""Incremental index ingestion via Structured Streaming.

The reference has NO streaming (SURVEY §2.8) — its incremental story is
re-running ``IndexTool add`` over new chunk files. The Spark-native
upgrade: an ``availableNow`` file stream over the pages directory;
each micro-batch builds a delta index (``foreachBatch`` — exactly-once
via the stream checkpoint + the delta's own stage manifests), and
tiered LSM compaction (``index.merge``) folds deltas into the main
index. New files dropped into the directory are picked up by the next
``availableNow`` run — the operational loop of a crawl pipeline.

``windowed_event_counts`` demonstrates the watermark/window machinery
on the generic events stream (late data tolerated up to the watermark).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.build import build_index
from ..index.merge import compact_if_needed


def ingest_available_now(
    spark: SparkSession,
    pages_dir: str,
    work_dir: str | Path,
    schema: str = "doc_id long, text string",
    max_files_per_batch: int | None = None,
    **build_kw,
) -> list[Path]:
    """Process all currently-available page files into delta indexes.

    Returns the list of delta roots built this run (one per non-empty
    micro-batch). Re-running after new files arrive indexes only the
    new files (stream checkpoint tracks progress).
    """
    work = Path(work_dir)
    checkpoint = work / "_checkpoint"
    deltas_dir = work / "deltas"
    deltas_dir.mkdir(parents=True, exist_ok=True)
    built: list[Path] = []

    reader = spark.readStream.schema(schema)
    if max_files_per_batch:
        reader = reader.option("maxFilesPerTrigger", max_files_per_batch)
    stream = reader.parquet(pages_dir)

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        root = deltas_dir / f"delta_{epoch_id:06d}"
        build_index(spark, batch_df, root, **build_kw)
        built.append(root)

    q = (
        stream.writeStream
        .foreachBatch(handle_batch)
        .option("checkpointLocation", str(checkpoint))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return built


def ingest_conllu_available_now(
    spark: SparkSession,
    conllu_dir: str,
    work_dir: str | Path,
    index_root: str | Path,
    max_files_per_batch: int | None = None,
    **build_kw,
) -> Path:
    """Incremental CoNLL-U ingestion as a file stream — the streaming
    upgrade of the reference's "re-run IndexTool add on new chunk
    files" loop: an ``availableNow`` whole-file text stream over the
    corpus directory; the first non-empty batch builds the base
    multi-layer index, every later batch (and every later RUN, as new
    ``.conllu`` files land — the stream checkpoint tracks what was
    seen) folds in via ``index.merge.add_conllu_documents`` (delta
    build with offset doc ids + LSM merge of segments, layers, forward
    arrays, and the name↔id mapping).

    Returns the CURRENT index root: the base root after the first
    batch, else the newest merged root (``<work>/merged_NNNNNN`` —
    atomic-swap contract: the caller promotes it; prior roots stay
    valid for readers).
    """
    from ..index.merge import add_conllu_documents
    from ..sources.conllu import parse_conllu_files_df

    work = Path(work_dir)
    checkpoint = work / "_conllu_checkpoint"
    work.mkdir(parents=True, exist_ok=True)
    index_root = Path(index_root)
    # resume point: the newest promoted merge, else the base root
    # (merge manifests live at <root>/_manifest.json, build manifests
    # per stage under <root>/segments/)
    def _complete(p: Path) -> bool:
        return ((p / "_manifest.json").exists()
                or (p / "segments" / "_manifest.json").exists())

    merged = sorted(p for p in work.glob("merged_*") if _complete(p))
    if merged:
        current = merged[-1]
    elif _complete(index_root):
        current = index_root
    else:
        current = None
    state = {"root": current}

    reader = spark.readStream.option("wholetext", "true")
    if max_files_per_batch:
        reader = reader.option("maxFilesPerTrigger", max_files_per_batch)
    files = (reader.text(conllu_dir)
             .select(F.input_file_name().alias("file"), "value"))

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        parsed = parse_conllu_files_df(batch_df)
        if state["root"] is None:
            from ..index.build import build_conllu_index

            build_conllu_index(spark, parsed, index_root, **build_kw)
            state["root"] = index_root
        else:
            staging = work / f"stage_{epoch_id:06d}"
            merged = add_conllu_documents(spark, state["root"], parsed,
                                          staging, **build_kw)
            promoted = work / f"merged_{epoch_id:06d}"
            Path(merged).rename(promoted)
            state["root"] = promoted

    q = (
        files.writeStream
        .foreachBatch(handle_batch)
        .option("checkpointLocation", str(checkpoint))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state["root"] if state["root"] is not None else index_root


def live_delta_roots(work_dir: str | Path) -> list[Path]:
    """All delta indexes currently on disk (complete ones only)."""
    deltas_dir = Path(work_dir) / "deltas"
    if not deltas_dir.exists():
        return []
    return sorted(p for p in deltas_dir.iterdir()
                  if (p / "segments" / "_manifest.json").exists())


def compact_deltas(spark: SparkSession, work_dir: str | Path,
                   max_live: int = 4) -> list[Path]:
    """Tiered compaction of accumulated deltas (L0→L1)."""
    roots = live_delta_roots(work_dir)
    out = Path(work_dir) / "compacted"
    return compact_if_needed(spark, roots, out, max_live=max_live)


def windowed_event_counts(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked sliding-window aggregation over a file stream,
    drained synchronously (availableNow + memory sink) — the engine's
    streaming-agg capability demo on the generic events table."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide or window), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )
    name = f"windowed_events_{abs(hash(events_dir)) % 10**6}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"SELECT window.start AS ws, window.end AS we, event_type, n, "
        f"total_value FROM {name}")
