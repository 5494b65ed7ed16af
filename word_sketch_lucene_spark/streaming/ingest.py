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
