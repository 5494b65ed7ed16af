"""Iceberg table IO seam (north rule: "Iceberg table of Common-Crawl-
style web pages", "Iceberg-backed index shards").

This container ships no Iceberg runtime jars, so the module is an
HONEST seam, not a stub: the session configuration, table identifiers,
snapshot pinning, and append semantics are real Spark-Iceberg API
calls, exercised whenever the runtime has
``org.apache.iceberg.spark.SparkCatalog`` on the classpath; without it
every entry point either falls back to parquet paths (the tests' and
sandbox's route — same DataFrame out) or raises a clear error naming
the missing package. Swapping the sandbox's parquet stages for Iceberg
tables is then a config change, not a code change — which is exactly
what the manifest layer was shaped for (``index/manifest.py``: stage
commits are the snapshot-commit analog).

Usage on a real cluster::

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<v> \
        --conf spark.sql.catalog.wsl=org.apache.iceberg.spark.SparkCatalog \
        --conf spark.sql.catalog.wsl.type=hadoop \
        --conf spark.sql.catalog.wsl.warehouse=s3://bucket/warehouse ...

    pages = read_table(spark, "wsl.crawl.pages")          # Iceberg
    pages = read_table(spark, "s3://bucket/pages.parquet")  # path fallback
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_session_conf(catalog: str = "wsl", warehouse: str = "",
                         catalog_type: str = "hadoop") -> dict[str, str]:
    """The session conf a deployment passes to ``get_spark(extra_conf=…)``
    (or ``spark-submit --conf``) to mount an Iceberg catalog."""
    return {
        f"spark.sql.catalog.{catalog}": ICEBERG_CATALOG_IMPL,
        f"spark.sql.catalog.{catalog}.type": catalog_type,
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def _is_path(identifier: str) -> bool:
    return ("/" in identifier or identifier.endswith(".parquet")
            or identifier.startswith(("s3://", "s3a://", "hdfs://",
                                      "file:", ".", "/")))


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(ICEBERG_CATALOG_IMPL)
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, identifier: str,
               snapshot_id: int | None = None) -> DataFrame:
    """Read a corpus/table: an Iceberg identifier (``catalog.db.table``,
    optionally pinned to a snapshot — the reproducible-build contract)
    or a plain parquet path (sandbox fallback; ``snapshot_id`` is an
    Iceberg-only concept and rejected for paths)."""
    if _is_path(identifier):
        if snapshot_id is not None:
            raise ValueError("snapshot_id requires an Iceberg table "
                             "identifier, not a parquet path")
        return spark.read.parquet(identifier)
    if not iceberg_available(spark):
        raise RuntimeError(
            f"reading {identifier!r} as an Iceberg table needs the "
            f"iceberg-spark-runtime package on the classpath "
            f"(see sources.iceberg.iceberg_session_conf); in this "
            f"sandbox pass a parquet path instead")
    reader = spark.read.format("iceberg")
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", snapshot_id)
    return reader.load(identifier)


def write_table(df: DataFrame, identifier: str,
                mode: str = "append") -> None:
    """Write/append a stage output: Iceberg table (ACID append — the
    index-shard sink of the north rule) or a parquet directory
    (sandbox). ``mode`` is ``append`` or ``overwrite``."""
    if _is_path(identifier):
        df.write.mode(mode).parquet(identifier)
        return
    if not iceberg_available(df.sparkSession):
        raise RuntimeError(
            f"writing {identifier!r} as an Iceberg table needs the "
            f"iceberg-spark-runtime package (see iceberg_session_conf)")
    df.writeTo(identifier).append() if mode == "append" \
        else df.writeTo(identifier).createOrReplace()


def table_snapshots(spark: SparkSession, identifier: str) -> DataFrame:
    """Snapshot lineage of an Iceberg table (``<table>.snapshots``
    metadata table) — the per-build provenance record; the parquet
    fallback's analog is the stage manifest JSON."""
    if _is_path(identifier):
        raise ValueError("parquet paths have no snapshot log — read the "
                         "stage manifest (_manifest.json) instead")
    if not iceberg_available(spark):
        raise RuntimeError("snapshot listing needs the Iceberg runtime")
    return spark.read.format("iceberg").load(f"{identifier}.snapshots")
