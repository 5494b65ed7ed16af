"""Synthetic pages generator invariants (FIXTURES.md §A)."""

import pandas as pd
from pyspark.sql import functions as F

from word_sketch_lucene_spark.sources.pages import (
    boilerplate_filter,
    extract_text_py,
    extract_text_udf,
    generate_pages,
)


def test_schema_matches_input_hint(spark):
    pages = generate_pages(spark, 10)
    types = dict(pages.dtypes)
    assert types["url"] == "string"
    assert types["warc_ts"] == "timestamp"
    assert types["html"] == "binary"
    assert types["text"] == "string"
    assert types["lang"] == "string"


def test_deterministic_across_parallelism(spark):
    """Same bytes regardless of partitioning — N vs 4N comparability."""
    a = generate_pages(spark, 200, seed=7, n_partitions=2).orderBy("doc_id").toPandas()
    b = generate_pages(spark, 200, seed=7, n_partitions=16).orderBy("doc_id").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_text_byte_identical_to_extraction(spark):
    """The north-rule invariant: text == extract_text(html), byte-exact."""
    pages = generate_pages(spark, 100, seed=3)
    mismatches = (
        pages.withColumn("re_text", extract_text_udf("html"))
        .filter(F.col("re_text") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_extractor_drops_boilerplate():
    html = (b"<html><body><p>Journal Information: x</p><p>^real content here</p>"
            b"<p>DOI: 10.1/1</p><p>____ divider</p><p>more text</p></body></html>")
    assert extract_text_py(html) == "real content here\nmore text"


def test_boilerplate_filter_rows(spark):
    df = spark.createDataFrame(
        [("Copyright 2020",), ("keep me",), ("DOI: 1",)], ["text"])
    kept = [r["text"] for r in boilerplate_filter(df).collect()]
    assert kept == ["keep me"]


def test_zipf_skew_present(spark):
    """Head term must dominate the tail — skew is a build requirement."""
    from word_sketch_lucene_spark.functions.tokenize import explode_tokens

    pages = generate_pages(spark, 300, seed=11)
    counts = (
        explode_tokens(pages).groupBy("term").count()
        .orderBy(F.desc("count")).limit(1).collect()
    )
    total = explode_tokens(pages).count()
    assert counts[0]["count"] > total / 50  # t0 carries >2% of all tokens


def test_assign_doc_ids_multi_partition(spark):
    """Dense unique ids at >=2 partitions, no single-partition window
    (the ingest-CLI scale fix)."""
    from word_sketch_lucene_spark.sources.pages import assign_doc_ids

    df = spark.range(0, 1000, 1, 8).select(
        (F.col("id") * 7 % 1000).cast("string").alias("url"),
        F.lit("x").alias("text"))
    out = assign_doc_ids(df, "doc_id", order_col="url")
    ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    assert sorted(ids) == list(range(1000))
    # plan gate: every window is partitioned (no "No Partition Defined")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    import re
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "_pid" in m.group(1)


def test_assign_doc_ids_deterministic(spark):
    from word_sketch_lucene_spark.sources.pages import assign_doc_ids

    df = spark.range(0, 200, 1, 4).select(
        F.col("id").cast("string").alias("url"), F.lit("t").alias("text"))
    a = assign_doc_ids(df, "doc_id", order_col="url") \
        .select("url", "doc_id").collect()
    b = assign_doc_ids(df, "doc_id", order_col="url") \
        .select("url", "doc_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_iceberg_seam_path_fallback_and_guards(spark, tmp_path):
    """The Iceberg seam: parquet paths round-trip through read/write;
    Iceberg-only features fail fast with actionable errors when the
    runtime (absent in this sandbox) is missing; the session conf is
    the documented catalog mount."""
    import pytest

    from word_sketch_lucene_spark.sources.iceberg import (
        iceberg_available,
        iceberg_session_conf,
        read_table,
        table_snapshots,
        write_table,
    )

    conf = iceberg_session_conf("wsl", "s3://bucket/wh")
    assert conf["spark.sql.catalog.wsl"].endswith("SparkCatalog")
    assert conf["spark.sql.catalog.wsl.warehouse"] == "s3://bucket/wh"

    p = str(tmp_path / "t.parquet")
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    write_table(df, p, mode="overwrite")
    assert read_table(spark, p).count() == 5
    write_table(df, p, mode="append")
    assert read_table(spark, p).count() == 10

    with pytest.raises(ValueError, match="snapshot"):
        read_table(spark, p, snapshot_id=1)
    with pytest.raises(ValueError, match="manifest"):
        table_snapshots(spark, p)
    if not iceberg_available(spark):
        with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            read_table(spark, "wsl.crawl.pages")
        with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            write_table(df, "wsl.crawl.pages")
