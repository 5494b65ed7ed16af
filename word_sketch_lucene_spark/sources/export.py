"""Export sinks: CSV (RFC-4180) and XML serialization.

Reference parity (S8, ``api/ExportUtils.java:26-361``): sketch /
example / exploration responses serialize to CSV with RFC-4180 quote
doubling and to escaped XML, capped by a row limit. Spark mapping: the
built-in CSV writer already implements RFC-4180 (``quoteAll`` +
doubled quotes); XML rows are built as one Catalyst string expression
(F9 escaping via nested ``replace`` — JVM-side, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def export_csv(df: DataFrame, path: str, limit: int | None = None) -> None:
    """RFC-4180 CSV with header; ``limit`` mirrors the reference's
    row-limit cap (``ExportUtils.java`` limit parameter)."""
    out = df.limit(limit) if limit else df
    (
        out.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)      # RFC-4180: quote + double quotes
        .option("escape", '"')
        .csv(path)
    )


def xml_escape_expr(col: Column) -> Column:
    """XML attribute/text escaping (&, <, >, \", ') as a pure expression
    chain — the F9 ``escapeXml`` analog (``ExportUtils.java:300-361``)."""
    c = F.replace(col, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    c = F.replace(c, F.lit('"'), F.lit("&quot;"))
    return F.replace(c, F.lit("'"), F.lit("&apos;"))


def to_xml_rows(df: DataFrame, row_tag: str = "row") -> DataFrame:
    """Each row → one ``<row .../>`` element string column ``xml``."""
    parts = [F.lit(f"<{row_tag}")]
    for name in df.columns:
        parts.append(F.lit(f' {name}="'))
        parts.append(xml_escape_expr(F.col(name).cast("string")))
        parts.append(F.lit('"'))
    parts.append(F.lit("/>"))
    return df.select(F.concat(*parts).alias("xml"))


def export_xml(df: DataFrame, path: str, root_tag: str = "results",
               row_tag: str = "row", limit: int | None = None) -> None:
    """Write an XML document (single part file, wrapped in a root tag)."""
    out = df.limit(limit) if limit else df
    rows = to_xml_rows(out, row_tag)
    wrapped = (
        rows.select("xml")
        .coalesce(1)
    )
    # header/footer via union of literal rows (keeps everything in Spark)
    spark = df.sparkSession
    head = spark.createDataFrame([(f"<{root_tag}>",)], ["xml"])
    tail = spark.createDataFrame([(f"</{root_tag}>",)], ["xml"])
    head.unionByName(wrapped).unionByName(tail).coalesce(1) \
        .write.mode("overwrite").text(path)
