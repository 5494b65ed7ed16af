"""Streaming deduplication: exact-dup suppression over a document stream.

A crawl pipeline sees the same page again and again (recrawls, mirror
hosts); batch dedup (``operators/dedup.py``) handles the historical
corpus, and this module handles the LIVE stream before documents reach
the index builder. Two tiers:

- :func:`streaming_exact_dedup` — the built-in path:
  ``dropDuplicates`` on the content digest (state managed by Spark's
  HDFS-backed state store; unbounded unless the caller watermarks).
- :func:`streaming_dedup_stateful` — the CUSTOM stateful operator
  (``applyInPandasWithState``): one boolean state cell per digest,
  first-seen row wins, later arrivals are dropped across micro-batch
  boundaries. This is the shape a production near-dup suppressor takes
  (swap the digest for a MinHash band key and the state cell for a
  signature to get streaming near-dup suppression).

State is keyed by the 128-bit content digest — uniformly distributed,
so the state-store shuffle has no skew by construction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_exact_dedup(stream: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Built-in streaming dedup: first occurrence per content digest.

    Output rows: the input columns plus ``digest``. State grows with
    the number of distinct digests (bounded by corpus cardinality, not
    stream length).
    """
    return (
        stream.withColumn("digest", F.md5(F.col(text_col)))
        .dropDuplicates(["digest"])
    )


def streaming_dedup_stateful(stream: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """Custom stateful dedup via ``applyInPandasWithState``.

    Emits ``(digest, doc_id)`` exactly once per distinct digest — the
    first micro-batch containing it wins (min doc_id within that
    batch for determinism); every later occurrence hits the state cell
    and is suppressed. State: one boolean per digest.
    """
    hashed = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("digest"))

    def dedup_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:  # drain (required by the contract)
                pass
            return
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                best = m if best is None else min(best, m)
        if best is None:
            return
        state.update((True,))
        yield pd.DataFrame({"digest": [key[0]], "doc_id": [best]})

    return hashed.groupBy("digest").applyInPandasWithState(
        dedup_fn,
        outputStructType="digest string, doc_id long",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
