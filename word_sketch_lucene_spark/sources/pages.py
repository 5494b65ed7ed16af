"""Common-Crawl-style pages table: deterministic generator + text extractor.

North-rule ``input_hint`` shape: ``(url string, warc_ts timestamp,
html binary, text string, lang string)``.

Reference parity:
- The extractor's boilerplate semantics mirror the reference's
  prefix-match sentence filter (``filter_text_corpus.py:28-49``
  DEFAULT_PATTERNS + ``filter_text_stream`` at ``:74-150``): whole
  paragraphs whose text starts with a boilerplate prefix are dropped,
  leading ``^`` artifacts stripped.
- The per-row invariant is the reference's "byte-identical extracted
  text per url": ``text == extract_text(html)`` is a pure function and
  a tested invariant (FIXTURES.md §A).

Generation is fully distributed and deterministic: each row derives
its own RNG from ``(seed, doc_id)`` — no driver-side data, no global
state, same bytes at any parallelism (this is what makes the N vs 4N
scaling runs comparable).

Vocabulary is Zipf-distributed (~10k terms + per-doc rare terms) so
head-term skew is present even at small scale.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# prefix semantics from filter_text_corpus.py:28-49 (content differs:
# ours matches the synthetic template's boilerplate paragraphs)
BOILERPLATE_PREFIXES = (
    "Journal Information",
    "Copyright",
    "DOI:",
    "Electronic publication date:",
    "____",
)

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

VOCAB_SIZE = 10_000
ZIPF_S = 1.1
LANGS = ("en", "en", "en", "en", "en", "en", "en", "en", "de", "fr")

_P_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)
_EPOCH = np.datetime64("2024-01-01T00:00:00")


def _zipf_weights(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return w / w.sum()


_WEIGHTS = _zipf_weights(VOCAB_SIZE, ZIPF_S)
_CDF = np.cumsum(_WEIGHTS)
_VOCAB = np.array([f"t{i}" for i in range(VOCAB_SIZE)], dtype=object)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based 64-bit mixer (public splitmix64 constants) — a
    deterministic, partitioning-independent PRNG vectorized over numpy.
    Wraparound is the algorithm; mask numpy's overflow warnings."""
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return x ^ (x >> np.uint64(31))


def _uniform01(keys: np.ndarray) -> np.ndarray:
    return _splitmix64(keys).astype(np.float64) / np.float64(2**64)


def extract_text_py(html: bytes) -> str:
    """Pure extractor: paragraphs minus boilerplate, ``^`` artifacts stripped.

    Byte-identical per input — the invariant the reference states for
    its corpus pipeline (FIXTURES.md §A).
    """
    out = []
    for m in _P_RE.finditer(html):
        para = m.group(1).decode("utf-8", errors="replace")
        para = para.lstrip("^")
        if any(para.startswith(p) for p in BOILERPLATE_PREFIXES):
            continue
        if para:
            out.append(para)
    return "\n".join(out)


def _gen_batch(doc_ids: np.ndarray, seed: int) -> pd.DataFrame:
    """Vectorized page synthesis: every random draw is a pure function of
    (seed, doc_id, position) via splitmix64 — identical bytes at any
    partitioning, no per-doc RNG objects."""
    ids = doc_ids.astype(np.uint64)
    base = (np.uint64(seed) << np.uint64(32)) ^ ids
    n_tokens = (50 + (_splitmix64(base ^ np.uint64(0xA5)) % np.uint64(450))).astype(np.int64)
    lang_ix = (_splitmix64(base ^ np.uint64(0xB7)) % np.uint64(len(LANGS))).astype(np.int64)
    rare_pos = (_splitmix64(base ^ np.uint64(0xC9)) % n_tokens.astype(np.uint64)).astype(np.int64)

    # flat keys for every (doc, token position) pair
    total = int(n_tokens.sum())
    doc_rep = np.repeat(np.arange(ids.size), n_tokens)
    offsets = np.concatenate([[0], np.cumsum(n_tokens)[:-1]])
    pos_in_doc = np.arange(total) - np.repeat(offsets, n_tokens)
    u = _uniform01(base[doc_rep] ^ (np.uint64(0xD00D) + pos_in_doc.astype(np.uint64)))
    term_ids = np.searchsorted(_CDF, u)
    words = _VOCAB[np.minimum(term_ids, VOCAB_SIZE - 1)]
    # one per-doc rare term (exercises df=1 long-tail paths)
    words[offsets + rare_pos] = [f"rare{int(d)}" for d in doc_ids]

    rows = []
    for i, doc_id in enumerate(doc_ids):
        body = " ".join(words[offsets[i]: offsets[i] + n_tokens[i]])
        html = (
            b"<html><head><title>doc %d</title></head><body>"
            b"<p>Journal Information: synthetic crawl</p>"
            b"<p>Copyright 2024 nobody</p>"
            b"<p>%s</p>"
            b"<p>DOI: 10.0000/%d</p>"
            b"</body></html>" % (doc_id, body.encode(), doc_id)
        )
        rows.append((
            f"https://site{int(doc_id) % 1000}.example/p/{int(doc_id)}",
            _EPOCH + np.timedelta64(int(doc_id), "s"),
            html,
            extract_text_py(html),
            LANGS[lang_ix[i]],
        ))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def generate_pages(spark: SparkSession, n_docs: int, seed: int = 42,
                   n_partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages table (adds ``doc_id`` for joins)."""
    nparts = n_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_batch(pdf["id"].to_numpy(), seed)

    base = spark.range(0, n_docs, numPartitions=nparts)
    pages = base.mapInPandas(gen, schema=PAGES_SCHEMA)
    return pages.withColumn(
        "doc_id", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long"))


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized extractor (re-derive ``text`` from ``html``)."""
    return html.map(lambda h: extract_text_py(bytes(h)))


def boilerplate_filter(df: DataFrame, text_col: str = "text",
                       prefixes: tuple[str, ...] = BOILERPLATE_PREFIXES,
                       limit: int | None = None) -> DataFrame:
    """S5 raw-text corpus filter (``filter_text_corpus.py:74-150``):
    drop rows whose text starts with a boilerplate prefix; optional cap."""
    cond = None
    for p in prefixes:
        c = F.col(text_col).startswith(p)
        cond = c if cond is None else (cond | c)
    out = df.filter(~cond) if cond is not None else df
    return out.limit(limit) if limit else out


def assign_doc_ids(df: DataFrame, id_col: str = "doc_id",
                   order_col: str | None = None) -> DataFrame:
    """Dense unique 0-based doc ids WITHOUT a global single-partition
    window (the classic ingest scale-killer: ``row_number().over(
    Window.orderBy(...))`` shuffles the whole corpus to ONE task).

    Two-phase zipWithIndex semantics, all distributed:
    1. count rows per partition (tiny aggregate on
       ``spark_partition_id``), cumulative-sum the offsets on the
       driver (O(n_partitions) values);
    2. per-PARTITION ``row_number`` (each window is one input
       partition — parallel, spill-safe) + the partition's offset.

    Ids are dense and deterministic for a fixed input layout; ordering
    is by (partition, ``order_col``) — global order is NOT promised
    (an index doc id only needs uniqueness + density for delta coding).
    """
    from pyspark.sql import Window

    tagged = df.withColumn("_pid", F.spark_partition_id())
    counts = {r["_pid"]: r["cnt"]
              for r in tagged.groupBy("_pid")
              .agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.lit(0).cast("long")
    if offsets:
        mapping = F.create_map(
            *[F.lit(v) for kv in offsets.items() for v in kv])
        off_expr = mapping[F.col("_pid")].cast("long")
    order = order_col if order_col is not None else F.monotonically_increasing_id()
    w = Window.partitionBy("_pid").orderBy(order)
    return (
        tagged.withColumn(
            id_col,
            (off_expr + F.row_number().over(w) - 1).cast("long"))
        .drop("_pid")
    )
