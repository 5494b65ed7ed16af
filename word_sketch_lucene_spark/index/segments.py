"""Segment writer: sorted postings → compressed, block-max-annotated blocks.

Reference parity: Lucene's positional inverted index with skip data and
per-block impacts is what BlackLab queries walk (``README.md:700-752``,
SpanQuery O(log N) seek + O(k) decode). This module reproduces that
layout as parquet rows, one row per 128-posting block:

``(term, seg_part, block_id, n, first_doc, last_doc, max_tf, sum_tf,
max_score, docs_vb, tfs_vb, dls_vb, pos_vb)``

- ``docs_vb``: VByte(doc-id gaps within the block, first gap from
  ``first_doc``) — the skip-pointer analog is (first_doc, last_doc) on
  every block row plus parquet row-group min/max pruning on ``term``.
- ``max_score``: the *exact* max BM25 contribution of any posting in
  the block (float64, never rounded down) — block-max WAND's safe upper
  bound, generalizing the reference's logDice upper-bound prune
  (``CollocateQueryHelper.java:232-247``).
- ``dls_vb``: per-posting document lengths, so query-time scoring is
  exact without a doc-store join.
- ``pos_vb``: per-posting position lists (``[len, Δpos…]``), kept in a
  separate column so pure-BM25 scans never read them (column pruning).

The kernel runs as ``mapInPandas`` over partitions already
hash-distributed by (term-bucket, doc-salt) and sorted by
``(term, doc_id)`` — see ``build.py``. It streams Arrow batches with a
carry buffer for the term spanning a batch boundary, so memory stays
O(hot-term block) regardless of posting-list length.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark import TaskContext

from ..functions.codec import delta_encode, encode_positions, vbyte_encode
from ..functions.scoring import B, K1

BLOCK_SIZE = 128

SEGMENT_SCHEMA = (
    "term string, seg_part int, block_id int, n int, "
    "first_doc long, last_doc long, max_tf int, sum_tf long, max_score double, "
    "docs_vb binary, tfs_vb binary, dls_vb binary, pos_vb binary"
)

SEGMENT_COLUMNS = [
    "term", "seg_part", "block_id", "n", "first_doc", "last_doc",
    "max_tf", "sum_tf", "max_score", "docs_vb", "tfs_vb", "dls_vb", "pos_vb",
]


def _bm25_scores(tfs: np.ndarray, dls: np.ndarray, df: float,
                 n_docs: float, avgdl: float, k1: float, b: float) -> np.ndarray:
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * dls / avgdl))


def _emit_term_blocks(
    term: str,
    docs: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    poslists: list,
    df: float,
    part_id: int,
    n_docs: float,
    avgdl: float,
    block_size: int,
    k1: float,
    b: float,
) -> list[tuple]:
    """Cut one term's sorted postings into encoded blocks."""
    scores = _bm25_scores(tfs.astype(np.float64), dls.astype(np.float64),
                          df, n_docs, avgdl, k1, b)
    rows = []
    n = docs.size
    for block_id, lo in enumerate(range(0, n, block_size)):
        hi = min(lo + block_size, n)
        d, t, dl = docs[lo:hi], tfs[lo:hi], dls[lo:hi]
        first_doc, last_doc = int(d[0]), int(d[-1])
        rows.append((
            term, part_id, block_id, hi - lo, first_doc, last_doc,
            int(t.max()), int(t.sum()), float(scores[lo:hi].max()),
            vbyte_encode(delta_encode(d, first_delta_from=first_doc)),
            vbyte_encode(t.astype(np.uint64)),
            vbyte_encode(dl.astype(np.uint64)),
            encode_positions(poslists[lo:hi]),
        ))
    return rows


def make_segment_writer(n_docs: int, avgdl: float, block_size: int = BLOCK_SIZE,
                        k1: float = K1, b: float = B):
    """Build the ``mapInPandas`` kernel (closure over broadcast-safe scalars).

    Expects input columns ``term, doc_id, tf, dl, df, positions`` sorted
    by ``(term, doc_id)`` within the partition.
    """

    def write_segments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tc = TaskContext.get()
        part_id = tc.partitionId() if tc is not None else 0
        # carry buffer: postings of the term that may continue in the next batch
        carry_term: str | None = None
        carry: list[tuple[np.ndarray, np.ndarray, np.ndarray, list, float]] = []

        def flush(term, docs, tfs, dls, pos, df):
            return _emit_term_blocks(term, docs, tfs, dls, pos, df, part_id,
                                     float(n_docs), float(avgdl), block_size, k1, b)

        for pdf in batches:
            if pdf.empty:
                continue
            terms = pdf["term"].to_numpy()
            docs = pdf["doc_id"].to_numpy(dtype=np.int64)
            tfs = pdf["tf"].to_numpy(dtype=np.int64)
            dls = pdf["dl"].to_numpy(dtype=np.int64)
            dfs = pdf["df"].to_numpy(dtype=np.float64)
            pos = pdf["positions"].tolist()

            # term-run boundaries (terms arrive sorted within the partition)
            change = np.flatnonzero(terms[1:] != terms[:-1]) + 1
            starts = np.concatenate([[0], change])
            ends = np.concatenate([change, [terms.size]])

            out: list[tuple] = []
            for s, e in zip(starts, ends):
                term = terms[s]
                seg = (docs[s:e], tfs[s:e], dls[s:e], pos[s:e], dfs[s])
                is_last_run = e == terms.size
                if carry_term is not None and term == carry_term:
                    carry.append(seg)
                    if not is_last_run:
                        out.extend(flush(
                            carry_term,
                            np.concatenate([c[0] for c in carry]),
                            np.concatenate([c[1] for c in carry]),
                            np.concatenate([c[2] for c in carry]),
                            sum((list(c[3]) for c in carry), []),
                            carry[0][4],
                        ))
                        carry_term, carry = None, []
                    continue
                if carry_term is not None:
                    out.extend(flush(
                        carry_term,
                        np.concatenate([c[0] for c in carry]),
                        np.concatenate([c[1] for c in carry]),
                        np.concatenate([c[2] for c in carry]),
                        sum((list(c[3]) for c in carry), []),
                        carry[0][4],
                    ))
                    carry_term, carry = None, []
                if is_last_run:
                    carry_term, carry = term, [seg]
                else:
                    out.extend(flush(term, *seg[:4], seg[4]))
            if out:
                yield pd.DataFrame(out, columns=SEGMENT_COLUMNS)

        if carry_term is not None:
            out = flush(
                carry_term,
                np.concatenate([c[0] for c in carry]),
                np.concatenate([c[1] for c in carry]),
                np.concatenate([c[2] for c in carry]),
                sum((list(c[3]) for c in carry), []),
                carry[0][4],
            )
            yield pd.DataFrame(out, columns=SEGMENT_COLUMNS)

    return write_segments
