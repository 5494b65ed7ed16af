"""Exact in-memory BM25 oracle (pure Python, driver-side, test-only).

The rank-identity contract (north rule: "matching the reference's
top-k docIDs and BM25 scores rank-identically") is verified against
this brute-force scorer, mirroring the reference's stub-backed
integration-test strategy (``query/BlackLabIntegrationTest.java:45-110``
injects deterministic frequencies and asserts end-to-end ranking).

Tie-break is deterministic: ``(score desc, doc_id asc)`` — SURVEY §4.3.
"""

from __future__ import annotations

import math
from collections import Counter

from ..functions.scoring import B, K1, bm25_score_py
from ..functions.tokenize import tokenize_py


class BM25Oracle:
    """Builds full postings in memory; scores queries exactly."""

    def __init__(self, doc_tokens: dict[int, list[str]], k1: float = K1, b: float = B):
        self.k1, self.b = k1, b
        # zero-token docs are excluded from dl/N/avgdl — Lucene docCount
        # semantics, and what the engine paths compute (doc_lens comes
        # from the exploded token table, so empty docs never appear)
        self.dl = {d: len(t) for d, t in doc_tokens.items() if t}
        self.n_docs = len(self.dl)
        self.avgdl = sum(self.dl.values()) / self.n_docs if self.n_docs else 0.0
        self.postings: dict[str, dict[int, int]] = {}
        self.positions: dict[str, dict[int, list[int]]] = {}
        for d, toks in doc_tokens.items():
            for pos, t in enumerate(toks):
                self.postings.setdefault(t, {})
                self.positions.setdefault(t, {}).setdefault(d, []).append(pos)
            for t, c in Counter(toks).items():
                self.postings[t][d] = c

    @classmethod
    def from_texts(cls, doc_texts: dict[int, str], **kw) -> "BM25Oracle":
        return cls({d: tokenize_py(t) for d, t in doc_texts.items()}, **kw)

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def cf(self, term: str) -> int:
        return sum(self.postings.get(term, {}).values())

    def idf(self, term: str) -> float:
        d = self.df(term)
        return math.log(1.0 + (self.n_docs - d + 0.5) / (d + 0.5))

    def score_doc(self, terms: list[str], doc_id: int) -> float:
        """Sum of per-term contributions, in query-term order (FP-stable)."""
        s = 0.0
        for t in terms:
            tf = self.postings.get(t, {}).get(doc_id, 0)
            if tf:
                s += bm25_score_py(tf, self.df(t), self.dl[doc_id],
                                   self.n_docs, self.avgdl, self.k1, self.b)
        return s

    def topk(self, terms: list[str], k: int = 10) -> list[tuple[int, float]]:
        """Exact top-k over the union of candidate docs (OR semantics)."""
        cand: set[int] = set()
        for t in terms:
            cand.update(self.postings.get(t, {}))
        scored = [(d, self.score_doc(terms, d)) for d in cand]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
