"""Subcorpus keyword extraction (Dunning G²) vs a pure-python oracle."""

from __future__ import annotations

import math
import re
from collections import Counter

from word_sketch_lucene_spark.operators.keywords import subcorpus_keywords

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the dog ate the bone and the cat", "en"),
    (2, "le chat est sur le tapis", "fr"),
    (3, "le chien mange le os le chat", "fr"),
    (4, "the bird saw the cat fly", "en"),
]


def _py_keywords(k: int = 20):
    fa: Counter = Counter()
    fb: Counter = Counter()
    for _, text, lang in DOCS:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        (fa if lang != "en" else fb).update(toks)
    na, nb = sum(fa.values()), sum(fb.values())
    out = []
    for t in set(fa) | set(fb):
        a, b = fa[t], fb[t]
        if a * nb <= b * na:
            continue
        e1 = na * (a + b) / (na + nb)
        e2 = nb * (a + b) / (na + nb)
        g2 = 2.0 * ((a * math.log(a / e1) if a else 0.0)
                    + (b * math.log(b / e2) if b else 0.0))
        out.append((t, a, b, round(g2, 4)))
    out.sort(key=lambda r: (-r[3], r[0]))
    return out[:k]


def test_subcorpus_keywords_matches_python_oracle(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    got = [(r["term"], r["fa"], r["fb"], r["g2"])
           for r in subcorpus_keywords(docs, "lang <> 'en'", k=20).collect()]
    assert got == _py_keywords()
    # the French function words dominate the keyness ranking
    assert got[0][0] == "le"


def test_index_keywords_identical_to_dataframe_path(spark, tmp_path):
    from word_sketch_lucene_spark.index.build import build_index
    from word_sketch_lucene_spark.query.engine import IndexSearcher

    docs = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    root = tmp_path / "kwidx"
    build_index(spark, docs, root, doc_salt=2, n_partitions=4)
    s = IndexSearcher(spark, root)
    idx = [(r["term"], r["fa"], r["fb"], r["g2"])
           for r in s.subcorpus_keywords("lang <> 'en'", k=20).collect()]
    df = [(r["term"], r["fa"], r["fb"], r["g2"])
          for r in subcorpus_keywords(docs, "lang <> 'en'", k=20).collect()]
    assert idx == df
