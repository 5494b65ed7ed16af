"""Text QC expressions and multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from word_sketch_lucene_spark.operators.multimodal import (
    decode_image,
    extract_media_meta,
    frame_sample_plan,
    generate_media,
    resize_plan,
)
from word_sketch_lucene_spark.operators.textqc import (
    FP_MOD,
    FP_MUL,
    fingerprints,
    lang_id,
    quality_features,
    token_counts,
)


def test_lang_id_markers(spark):
    df = spark.createDataFrame([
        (0, "the cat and the dog of it is that"),
        (1, "der hund und die katze ist nicht"),
        (2, "le chat et la maison est une"),
        (3, "xyzzy plugh qwerty"),
    ], ["doc_id", "text"])
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "und"}


def test_quality_features_golden(spark):
    df = spark.createDataFrame([(0, "the quick brown fox")], ["doc_id", "text"])
    r = quality_features(df).collect()[0]
    assert r["n_chars"] == 19 and r["n_tokens"] == 4
    assert r["punct_ratio"] == 0.0
    assert r["stopword_ratio"] == pytest.approx(0.25)
    assert r["mean_token_len"] == pytest.approx(16 / 4)
    assert 0.0 <= r["quality"] <= 1.0


def test_token_counts_golden(spark):
    df = spark.createDataFrame([(0, "hello world"), (1, "")], ["doc_id", "text"])
    got = {r["doc_id"]: (r["ws_tokens"], r["subword_est"])
           for r in token_counts(df).collect()}
    assert got[0] == (2, 3)  # ceil(11/4)=3 > 2 words
    assert got[1] == (0, 0)


def test_fingerprint_matches_python(spark, docs_small):
    from word_sketch_lucene_spark.functions.tokenize import tokenize_py

    got = {r["doc_id"]: r["fingerprint"]
           for r in fingerprints(docs_small.limit(20)).collect()}
    pdf = docs_small.limit(20).select("doc_id", "text").toPandas()
    for _, row in pdf.iterrows():
        acc = 0
        for t in tokenize_py(row["text"]):
            acc = (acc * FP_MUL + len(t) * 131 + ord(t[0])) % FP_MOD
        assert got[row["doc_id"]] == acc


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame([(0, "a b"), (1, "b a")], ["doc_id", "text"])
    fps = [r["fingerprint"] for r in fingerprints(df).collect()]
    assert fps[0] != fps[1]


# ------------------------------------------------------------ multimodal
def test_media_meta_roundtrip(spark):
    media = generate_media(spark, 50, seed=3)
    meta = extract_media_meta(media).collect()
    orig = {r["media_id"]: r["meta"] for r in media.collect()}
    assert len(meta) == 50
    for r in meta:
        assert r["valid"]
        m = orig[r["media_id"]]
        assert (r["width"], r["height"], r["channels"]) == (m["width"], m["height"], m["channels"])
        assert r["bytes"] == m["bytes"]


def test_media_invalid_payload(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [0], "payload": [b"NOTMAGIC123"]}))
    r = extract_media_meta(df).collect()[0]
    assert not r["valid"] and r["width"] is None


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError, match="PIL|decoder"):
        decode_image(b"FAKEIMG1xxxx")


def test_resize_and_frame_plans(spark):
    media = generate_media(spark, 10)
    rp = resize_plan(media, 224, 224).collect()
    orig = {r["media_id"]: r["meta"] for r in media.collect()}
    for r in rp:
        assert r["scale_x"] == pytest.approx(224 / orig[r["media_id"]]["width"])
    fp = frame_sample_plan(media, 4)
    assert fp.count() == 40
    offs = [r["frame_offset"] for r in fp.filter(F.col("media_id") == 0)
            .orderBy("frame_offset").collect()]
    assert offs == sorted(offs) and offs[0] == 0


def test_media_features_feed_similarity_tier(spark):
    """Multimodal → ANN integration: payload byte-histogram embeddings
    are unit-norm, deterministic, and plug into the cosine machinery
    (every item's nearest neighbor at rank 1 is itself)."""
    import numpy as np
    from pyspark.sql import functions as F

    from word_sketch_lucene_spark.operators.multimodal import (
        generate_media,
        media_features,
    )
    from word_sketch_lucene_spark.operators.similarity import cosine_topk

    media = generate_media(spark, 60, seed=3)
    emb = media_features(media, dim=32).cache()
    rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    assert len(rows) == 60
    norms = [float(np.linalg.norm(v)) for v in rows.values()]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)
    # determinism: regenerating yields identical vectors
    again = {r["vec_id"]: r["embedding"] for r in
             media_features(generate_media(spark, 60, seed=3),
                            dim=32).collect()}
    assert again == rows

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    top = cosine_topk(emb, queries, k=3, round_dp=4)
    best = {r["query_id"]: r["vec_id"] for r in
            top.filter(F.col("rank") == 1).collect()}
    assert best == {q: q for q in range(5)}
    emb.unpersist()
