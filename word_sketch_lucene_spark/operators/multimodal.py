"""Multimodal columns: opaque binary payloads + typed metadata.

Training-data pipelines carry images/audio/video as ``binary`` columns
with a typed metadata struct. The Spark-side plumbing here — schemas,
Arrow batch shapes, ``mapInPandas`` signatures, partition sizing — is
REAL and tested; the codec step is STUBBED because this container has
no image/audio libraries: :func:`decode_image` raises
``NotImplementedError`` unless PIL is importable, and the deterministic
fake-payload path exercises everything around it.

Payload format of the synthetic generator (a stand-in for JPEG/WAV
headers): ``b"FAKEIMG1" + width:uint32le + height:uint32le +
channels:uint8 + body`` — header parsing in
:func:`extract_media_meta` is the real work a decoder front-end does.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.pages import _splitmix64

MAGIC = b"FAKEIMG1"

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bytes", T.LongType(), True),
    ]), True),
])


def generate_media(spark: SparkSession, n: int, seed: int = 3,
                   n_partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic media table (distributed, no driver data).

    Partition count sizes to the DATA (~2k rows/partition floor), not
    the cluster — two chained mapInPandas stages over 32 near-empty
    partitions is pure python-worker fixed cost.
    """
    nparts = n_partitions or max(
        1, min(spark.sparkContext.defaultParallelism, n // 2000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                base = (np.uint64(seed) << np.uint64(32)) ^ np.uint64(i)
                w = int(_splitmix64(base ^ np.uint64(1)) % np.uint64(512)) + 16
                h = int(_splitmix64(base ^ np.uint64(2)) % np.uint64(512)) + 16
                c = 3
                body_len = int(_splitmix64(base ^ np.uint64(3)) % np.uint64(256))
                payload = (MAGIC + struct.pack("<IIB", w, h, c)
                           + bytes((int(x) % 251 for x in range(body_len))))
                rows.append((int(i), "image", payload,
                             (w, h, c, len(payload))))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(0, n, numPartitions=nparts).mapInPandas(
        gen, schema=MEDIA_SCHEMA)


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Re-derive the metadata struct from payload headers (Arrow-batched
    ``mapInPandas`` — the real decoder front-end shape).

    Returns ``(media_id, width, height, channels, bytes, valid)``.
    """
    out_schema = ("media_id long, width int, height int, channels int, "
                  "bytes long, valid boolean")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                if p[:8] == MAGIC and len(p) >= 17:
                    w, h, c = struct.unpack("<IIB", p[8:17])
                    rows.append((int(mid), w, h, c, len(p), True))
                else:
                    rows.append((int(mid), None, None, None, len(p), False))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height",
                                              "channels", "bytes", "valid"])

    return media.select("media_id", "payload").mapInPandas(parse, out_schema)


def media_features(media: DataFrame, dim: int = 64,
                   payload_col: str = "payload",
                   id_col: str = "media_id") -> DataFrame:
    """Feature extraction: payload bytes → L2-normalized ``dim``-bucket
    byte histogram as ``embedding array<float>`` — the REAL Spark side
    of an embedding pipeline (Arrow batch shape, schema, partition
    flow); a deployment swaps the histogram for a model forward pass in
    the same kernel. Output plugs straight into the similarity tier
    (``operators.similarity.cosine_topk`` / ``lsh_cosine_topk`` /
    ``cosine_near_dup_pairs`` keyed on ``vec_id``).
    """
    out_schema = f"vec_id long, embedding array<float>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(bytes(payload or b""), dtype=np.uint8)
                hist = np.bincount(b % dim, minlength=dim) \
                    .astype(np.float64)
                n = np.linalg.norm(hist)
                if n > 0:
                    hist /= n
                ids.append(int(mid))
                vecs.append(hist.astype(np.float32).tolist())
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return media.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def decode_image(payload: bytes):
    """STUB: real decode requires an image library not present in this
    container. The call signature and error contract are the deployment
    surface; swap the body for ``PIL.Image.open`` there."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL/pillow (not installed in this "
            "container); payload plumbing is tested via extract_media_meta"
        ) from e
    raise NotImplementedError("real decoder wiring is deployment-specific")


def resize_plan(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize *plan*: computes per-item scale factors + output shapes
    JVM-side from metadata (the part Spark owns); the pixel work would
    run in the decode UDF at deployment. Returns
    ``(media_id, scale_x, scale_y, out_w, out_h)``."""
    return media.select(
        "media_id",
        (F.lit(target_w) / F.col("meta.width")).alias("scale_x"),
        (F.lit(target_h) / F.col("meta.height")).alias("scale_y"),
        F.lit(target_w).alias("out_w"),
        F.lit(target_h).alias("out_h"),
    )


def frame_sample_plan(media: DataFrame, n_frames: int,
                      duration_col: str = "meta.bytes") -> DataFrame:
    """Frame-sampling *plan* for video-like payloads: evenly spaced
    sample offsets from a length proxy, exploded one row per frame —
    the partition/row shape a real ffmpeg UDF would consume."""
    return media.select(
        "media_id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(n_frames - 1)),
            lambda i: (i * F.col(duration_col).cast("long")
                       / F.lit(n_frames)).cast("long"),
        )).alias("frame_offset"),
    )
