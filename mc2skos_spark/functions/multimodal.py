"""Multimodal-column plumbing: binary payloads with typed metadata.

Image/audio/video ride as opaque ``binary`` columns next to typed
metadata; decode / feature-extract run as Arrow-batch UDFs over
``mapInPandas``.  The decode libraries (PIL/ffmpeg/etc.) are NOT in this
container, so the decode step is a clearly-marked deterministic stub —
but the Spark-side plumbing (schema, batch shape, partitioning, UDF
signature) is real and tested, and a real decoder drops into
``_decode_stub`` unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta_width", T.IntegerType()),
    T.StructField("meta_height", T.IntegerType()),
    T.StructField("meta_duration_ms", T.IntegerType()),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload_bytes", T.IntegerType()),
    T.StructField("content_digest", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB decoder: deterministic 8-dim feature from a content digest.

    Replace with a real decode (PIL resize / librosa frames / frame
    sampling) when the codec libraries are available; the function
    contract — bytes in, fixed-dim float feature out — is what the
    pipeline depends on.
    """
    digest = hashlib.sha256(payload + kind.encode()).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_media_features(media: DataFrame,
                           balance: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Binary columns are large: ``balance=True`` hash-repartitions by
    media_id so Arrow batches stay size-bounded regardless of upstream
    skew; pass ``balance=False`` when the input is already well spread
    (saves a full-payload shuffle — the expensive part when payloads
    are MBs).  Rows per Arrow batch are governed by the session's
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` — lower it for
    multi-MB payloads.  Payloads never reach the driver.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            # NULL payloads (the schema permits them) yield NULL
            # features instead of crashing the whole stage on len(None)
            out = {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload_bytes": batch["payload"].map(
                    lambda b: len(b) if b is not None else None),
                "content_digest": batch["payload"].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    if b is not None else None),
                "feature": [
                    _decode_stub(bytes(p), k) if p is not None else None
                    for p, k in zip(batch["payload"], batch["kind"])],
            }
            yield pd.DataFrame(out)

    source = media.repartition(F.xxhash64("media_id")) if balance else media
    return source.mapInPandas(fn, schema=FEATURES_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    import random
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
        rows.append((i, kind, payload,
                     640 if kind == "image" else None,
                     480 if kind == "image" else None,
                     1000 * rng.randint(1, 60) if kind != "image" else None))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
