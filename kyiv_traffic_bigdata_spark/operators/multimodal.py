"""Multimodal (binary) column plumbing — north-star operator family.

Pattern: media (image/audio/video) travels as an opaque ``binary`` column
plus a typed metadata struct; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes never cross the JVM↔Python boundary
row-at-a-time. The actual codecs are NOT available in this environment —
the decode step is a clearly-marked deterministic stub
(:func:`fake_decode_features`) so the Spark-side contract (schema,
batching, partition behavior) is real and tested, and swapping in a real
decoder is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of the feature extractor (stable across the stub and any
#: real decoder: keep width fixed, add fields only at the end).
MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("header_hex", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str, media_type: str = "text/plain"
) -> DataFrame:
    """Wrap a column as the canonical multimodal layout:
    (media_id, payload binary, meta struct<media_type, n_bytes>).

    The driver testdata has no real media, so documents' text bytes stand
    in as payload; with real data this is the parquet/source column as-is.
    """
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def real_decode(payload: bytes) -> list[float]:  # pragma: no cover - stub
    """Placeholder for a real image/audio decoder (libs absent here)."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "use fake_decode_features for the deterministic test path"
    )


def fake_decode_features(payload: bytes, dim: int = 4) -> list[float]:
    """Deterministic stand-in decode: fixed-dim features from byte stats."""
    if not payload:
        return [0.0] * dim
    n = len(payload)
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload) % 997),
    ][:dim]


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    ``mapInPandas`` processes whole Arrow batches; per-batch Python cost is
    amortized, and the operator parallelizes per input partition — at
    100 TB, partition sizing (spark.sql.files.maxPartitionBytes) is the
    throughput knob, not this function.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "header_hex": payloads.map(lambda b: bytes(b)[:8].hex()),
                    "feature": payloads.map(fake_decode_features),
                }
            )

    return media.mapInPandas(batches, MEDIA_FEATURES_SCHEMA)
