"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload travels as a
``binary`` column (or a reference to object storage) next to typed
metadata; decode/feature-extraction runs as Arrow-batched Pandas UDFs
via mapInPandas so each executor core streams record batches through
Python once, with no per-row overhead. The decode itself is STUBBED
here (no image/audio libraries in this container): ``decode_image``
raises NotImplementedError unless a deterministic fake decoder is
requested — the Spark-side schema, partitioning, UDF signature and
batch shape are real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha16", T.StringType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
        T.StructField("fake_channels", T.LongType()),
    ]
)


def to_blob_table(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Wrap a payload as (id, blob, metadata-struct). With real media
    the blob arrives from the source; here we encode the text column."""
    blob = F.encode(F.col(payload_col), "UTF-8")
    return df.select(
        F.col(id_col),
        blob.alias("blob"),
        F.struct(
            F.octet_length(blob).cast("long").alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, int]:
    """STUB: real image decode needs PIL/libvips — not in this
    container. ``fake=True`` derives deterministic pseudo-dimensions
    from a content digest (stable across runs and engines)."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library; run with fake=True "
            "for the deterministic test double"
        )
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192  # 64..255
    height = 64 + digest[1] % 192
    channels = 1 + digest[2] % 3  # 1..3
    return width, height, channels


def extract_features(blobs: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    100 TB shape: one Arrow batch in, one feature batch out, pipelined
    per partition (no shuffle; partitioning inherited from the scan)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["blob"]
            dims = [decode_image(p, fake=fake_decode) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha16": payloads.map(
                        lambda p: hashlib.sha256(p).hexdigest()[:16]
                    ),
                    "fake_width": pd.Series([d[0] for d in dims], dtype="int64"),
                    "fake_height": pd.Series([d[1] for d in dims], dtype="int64"),
                    "fake_channels": pd.Series([d[2] for d in dims], dtype="int64"),
                }
            )

    return blobs.select("doc_id", "blob").mapInPandas(fn, FEATURE_SCHEMA)
