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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes_out", T.LongType()),
        T.StructField("out_md5", T.StringType()),
    ]
)


def resize_payloads(blobs: DataFrame, max_bytes: int = 256) -> DataFrame:
    """Resize plumbing (image downscale analog): payload in → smaller
    payload out, one row per row, Arrow-batched. The real version
    decodes + resamples via an imaging library; the STUB truncates to
    ``max_bytes`` — a deterministic, engine-independent byte transform
    so the whole Python path stays oracle-checkable. Pipeline shape is
    the production one: mapInPandas, no shuffle, partitioning
    inherited from the scan."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["blob"].map(lambda p: bytes(p)[:max_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes_out": out.map(len).astype("int64"),
                    "out_md5": out.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return blobs.select("doc_id", "blob").mapInPandas(fn, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(
    blobs: DataFrame, frame_bytes: int = 64, stride: int = 4
) -> DataFrame:
    """Frame-sampling plumbing (video → every k-th frame): the ONE
    multimodal op whose cardinality changes (1 payload → N frame
    rows), which is exactly what mapInPandas expresses and a scalar
    pandas_udf cannot. The STUB treats the payload as fixed-size
    ``frame_bytes`` frames and emits every ``stride``-th one with a
    content digest; a real decoder would emit decoded frame tensors.
    Output stays partitioned like the input — downstream per-frame
    feature extraction pipelines without a shuffle."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            digests: list[str] = []
            for did, p in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(p)
                for i in range(0, len(b) // frame_bytes, stride):
                    ids.append(int(did))
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(
                            b[i * frame_bytes : (i + 1) * frame_bytes]
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_md5": pd.Series(digests, dtype="object"),
                }
            )

    return blobs.select("doc_id", "blob").mapInPandas(fn, FRAME_SCHEMA)
