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


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples/pixel


def encode_png(
    width: int, height: int, pixels: bytes, channels: int = 1, filter_type: int = 0
) -> bytes:
    """Minimal REAL PNG encoder (stdlib only): 8-bit gray/RGB/RGBA,
    one filter type applied to every scanline. Used by tests and the
    png round-trip query to manufacture genuine decodable images."""
    import struct
    import zlib

    color_type = {1: 0, 3: 2, 4: 6}[channels]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    stride = width * channels
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = bytes(pixels[y * stride : (y + 1) * stride].ljust(stride, b"\x00"))
        raw.append(filter_type)
        raw.extend(_png_filter(filter_type, line, prev, channels))
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal REAL BMP encoder (stdlib only): 8-bit indexed with a
    256-entry grayscale palette (BITMAPINFOHEADER, BI_RGB). Rows are
    stored bottom-up and padded to 4 bytes — the classic on-disk
    layout. Pairs with ``decode_bmp`` for the second real-decoder
    round-trip (PNG being the first)."""
    import struct

    stride = (width + 3) & ~3
    palette = b"".join(bytes((g, g, g, 0)) for g in range(256))
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        line = pixels[y * width : (y + 1) * width].ljust(width, b"\x00")
        rows.append(bytes(line).ljust(stride, b"\x00"))
    data = b"".join(rows)
    off = 14 + 40 + len(palette)
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0, len(data), 2835, 2835, 256, 0
    )
    return header + info + palette + data


def decode_bmp(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL BMP decode, stdlib only: BITMAPINFOHEADER, 8-bit indexed
    (grayscale palette assumed ⇒ 1 channel) or 24-bit BI_RGB. Handles
    bottom-up AND top-down (negative height) row order and 4-byte row
    padding. Returns (width, height, channels, pixels)."""
    import struct

    buf = bytes(payload)
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", buf, 10)
    size, width, height = struct.unpack_from("<Iii", buf, 14)
    if size < 40:
        raise NotImplementedError(f"BMP header size {size} unsupported")
    planes, bpp, compression = struct.unpack_from("<HHI", buf, 26)
    if compression != 0 or bpp not in (8, 24):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    top_down = height < 0
    height = abs(height)
    nch = 1 if bpp == 8 else 3
    stride = ((width * bpp // 8) + 3) & ~3
    out = bytearray()
    ys = range(height) if top_down else range(height - 1, -1, -1)
    for y in ys:
        row = buf[off + y * stride : off + y * stride + width * (bpp // 8)]
        if bpp == 24:
            # BGR → RGB
            for x in range(width):
                b, g, r = row[3 * x : 3 * x + 3]
                out.extend((r, g, b))
        else:
            out.extend(row)
    return width, height, nch, bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_filter(ft: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray(len(line))
    for i, x in enumerate(line):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            out[i] = x
        elif ft == 1:
            out[i] = (x - a) & 0xFF
        elif ft == 2:
            out[i] = (x - b) & 0xFF
        elif ft == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ft == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter {ft}")
    return bytes(out)


def _png_unfilter(ft: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray(len(line))
    for i, x in enumerate(line):
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            out[i] = x
        elif ft == 1:
            out[i] = (x + a) & 0xFF
        elif ft == 2:
            out[i] = (x + b) & 0xFF
        elif ft == 3:
            out[i] = (x + (a + b) // 2) & 0xFF
        elif ft == 4:
            out[i] = (x + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter {ft}")
    return bytes(out)


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL PNG decode, stdlib only: parses chunks, inflates IDAT,
    reverses scanline filters 0-4. Supports 8-bit depth, color types
    0/2/4/6, no interlace — exactly what encode_png (and most tiny
    test fixtures) produce. Returns (width, height, channels, pixels).
    """
    import struct
    import zlib

    buf = bytes(payload)
    if buf[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, width = 8, None
    idat = bytearray()
    while pos < len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"unsupported PNG: depth={depth} color={color_type} "
                    f"interlace={interlace}"
                )
            channels = _PNG_CHANNELS[color_type]
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    pixels = bytearray()
    prev = bytes(stride)
    for y in range(height):
        off = y * (stride + 1)
        line = _png_unfilter(raw[off], raw[off + 1 : off + 1 + stride], prev, channels)
        pixels.extend(line)
        prev = line
    return width, height, channels, bytes(pixels)


# Magic-byte table for the strict dispatch contract: format is decided
# from the payload header ONLY (never from metadata), and ``decodable``
# means "this build has a REAL decoder for it" — today PNG and BMP
# (the stdlib codecs above). Every registered query routes
# non-decodable formats to the deterministic digest fake; the
# NotImplementedError below is reachable only by calling
# decode_image(fake=False) directly on a non-decodable payload.
_MAGIC = (
    ("png", PNG_MAGIC),
    ("jpeg", b"\xff\xd8\xff"),
    ("gif", b"GIF8"),
    ("bmp", b"BM"),
    ("webp", b"RIFF"),  # refined below: RIFF....WEBP
    ("pdf", b"%PDF"),
)
DECODABLE_FORMATS = frozenset({"png", "bmp"})  # formats with REAL decoders


def detect_format(payload: bytes) -> str:
    """Sniff the container format from leading magic bytes. Returns a
    lowercase tag ('png', 'jpeg', …) or 'other' for unrecognized
    headers — the single source of truth for decode routing. The 'BM'
    magic is only 2 ASCII bytes, so bmp additionally requires a valid
    BITMAPINFOHEADER size dword (structural check) — plain text that
    happens to start with 'BM' must NOT route to the real decoder."""
    head = bytes(payload[:18])
    for tag, magic in _MAGIC:
        if head.startswith(magic):
            if tag == "webp" and head[8:12] != b"WEBP":
                continue
            # only the INFOHEADER family decode_bmp actually parses —
            # a COREHEADER (0x0c) file must sniff 'other' and take the
            # fake path rather than crash the strict decoder
            if tag == "bmp" and head[14:18] not in (
                b"\x28\x00\x00\x00",  # BITMAPINFOHEADER
                b"\x6c\x00\x00\x00",  # V4
                b"\x7c\x00\x00\x00",  # V5
            ):
                continue
            return tag
    return "other"


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, int]:
    """Image decode behind the ``detect_format`` dispatch: REAL for PNG
    payloads (pure-stdlib decoder above — no imaging library needed);
    formats without a real decoder in this build fall back to the
    deterministic fake when requested. ``fake=True`` derives
    pseudo-dimensions from a content digest (stable across runs and
    engines)."""
    fmt = detect_format(payload)
    if fmt == "png":
        width, height, channels, _ = decode_png(payload)
        return width, height, channels
    if fmt == "bmp":
        width, height, channels, _ = decode_bmp(payload)
        return width, height, channels
    if not fake:
        raise NotImplementedError(
            f"no real decoder for format '{fmt}' in this build (decodable: "
            f"{sorted(DECODABLE_FORMATS)}); run with fake=True for the "
            "deterministic test double"
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


def extract_features_arrow(blobs: DataFrame, fake_decode: bool = True) -> DataFrame:
    """``mapInArrow`` twin of ``extract_features``: operates on raw
    ``pyarrow.RecordBatch``es — no Arrow→pandas→Arrow round trip, so
    binary payloads are never copied into pandas object arrays. For
    wide binary columns this is the cheapest Python entry point Spark
    has; semantics are pinned equal to the pandas path by
    ``test_multimodal_arrow_features_match_pandas``."""
    import pyarrow as pa

    def fn(batches):
        for batch in batches:
            doc_id = batch.column(batch.schema.get_field_index("doc_id"))
            blob = batch.column(batch.schema.get_field_index("blob"))
            payloads = [b.as_py() for b in blob]
            dims = [decode_image(p, fake=fake_decode) for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [
                    doc_id.cast(pa.int64()),
                    pa.array([len(p) for p in payloads], pa.int64()),
                    pa.array(
                        [hashlib.sha256(p).hexdigest()[:16] for p in payloads],
                        pa.string(),
                    ),
                    pa.array([d[0] for d in dims], pa.int64()),
                    pa.array([d[1] for d in dims], pa.int64()),
                    pa.array([d[2] for d in dims], pa.int64()),
                ],
                names=[
                    "doc_id",
                    "n_bytes",
                    "sha16",
                    "fake_width",
                    "fake_height",
                    "fake_channels",
                ],
            )

    return blobs.select("doc_id", "blob").mapInArrow(fn, FEATURE_SCHEMA)
