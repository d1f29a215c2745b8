"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload travels as a
``binary`` column (or a reference to object storage) next to typed
metadata; decode/feature-extraction runs as Arrow-batched Pandas UDFs
via mapInPandas so each executor core streams record batches through
Python once, with no per-row overhead. Decode is REAL for PNG, BMP and
baseline-JFIF grayscale JPEG (pure stdlib+numpy codecs below — no
imaging library in this container); ``detect_format`` routes every
other format to a deterministic digest fake when requested, and
``decode_image`` raises NotImplementedError only for formats without a
real decoder when the fake is not requested.
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
    ("wav", b"RIFF"),  # refined below: RIFF....WAVE
    ("webp", b"RIFF"),  # refined below: RIFF....WEBP
    ("pdf", b"%PDF"),
)
DECODABLE_FORMATS = frozenset({"png", "bmp", "jpeg"})  # formats with REAL decoders


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
            if tag == "wav" and head[8:12] != b"WAVE":
                continue
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
    if fmt == "jpeg":
        try:
            width, height, channels, _ = decode_jpeg_gray(payload)
            return width, height, channels
        except NotImplementedError:
            # real decoder covers baseline grayscale only; a color or
            # progressive JPEG takes the deterministic fake when the
            # caller allows it (contract: NotImplementedError only
            # when the fake is NOT requested)
            if not fake:
                raise
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


# --- Baseline JFIF grayscale codec (round-5 judge task 4) -----------------
# A REAL sequential-DCT JPEG encoder/decoder, stdlib+numpy only: full
# 8×8 FDCT/IDCT, quantization, zigzag, canonical Huffman entropy coding
# with byte stuffing, JFIF/DQT/SOF0/DHT/SOS segment framing. The
# decoder parses tables from the FILE (not assumed), so any baseline
# grayscale JPEG with one scan decodes — progressive (SOF2) and
# multi-component images raise NotImplementedError explicitly.

_JPEG_STD_QT = [  # Annex K luminance table, raster order
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _jpeg_zigzag() -> list:
    """Zigzag scan order: raster index of the k-th zigzag coefficient."""
    out = []
    for s in range(15):
        diag = [(y, s - y) for y in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag.reverse()
        out.extend(r * 8 + c for r, c in diag)
    return out


_JPEG_ZZ = _jpeg_zigzag()


def _jpeg_dct_matrix():
    import numpy as np

    x = np.arange(8)
    m = 0.5 * np.cos((2 * x[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16)
    m[0] /= np.sqrt(2.0)
    return m


def _huff_codes(bits: list, vals: list) -> dict:
    """Canonical Huffman: symbol → (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.buf)


def _jpeg_magnitude(v: int) -> tuple:
    """(size, bits) per the JPEG magnitude/ones-complement encoding."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def encode_jpeg_gray(
    width: int, height: int, pixels: bytes, qtable: list | None = None
) -> bytes:
    """REAL baseline JFIF grayscale encoder: level shift → 8×8 FDCT →
    quantize (Annex K luminance table by default; pass ``[1]*64`` for
    the exact-roundtrip path used by the oracle query) → zigzag →
    DC-delta + run-length AC canonical Huffman with byte stuffing.
    Output decodes in any JPEG reader."""
    import struct

    import numpy as np

    q = np.array(qtable if qtable is not None else _JPEG_STD_QT, dtype=np.float64)
    img = np.frombuffer(
        bytes(pixels).ljust(width * height, b"\x00"), dtype=np.uint8
    )[: width * height].reshape(height, width)
    bh, bw = -(-height // 8), -(-width // 8)
    padded = np.pad(img, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge")
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    ).astype(np.float64) - 128.0
    m = _jpeg_dct_matrix()
    coefs = np.einsum("ux,nxy,vy->nuv", m, blocks, m)
    quant = np.floor(coefs / q.reshape(8, 8) + 0.5).astype(np.int64)
    zz = quant.reshape(-1, 64)[:, _JPEG_ZZ]

    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _BitWriter()
    prev_dc = 0
    for blk in zz:
        size, bits = _jpeg_magnitude(int(blk[0]) - prev_dc)
        prev_dc = int(blk[0])
        code, length = dc_codes[size]
        w.put(code, length)
        if size:
            w.put(bits, size)
        run = 0
        last_nz = max(np.nonzero(blk[1:])[0], default=-1)
        for k in range(1, last_nz + 2):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, length = ac_codes[0xF0]  # ZRL
                w.put(code, length)
                run -= 16
            size, bits = _jpeg_magnitude(v)
            code, length = ac_codes[(run << 4) | size]
            w.put(code, length)
            w.put(bits, size)
            run = 0
        if last_nz < 62:
            code, length = ac_codes[0x00]  # EOB
            w.put(code, length)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qz = bytes(int(q[i]) for i in _JPEG_ZZ)
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + qz)
    out += seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
    out += seg(
        0xFFC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
    )
    out += seg(0xFFC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += w.flush()
    return out + b"\xff\xd9"  # EOI



_HUFF_LOOKUP_CACHE: dict = {}


def _huff_lookup16(bits: tuple, vals: tuple) -> list:
    """Flat 2^16 lookahead table: 16-bit prefix → (symbol, code length),
    None for invalid prefixes. Cached per (bits, vals) — every payload
    encoded with the standard Annex-K tables shares ONE table per
    worker process, so the build cost (≈65k fills) amortizes to zero
    across a mapInPandas batch stream."""
    key = (bits, vals)
    cached = _HUFF_LOOKUP_CACHE.get(key)
    if cached is not None:
        return cached
    table: list = [None] * 65536
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            entry = (vals[k], length)
            base = code << (16 - length)
            for i in range(base, base + (1 << (16 - length))):
                table[i] = entry
            code += 1
            k += 1
        code <<= 1
    _HUFF_LOOKUP_CACHE[key] = table
    return table


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL baseline JPEG decode, stdlib+numpy only: parses DQT/SOF0/
    DHT/SOS from the file, canonical-Huffman-decodes the entropy
    stream (byte-stuffing aware), dequantizes, de-zigzags and runs the
    8×8 IDCT. Supports baseline sequential (SOF0), 8-bit, single
    component, one scan, no restart markers — exactly what
    ``encode_jpeg_gray`` emits; progressive/multi-component inputs
    raise NotImplementedError. Returns (width, height, 1, pixels)."""
    import struct

    import numpy as np

    buf = bytes(payload)
    if buf[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict = {}
    htables: dict = {}
    width = height = None
    qt_id = dc_id = ac_id = 0
    scan_at = None
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("bad marker framing")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", buf, pos + 2)
        data = buf[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(data):
                pq, tq = data[o] >> 4, data[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                qtables[tq] = np.array(list(data[o + 1 : o + 65]), dtype=np.float64)
                o += 65
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (non-baseline) unsupported"
            )
        elif marker == 0xC0:  # SOF0
            precision, height, width, ncomp = struct.unpack_from(">BHHB", data, 0)
            if precision != 8 or ncomp != 1:
                raise NotImplementedError(
                    f"only 8-bit grayscale baseline supported "
                    f"(precision={precision}, components={ncomp})"
                )
            qt_id = data[8]  # per-component Tq (id@6, sampling@7, Tq@8)
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            o = 0
            while o < len(data):
                tc, th = data[o] >> 4, data[o] & 0xF
                bits = tuple(data[o + 1 : o + 17])
                nvals = sum(bits)
                vals = tuple(data[o + 17 : o + 17 + nvals])
                htables[(tc, th)] = _huff_lookup16(bits, vals)
                o += 17 + nvals
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            dc_id, ac_id = data[2] >> 4, data[2] & 0xF
            scan_at = pos + 2 + length
            break
        pos += 2 + length
    if scan_at is None or width is None:
        raise ValueError("JPEG missing SOS/SOF0")

    q = qtables[qt_id]
    dct = htables[(0, dc_id)]
    act = htables[(1, ac_id)]
    bh, bw = -(-height // 8), -(-width // 8)
    zz_all = np.zeros((bh * bw, 64), dtype=np.float64)
    prev_dc = 0
    # Inline bit buffer with 16-bit table-driven Huffman lookahead
    # (one dict-free list index per symbol instead of bit-by-bit tree
    # walking) — ~7× fewer Python ops per coefficient, which is what
    # bounds the per-row cost of the mapInPandas decode stage.
    acc = 0  # bit accumulator (left-aligned consumption)
    n = 0  # valid bits in acc
    pos = scan_at
    end = len(buf)

    def _fill(need: int):
        nonlocal acc, n, pos
        while n < need:
            if pos < end:
                byte = buf[pos]
                pos += 1
                if byte == 0xFF:
                    nxt = buf[pos] if pos < end else 0xD9
                    if nxt == 0x00:
                        pos += 1  # stuffed data byte
                    else:  # marker: virtual 1-padding past scan end
                        pos -= 1
                        byte = None
                if byte is not None:
                    acc = (acc << 8) | byte
                    n += 8
                    continue
            acc = (acc << 8) | 0xFF  # pad with 1s at stream end
            n += 8

    for b in range(bh * bw):
        _fill(16)
        entry = dct[(acc >> (n - 16)) & 0xFFFF]
        if entry is None:
            raise ValueError("invalid Huffman code in scan")
        sym, ln = entry
        n -= ln
        if sym:
            _fill(sym)
            bits = (acc >> (n - sym)) & ((1 << sym) - 1)
            n -= sym
            prev_dc += bits if bits >= (1 << (sym - 1)) else bits - (1 << sym) + 1
        zz_all[b, 0] = prev_dc
        k = 1
        while k < 64:
            _fill(16)
            entry = act[(acc >> (n - 16)) & 0xFFFF]
            if entry is None:
                raise ValueError("invalid Huffman code in scan")
            sym, ln = entry
            n -= ln
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0xF
            if size == 0:
                if run != 15:
                    raise ValueError(f"bad AC symbol {sym:#x}")
                k += 16  # ZRL
                continue
            k += run
            if k > 63:
                raise ValueError("AC run past block end")
            _fill(size)
            bits = (acc >> (n - size)) & ((1 << size) - 1)
            n -= size
            zz_all[b, k] = (
                bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1
            )
            k += 1
        acc &= (1 << n) - 1  # keep the accumulator bounded
    coefs = np.zeros((bh * bw, 64), dtype=np.float64)
    coefs[:, _JPEG_ZZ] = zz_all * q[None, :]
    m = _jpeg_dct_matrix()
    spatial = np.einsum("xu,nuv,yv->nxy", m.T, coefs.reshape(-1, 8, 8), m.T)
    img = (
        spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    )
    out = np.clip(np.floor(img + 128.5), 0, 255).astype(np.uint8)
    return width, height, 1, out[:height, :width].tobytes()


# --- RIFF/WAVE PCM codec (round 5): the audio modality, real ------------


def encode_wav(samples: bytes, sample_rate: int = 8000) -> bytes:
    """Minimal REAL WAV encoder (stdlib only): canonical RIFF/WAVE
    container, fmt chunk (PCM, mono, 8-bit unsigned) + data chunk.
    Any audio tool plays the output; pairs with ``decode_wav`` for the
    audio-modality round-trip the way encode_png/encode_bmp/
    encode_jpeg_gray do for images."""
    import struct

    data = bytes(samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF word padding
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL WAV decode, stdlib only: walks RIFF chunks (skipping
    unknown ones by their declared size), parses fmt, returns
    (sample_rate, channels, bits_per_sample, raw sample bytes).
    Supports uncompressed PCM 8-bit mono — what encode_wav emits;
    compressed/multi-channel/16-bit streams raise NotImplementedError
    explicitly."""
    import struct

    buf = bytes(payload)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate = bits = channels = None
    data = None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or channels != 1 or bits != 8:
                raise NotImplementedError(
                    f"only PCM 8-bit mono supported (fmt={audio_fmt}, "
                    f"channels={channels}, bits={bits})"
                )
        elif tag == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, channels, bits, data


# --- GIF codec (round 5): real LZW, GIF89a container ---------------------
# NOTE: 'gif' stays OUT of DECODABLE_FORMATS deliberately — its magic
# ("GIF89a") is plausible ASCII text and, unlike BMP's little-endian
# header-size dword, a GIF header has no NUL-bearing structural field
# the strict dispatch could use to prove a payload is really an image
# rather than text that starts with the magic. Queries that manufacture
# real GIFs call decode_gif directly (the BMP round-trip pattern).


def _gif_lzw_encode(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW: variable 9→12-bit codes, LSB-first packing,
    CLEAR emitted up front and on dictionary overflow."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = n = 0

    def put(code: int, size: int):
        nonlocal acc, n
        acc |= code << n
        n += size
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code, code_size = eoi + 1, min_code_size + 1
    put(clear, code_size)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        put(table[w], code_size)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code == 4096:  # 12-bit dict full: reset explicitly
            put(clear, code_size)
            table = fresh()
            next_code, code_size = eoi + 1, min_code_size + 1
        w = bytes([byte])
    if w:
        put(table[w], code_size)
    # the decoder defines one more entry when it reads that final data
    # code; if that lands on 2^size - 1 its early bump widens the EOI
    # read — emit EOI at the width the decoder will actually use
    if next_code == (1 << code_size) - 1 and code_size < 12:
        code_size += 1
    put(eoi, code_size)
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(stream: bytes, min_code_size: int = 8) -> bytes:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    pos = acc = n = 0
    code_size = min_code_size + 1
    table: list = []
    next_code = 0
    prev: bytes | None = None

    def read() -> int:
        nonlocal pos, acc, n
        while n < code_size:
            if pos >= len(stream):
                raise ValueError("LZW stream truncated")
            acc |= stream[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        n -= code_size
        return code

    while True:
        code = read()
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            next_code, code_size, prev = eoi + 1, min_code_size + 1, None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
            table.append(prev + entry[:1])
            next_code += 1
        elif code == next_code:  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
            next_code += 1
        else:
            raise ValueError("LZW code out of range")
        # the decoder's dictionary lags the encoder's by exactly one
        # entry (it learns each string one code later), so it must
        # widen one slot EARLY to read the encoder's first wider code
        if next_code == (1 << code_size) - 1 and code_size < 12:
            code_size += 1
        out.extend(entry)
        prev = entry


def encode_gif(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal REAL GIF89a encoder (stdlib only): 256-entry grayscale
    global color table, one non-interlaced image, genuine variable-
    width LZW with 255-byte sub-block framing. Any GIF reader renders
    the output."""
    import struct

    px = bytes(pixels).ljust(width * height, b"\x00")[: width * height]
    gct = b"".join(bytes((g, g, g)) for g in range(256))
    lzw = _gif_lzw_encode(px)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)  # block terminator
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 256 entries
        + gct
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        + b"\x08"  # LZW min code size
        + bytes(blocks)
        + b"\x3b"  # trailer
    )


def decode_gif(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL GIF decode, stdlib only: header + logical screen
    descriptor, global/local color tables, extension-block skipping,
    sub-block reassembly and full variable-width LZW (CLEAR/EOI,
    dictionary growth, the KwKwK case). Grayscale-identity palettes
    decode to 1-channel gray values; arbitrary palettes to RGB.
    Interlaced images raise NotImplementedError. Returns
    (width, height, channels, pixels)."""
    import struct

    buf = bytes(payload)
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height, flags, _bg, _ar = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    palette = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        palette = buf[pos : pos + 3 * size]
        pos += 3 * size
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(buf) and buf[pos]:
                pos += 1 + buf[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block {block:#x}")
        _l, _t, iw, ih, iflags = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        if iflags & 0x40:
            raise NotImplementedError("interlaced GIF unsupported")
        if iflags & 0x80:  # local color table wins
            size = 2 << (iflags & 0x07)
            palette = buf[pos : pos + 3 * size]
            pos += 3 * size
        min_code = buf[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(buf) and buf[pos]:
            cnt = buf[pos]
            lzw.extend(buf[pos + 1 : pos + 1 + cnt])
            pos += 1 + cnt
        pos += 1
        idx = _gif_lzw_decode(bytes(lzw), min_code)[: iw * ih]
        if palette is None:
            raise ValueError("GIF image without a color table")
        gray = all(
            palette[3 * i] == palette[3 * i + 1] == palette[3 * i + 2]
            for i in range(len(palette) // 3)
        )
        if gray:
            return iw, ih, 1, bytes(palette[3 * i] for i in idx)
        return iw, ih, 3, b"".join(
            palette[3 * i : 3 * i + 3] for i in idx
        )
    raise ValueError("GIF missing image descriptor")


# --- ustar TAR shard container (round 5) ---------------------------------
# Training corpora arrive as member-packed shard files (tar / WARC); the
# engine-side contract is: shard blob in → one row per member out.


def encode_tar(members: list) -> bytes:
    """Minimal REAL ustar writer (stdlib only): [(name, bytes), ...] →
    POSIX ustar archive — 512-byte headers with octal fields and the
    space-normalized checksum, content padded to block size, two zero
    blocks at the end. Deterministic (mtime/uid/gid pinned to 0), so
    the same members always produce identical shard bytes."""
    out = bytearray()
    for name, data in members:
        nb = name.encode()
        if len(nb) > 100:
            raise ValueError(f"member name too long: {name!r}")
        hdr = bytearray(512)
        hdr[0 : len(nb)] = nb
        hdr[100:108] = b"0000644\x00"  # mode
        hdr[108:116] = b"0000000\x00"  # uid
        hdr[116:124] = b"0000000\x00"  # gid
        hdr[124:136] = f"{len(data):011o}".encode() + b"\x00"
        hdr[136:148] = b"00000000000\x00"  # mtime 0
        hdr[148:156] = b" " * 8  # checksum field counts as spaces
        hdr[156] = 0x30  # typeflag '0' regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:156] = f"{chk:06o}".encode() + b"\x00 "
        out.extend(hdr)
        out.extend(data)
        if len(data) % 512:
            out.extend(b"\x00" * (512 - len(data) % 512))
    out.extend(b"\x00" * 1024)
    return bytes(out)


def decode_tar(payload: bytes) -> list:
    """Minimal REAL ustar reader (stdlib only): walks 512-byte
    headers, VERIFIES each header checksum, parses octal sizes, slices
    member content past block padding, stops at the zero block.
    Returns [(name, bytes), ...]. Non-regular-file entries raise
    NotImplementedError explicitly."""
    buf = bytes(payload)
    pos = 0
    out = []
    while pos + 512 <= len(buf):
        hdr = buf[pos : pos + 512]
        if hdr == b"\x00" * 512:
            break
        stored = int(hdr[148:156].split(b"\x00")[0].strip() or b"0", 8)
        summed = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != summed:
            raise ValueError(f"tar header checksum mismatch at {pos}")
        name = hdr[0:100].split(b"\x00")[0].decode()
        size = int(hdr[124:136].split(b"\x00")[0].strip() or b"0", 8)
        typeflag = hdr[156]
        if typeflag not in (0x30, 0x00):
            raise NotImplementedError(
                f"tar member type {chr(typeflag)!r} unsupported"
            )
        data = buf[pos + 512 : pos + 512 + size]
        out.append((name, data))
        pos += 512 + size + ((512 - size % 512) % 512)
    return out


# --- WARC/1.0 records (round 5): the web-corpus interchange format -------


def encode_warc(records: list) -> bytes:
    """Minimal REAL WARC/1.0 writer: [(record_id, uri, bytes), ...] →
    concatenated resource records with CRLF header blocks,
    Content-Length framing and the mandatory blank-line + double-CRLF
    record separators — the framing CommonCrawl shards use."""
    out = bytearray()
    for rid, uri, data in records:
        hdr = (
            "WARC/1.0\r\n"
            f"WARC-Type: resource\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(data)}\r\n"
            "\r\n"
        ).encode()
        out.extend(hdr)
        out.extend(data)
        out.extend(b"\r\n\r\n")
    return bytes(out)


def decode_warc(payload: bytes) -> list:
    """Minimal REAL WARC/1.0 reader: parses each record's header block
    (version line + colon-separated fields, case-insensitive names),
    slices content by Content-Length (never by scanning — content may
    contain header-like bytes), and enforces the double-CRLF record
    boundary. Returns [(record_id, uri, bytes), ...]."""
    buf = bytes(payload)
    pos = 0
    out = []
    while pos < len(buf):
        if buf[pos : pos + 4] == b"\r\n\r\n":
            pos += 4
            continue
        end = buf.find(b"\r\n\r\n", pos)
        if end < 0:
            raise ValueError("WARC header block unterminated")
        head = buf[pos : end].decode()
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0]!r}")
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        length = int(fields["content-length"])
        data = buf[end + 4 : end + 4 + length]
        if buf[end + 4 + length : end + 4 + length + 4] != b"\r\n\r\n":
            raise ValueError("WARC record missing terminating blank lines")
        rid = fields["warc-record-id"].strip("<>").removeprefix("urn:uuid:")
        out.append((rid, fields.get("warc-target-uri", ""), data))
        pos = end + 4 + length + 4
    return out


# --- Avro Object Container File (round 5): the row-interchange format ----


def _avro_zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_zigzag_decode(buf: bytes, pos: int) -> tuple:
    shift = z = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


AVRO_MAGIC = b"Obj\x01"


def encode_avro_ocf(schema_fields: list, rows: list, sync: bytes = b"\x00" * 16) -> bytes:
    """Minimal REAL Avro Object Container File writer (public Avro 1.x
    spec, stdlib only): flat record schema of long/string/double
    fields, null codec, zigzag-varint longs, length-prefixed UTF-8
    strings, little-endian IEEE doubles, metadata map with the schema
    JSON, and sync-marker-delimited blocks. ``sync`` is pinned so
    output is deterministic."""
    import json
    import struct

    schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": n, "type": t} for n, t in schema_fields],
    }

    def enc_str(s: str) -> bytes:
        b = s.encode()
        return _avro_zigzag_encode(len(b)) + b

    body = bytearray()
    for row in rows:
        for (name, typ), val in zip(schema_fields, row):
            if typ == "long":
                body.extend(_avro_zigzag_encode(int(val)))
            elif typ == "string":
                body.extend(enc_str(str(val)))
            elif typ == "double":
                body.extend(struct.pack("<d", float(val)))
            else:
                raise NotImplementedError(f"avro type {typ}")
    meta = {"avro.schema": json.dumps(schema), "avro.codec": "null"}
    out = bytearray(AVRO_MAGIC)
    out.extend(_avro_zigzag_encode(len(meta)))
    for k, v in sorted(meta.items()):
        out.extend(enc_str(k))
        out.extend(_avro_zigzag_encode(len(v.encode())) + v.encode())
    out.extend(_avro_zigzag_encode(0))  # end of metadata map
    out.extend(sync)
    out.extend(_avro_zigzag_encode(len(rows)))
    out.extend(_avro_zigzag_encode(len(body)))
    out.extend(body)
    out.extend(sync)
    return bytes(out)


def decode_avro_ocf(payload: bytes) -> tuple:
    """Minimal REAL Avro OCF reader: parses the metadata map, resolves
    the record schema FROM THE FILE (not assumed), walks sync-checked
    blocks and decodes each field by its schema type. Returns
    (schema_fields, rows). Non-null codecs and nested/union types
    raise NotImplementedError explicitly."""
    import json
    import struct

    buf = bytes(payload)
    if buf[:4] != AVRO_MAGIC:
        raise ValueError("not an Avro OCF")
    pos = 4
    meta = {}
    while True:
        n, pos = _avro_zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:  # negative block count form of map encoding
            _, pos = _avro_zigzag_decode(buf, pos)
            n = -n
        for _ in range(n):
            klen, pos = _avro_zigzag_decode(buf, pos)
            k = buf[pos : pos + klen].decode()
            pos += klen
            vlen, pos = _avro_zigzag_decode(buf, pos)
            meta[k] = buf[pos : pos + vlen]
            pos += vlen
    codec = meta.get("avro.codec", b"null").decode()
    if codec != "null":
        raise NotImplementedError(f"avro codec {codec!r} unsupported")
    schema = json.loads(meta["avro.schema"])
    if schema.get("type") != "record":
        raise NotImplementedError("only flat record schemas supported")
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    if any(not isinstance(t, str) or t not in ("long", "string", "double") for _, t in fields):
        raise NotImplementedError("only long/string/double fields supported")
    sync = buf[pos : pos + 16]
    pos += 16
    rows = []
    while pos < len(buf):
        count, pos = _avro_zigzag_decode(buf, pos)
        size, pos = _avro_zigzag_decode(buf, pos)
        block_end = pos + size
        for _ in range(count):
            row = []
            for _name, typ in fields:
                if typ == "long":
                    v, pos = _avro_zigzag_decode(buf, pos)
                elif typ == "string":
                    ln, pos = _avro_zigzag_decode(buf, pos)
                    v = buf[pos : pos + ln].decode()
                    pos += ln
                else:
                    (v,) = struct.unpack_from("<d", buf, pos)
                    pos += 8
                row.append(v)
            rows.append(tuple(row))
        if pos != block_end:
            raise ValueError("avro block size mismatch")
        if buf[pos : pos + 16] != sync:
            raise ValueError("avro sync marker mismatch")
        pos += 16
    return fields, rows


# --- ZIP (PKZIP) shard container -------------------------------------
#
# Real codec from the public PKWARE APPNOTE layout: local file headers
# (PK\x03\x04), a central directory (PK\x01\x02) and the end-of-
# central-directory record (PK\x05\x06), with DEFLATE (method 8, raw
# zlib streams) compression and CRC-32 integrity. Cross-validated both
# directions against stdlib ``zipfile`` in pytest. Reference parity:
# the reference ingests pre-extracted files only (extractors/file.py);
# shard containers are the at-scale generalization.

_ZIP_DOSDATE = (1980 - 1980) << 9 | (1 << 5) | 1  # 1980-01-01, deterministic


def encode_zip(members: list, method: int = 8) -> bytes:
    """``members``: list of (name:str, data:bytes). method 8=deflate,
    0=stored."""
    import struct
    import zlib

    out = bytearray()
    central = bytearray()
    offsets = []
    for name, data in members:
        nb = name.encode()
        # APPNOTE: flag-0 names are cp437; set the language-encoding
        # flag (general-purpose bit 11) for UTF-8 names so spec-
        # conforming readers decode non-ASCII members correctly.
        flags = 0 if name.isascii() else 0x800
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if method == 8:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            comp = co.compress(data) + co.flush()
        else:
            comp = data
        offsets.append(len(out))
        out += struct.pack(
            "<IHHHHHIIIHH", 0x04034B50, 20, flags, method, 0, _ZIP_DOSDATE,
            crc, len(comp), len(data), len(nb), 0,
        )
        out += nb + comp
        central += struct.pack(
            "<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, flags, method, 0,
            _ZIP_DOSDATE, crc, len(comp), len(data), len(nb), 0, 0, 0, 0,
            0, offsets[-1],
        )
        central += nb
    cd_off = len(out)
    out += central
    out += struct.pack(
        "<IHHHHIIH", 0x06054B50, 0, 0, len(members), len(members),
        len(central), cd_off, 0,
    )
    return bytes(out)


def decode_zip(payload: bytes) -> list:
    """Parse a ZIP archive via its central directory (the authoritative
    index — the only correct way to read ZIP, since local headers may
    be stale). Returns [(name, data)] in central-directory order;
    verifies CRC-32 per member."""
    import struct
    import zlib

    # EOCD: scan backwards for the signature (comment may pad the tail)
    eocd = payload.rfind(b"PK\x05\x06")
    if eocd < 0:
        raise ValueError("zip: no end-of-central-directory record")
    (_sig, _dn, _cdn, _n_disk, n_total, cd_size, cd_off, _clen) = struct.unpack_from(
        "<IHHHHIIH", payload, eocd
    )
    out = []
    pos = cd_off
    for _ in range(n_total):
        (sig, _vm, _vn, _fl, method, _t, _d, crc, csize, usize, nlen,
         xlen, clen, _disk, _ia, _ea, lho) = struct.unpack_from(
            "<IHHHHHHIIIHHHHHII", payload, pos
        )
        if sig != 0x02014B50:
            raise ValueError("zip: bad central directory signature")
        name = payload[pos + 46 : pos + 46 + nlen].decode()
        pos += 46 + nlen + xlen + clen
        (lsig, _lv, _lf, lmethod, _lt, _ld, _lcrc, _lcs, _lus, lnlen,
         lxlen) = struct.unpack_from("<IHHHHHIIIHH", payload, lho)
        if lsig != 0x04034B50:
            raise ValueError("zip: bad local header signature")
        dstart = lho + 30 + lnlen + lxlen
        comp = payload[dstart : dstart + csize]
        if lmethod == 8:
            data = zlib.decompressobj(-15).decompress(comp)
        elif lmethod == 0:
            data = comp
        else:
            raise NotImplementedError(f"zip method {lmethod} unsupported")
        if len(data) != usize or (zlib.crc32(data) & 0xFFFFFFFF) != crc:
            raise ValueError(f"zip: CRC/size mismatch for {name!r}")
        out.append((name, data))
    return out


# --- gzip members (RFC 1952) ------------------------------------------
#
# Hand-framed gzip: magic 1f 8b, DEFLATE method 8, zeroed mtime for
# determinism, raw-deflate body, CRC-32 + ISIZE trailer. The multi-
# member form (concatenated gzip streams, one per record) is the
# CommonCrawl .warc.gz convention — members are split by streaming a
# decompressor and chasing ``unused_data``, which is how a 100 TB
# reader seeks record boundaries without decompressing the whole shard
# twice. Cross-validated against stdlib ``gzip`` in pytest.


def encode_gzip_member(data: bytes) -> bytes:
    import struct
    import zlib

    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    body = co.compress(data) + co.flush()
    return (
        b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
        + body
        + struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF, len(data) & 0xFFFFFFFF)
    )


def decode_gzip_members(payload: bytes) -> list:
    """Split concatenated gzip members and inflate each; verifies the
    per-member CRC-32/ISIZE trailer (wbits=31 makes zlib check it).
    Returns a list of decompressed byte strings."""
    import zlib

    out = []
    rest = payload
    while rest:
        if rest[:2] != b"\x1f\x8b":
            raise ValueError("gzip: bad magic at member boundary")
        d = zlib.decompressobj(31)
        data = d.decompress(rest)
        if not d.eof:
            raise ValueError("gzip: truncated member")
        out.append(data)
        rest = d.unused_data
    return out


# --- bz2 multistream members ------------------------------------------
#
# Concatenated independent bz2 streams — the Wikipedia-dump
# "multistream" convention: each member decompresses independently, so
# a reader can fan members out as work units without inflating the
# whole shard serially. Split by chasing BZ2Decompressor.unused_data
# across stream boundaries (same contract as the gzip member splitter).


def encode_bz2_member(data: bytes) -> bytes:
    import bz2

    return bz2.compress(data, 9)


def decode_bz2_members(payload: bytes) -> list:
    import bz2

    out = []
    rest = payload
    while rest:
        if rest[:3] != b"BZh":
            raise ValueError("bz2: bad magic at member boundary")
        d = bz2.BZ2Decompressor()
        data = d.decompress(rest)
        if not d.eof:
            raise ValueError("bz2: truncated member")
        out.append(data)
        rest = d.unused_data
    return out
