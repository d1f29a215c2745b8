"""Unit tests for the pipeline operators — literal-row fixtures for the
fact/dim semantics the reference pins down (SURVEY §4.2, FIXTURES §3)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from etl_extractor_spark.operators.dims import add_surrogate_key, build_dim_date
from etl_extractor_spark.operators.facts import (
    conform_block,
    enrich_lookup,
    modulo_fk_fold,
    scalar_agg,
    union_blocks,
)
from etl_extractor_spark.sources.csv import read_csv
from etl_extractor_spark.sources.json_api import records_to_df, unwrap_data_envelope


def test_modulo_fk_fold_wraps_out_of_range(spark):
    # reference main.py:368: ((id-1) % max)+1 — surveys have idcliente
    # up to ~9983 vs 500 clients (FIXTURES §1)
    df = spark.createDataFrame([(1,), (500,), (501,), (9983,)], ["k"])
    out = [r[0] for r in df.select(modulo_fk_fold("k", 500)).collect()]
    assert out == [1, 500, 1, 483]
    assert all(1 <= v <= 500 for v in out)


def test_enrich_lookup_sentinel_on_miss(spark):
    fact = spark.createDataFrame([(1, "x"), (99, "y")], ["k", "v"])
    dim = spark.createDataFrame([(1, "uno")], ["dk", "nombre"])
    out = enrich_lookup(
        fact, dim, "k", "dk", {"nombre": "nombre"}, {"nombre": F.lit("-1")}
    )
    got = {r["k"]: r["nombre"] for r in out.collect()}
    assert got == {1: "uno", 99: "-1"}  # miss → sentinel (J1, main.py:232-238)


def test_conform_union_fills_missing_columns(spark):
    a = spark.createDataFrame([(1, 5.0)], ["id", "score"])
    b = spark.createDataFrame([(2,)], ["id"])
    blocks = [
        conform_block(a, {"id": F.col("id"), "score": F.col("score")}),
        conform_block(b, {"id": F.col("id")}, defaults={"score": F.lit(0.0)}),
    ]
    rows = sorted(tuple(r) for r in union_blocks(blocks).collect())
    assert rows == [(1, 5.0), (2, 0.0)]


def test_scalar_agg(spark):
    df = spark.createDataFrame([(3,), (9,), (5,)], ["k"])
    assert scalar_agg(df, F.max("k")) == 9
    assert scalar_agg(df, F.min("k")) == 3


def test_surrogate_keys_dense_and_ordered(spark):
    df = spark.createDataFrame([("c",), ("a",), ("b",)], ["nk"])
    out = {r["nk"]: r["sk"] for r in add_surrogate_key(df, "nk").collect()}
    assert out == {"a": 1, "b": 2, "c": 3}


def test_surrogate_keys_scalable_unique_dense(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["nk"]).repartition(8)
    keys = sorted(r["sk"] for r in add_surrogate_key(df, "nk", scalable=True).collect())
    assert keys == list(range(1, 101))


def test_build_dim_date_distinct_and_attrs(spark):
    a = spark.createDataFrame([("2025-01-05",), ("2025-01-05",), (None,)], ["d"])
    b = spark.createDataFrame([("2025-03-10",)], ["d"])
    out = build_dim_date([a, b]).orderBy("fecha_key").collect()
    assert [r["fecha_key"] for r in out] == [20250105, 20250310]
    assert out[0]["trimestre"] == 1 and out[1]["mes"] == 3


def test_csv_empty_string_semantics(spark):
    # SURVEY §4.2.1: na_filter=False parity — empty cells are "", not null
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.csv")
        with open(p, "w") as f:
            f.write("id,cliente\nT1,C019\nT2,\n")
        df = read_csv(spark, p)
        got = {r["id"]: r["cliente"] for r in df.collect()}
        assert got == {"T1": "C019", "T2": ""}  # not None


def test_json_envelope_unwrap_and_flatten(spark):
    # reference api_extractor.py:12-28: {"data": [...]} unwrap + normalize
    df = records_to_df(
        spark, {"data": [{"a": 1, "b": {"c": 2}}, {"a": 3, "b": {"c": 4}}]}
    )
    assert sorted(df.columns) == ["a", "b.c"]
    assert df.count() == 2


def test_json_errors_yield_empty_frame(spark):
    from etl_extractor_spark.sources.json_api import read_json_records

    df = read_json_records(spark, "http://127.0.0.1:1/nope", timeout=0.5)
    assert df.count() == 0  # errors → empty frame, never raise


def test_unwrap_envelope_spark_native(spark):
    df = spark.createDataFrame([([(1, "x"), (2, "y")],)], "data: array<struct<id:int,v:string>>")
    out = unwrap_data_envelope(df)
    assert sorted(tuple(r) for r in out.collect()) == [(1, "x"), (2, "y")]


def test_expectations_detect_violations(spark):
    """Crafted dirty frame: every rule type fires with the right count,
    and the report is a single aggregation (one row per rule)."""
    from etl_extractor_spark.operators.expectations import is_valid, validate_report

    rows = [
        (1, "a", 10.0),
        (1, "b", -5.0),     # dup id, range violation
        (None, "c", 20.0),  # null id
        (3, "zz", 30.0),    # accepted_values violation
    ]
    df = spark.createDataFrame(rows, "id long, code string, v double")
    rules = [
        {"name": "id_nn", "type": "not_null", "col": "id"},
        {"name": "id_uq", "type": "unique", "col": "id"},
        {"name": "v_rng", "type": "range", "col": "v", "min": 0.0, "max": 100.0},
        {
            "name": "code_ok",
            "type": "accepted_values",
            "col": "code",
            "values": ["a", "b", "c"],
        },
        {"name": "code_re", "type": "regex", "col": "code", "pattern": "^[a-c]$"},
    ]
    got = {r["rule"]: r["violations"] for r in validate_report(df, rules).collect()}
    assert got == {"id_nn": 1, "id_uq": 1, "v_rng": 1, "code_ok": 1, "code_re": 1}
    assert not is_valid(df, rules)
    clean = df.filter("id = 3").withColumn("code", F.lit("a"))
    assert is_valid(clean, [rules[0], rules[2], rules[3]])


def test_connected_components_star_equals_label_propagation(spark):
    """Property: the large-star/small-star formulation and plain
    min-label propagation assign identical (node, cluster_id) on random
    graphs — chains, singletons, stars, and merged components."""
    import random

    from etl_extractor_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(42)
    for trial in range(4):
        n = rng.randrange(6, 30)
        ids = rng.sample(range(1000), n)
        n_edges = rng.randrange(0, n * 2)
        edges = [
            tuple(rng.sample(ids, 2)) for _ in range(n_edges)
        ]
        nodes = spark.createDataFrame([(i,) for i in ids], "node: long")
        if edges:
            e = spark.createDataFrame(edges, "id_a: long, id_b: long")
        else:
            e = spark.createDataFrame([], "id_a: long, id_b: long")
        a = sorted(map(tuple, connected_components(nodes, e).collect()))
        b = sorted(map(tuple, connected_components_star(nodes, e).collect()))
        assert a == b, f"trial {trial}: {a} != {b}"


def test_connected_components_star_chain_is_one_component(spark):
    """A 12-node chain (worst case for diameter-bound propagation):
    star alternation must collapse it to one component labeled by the
    min id."""
    from etl_extractor_spark.operators.dedup import connected_components_star

    ids = list(range(100, 112))
    nodes = spark.createDataFrame([(i,) for i in ids], "node: long")
    e = spark.createDataFrame(
        [(a, b) for a, b in zip(ids, ids[1:])], "id_a: long, id_b: long"
    )
    got = {r["node"]: r["cluster_id"] for r in connected_components_star(nodes, e).collect()}
    assert got == {i: 100 for i in ids}


def test_png_codec_roundtrip_all_filters():
    """Real PNG decode (stdlib chunk-parse → inflate → unfilter):
    pixel-exact round-trip through every scanline filter type and
    gray/RGB/RGBA color types."""
    from etl_extractor_spark.operators.multimodal import decode_png, encode_png

    data = bytes(range(256)) * 3
    for ft in range(5):
        for ch in (1, 3, 4):
            w = 16
            h = -(-len(data) // (w * ch))
            png = encode_png(w, h, data, channels=ch, filter_type=ft)
            dw, dh, dc, px = decode_png(png)
            assert (dw, dh, dc) == (w, h, ch)
            assert px == data.ljust(w * h * ch, b"\x00")


def test_extract_features_real_png_decode(spark):
    """multimodal feature extraction with the REAL decoder (no fake):
    PNG payloads flow through mapInPandas and come back with their true
    geometry."""
    from etl_extractor_spark.operators.multimodal import encode_png, extract_features

    rows = [
        (1, encode_png(20, 10, bytes(200), channels=1, filter_type=1)),
        (2, encode_png(8, 8, bytes(192), channels=3, filter_type=4)),
    ]
    blobs = spark.createDataFrame(rows, "doc_id: long, blob: binary")
    got = {
        r["doc_id"]: (r["fake_width"], r["fake_height"], r["fake_channels"])
        for r in extract_features(blobs, fake_decode=False).collect()
    }
    assert got == {1: (20, 10, 1), 2: (8, 8, 3)}


def test_hll_sketch_merge_consistency_and_error(spark, sf_dir):
    """Mergeable HLL distinct counts: (a) unioning per-day sketches
    estimates within 5% of the exact distinct count; (b) the merged
    estimate equals the single-pass sketch estimate (merge must not
    change the answer materially)."""
    from pyspark.sql import functions as F

    from etl_extractor_spark.plans.events import hll_user_reach
    from etl_extractor_spark.sources.parquet import load_table

    sf = sf_dir
    merged = {
        r["event_type"]: r["approx_users"]
        for r in hll_user_reach(spark, sf).collect()
    }
    e = load_table(spark, sf, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    single = {
        r["event_type"]: r["est"]
        for r in e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(merged[k] - n) / n <= 0.05, (k, merged[k], n)
        assert abs(merged[k] - single[k]) <= max(1, 0.01 * n), (k, merged, single)


def test_connected_components_star_raises_on_nonconvergence(spark):
    """Exhausting max_iter without the checksum fixpoint must FAIL
    loudly (silently-unconverged labels split clusters downstream)."""
    import pytest as _pytest

    from etl_extractor_spark.operators.dedup import connected_components_star

    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node: long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a: long, id_b: long"
    )
    with _pytest.raises(RuntimeError, match="fixpoint not reached"):
        connected_components_star(nodes, chain, max_iter=1).collect()


def test_multimodal_arrow_features_match_pandas(spark, sf_dir):
    """mapInArrow and mapInPandas feature paths must agree byte-for-byte."""
    from etl_extractor_spark.operators.multimodal import (
        extract_features,
        extract_features_arrow,
        to_blob_table,
    )
    from etl_extractor_spark.sources.parquet import load_table

    d = load_table(spark, sf_dir, "documents")
    blobs = to_blob_table(d, "doc_id", "text")
    a = {tuple(r) for r in extract_features_arrow(blobs).collect()}
    p = {tuple(r) for r in extract_features(blobs).collect()}
    assert a == p and len(a) > 0


def test_pagerank_integer_hand_computed(spark):
    """3-node star A↔{B,C}: exact integer ranks after 3 damped rounds,
    verified against hand-computed floor arithmetic (unit 1e6, d=0.85):
    r1(A)=1850000, r2(A)=1127500, r3(A)=1741625, r3(B)=r3(C)=629187."""
    from etl_extractor_spark.operators.graph import pagerank_integer

    edges = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "A"), ("C", "A")], "src string, dst string"
    )
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_integer(edges, iterations=3).collect()
    }
    assert got == {"A": 1741625, "B": 629187, "C": 629187}


def test_pagerank_integer_symmetric_fixed_point(spark):
    """A↔B is a fixed point: every round returns exactly unit rank."""
    from etl_extractor_spark.operators.graph import pagerank_integer

    edges = spark.createDataFrame([("A", "B"), ("B", "A")], "src string, dst string")
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_integer(edges, iterations=4).collect()
    }
    assert got == {"A": 1_000_000, "B": 1_000_000}


def test_detect_format_magic_dispatch():
    """Strict magic-byte dispatch contract (r4): every registered
    format tag sniffs from its header, RIFF without WEBP stays
    'other', short/unknown payloads never raise."""
    from etl_extractor_spark.operators.multimodal import (
        DECODABLE_FORMATS,
        detect_format,
    )

    assert detect_format(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8) == "png"
    assert detect_format(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert detect_format(b"GIF89a...") == "gif"
    assert detect_format(b"BM" + b"\x00" * 12 + b"\x28\x00\x00\x00") == "bmp"
    assert detect_format(b"BMtext that merely starts with BM") == "other"
    assert detect_format(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "webp"
    assert detect_format(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "wav"
    assert detect_format(b"%PDF-1.7") == "pdf"
    assert detect_format(b"hello world") == "other"
    assert detect_format(b"") == "other"
    assert DECODABLE_FORMATS == {"png", "bmp", "jpeg"}


def test_bmp_codec_roundtrip():
    """Real BMP encode/decode: 8-bit palette geometry and pixel
    fidelity, bottom-up row order reversed correctly, 24-bit BGR->RGB
    path, 4-byte row padding stripped."""
    from etl_extractor_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
        detect_format,
        encode_bmp,
    )

    px = bytes(range(32))  # 16x2 grayscale
    bmp = encode_bmp(16, 2, px)
    assert detect_format(bmp) == "bmp"
    assert decode_bmp(bmp) == (16, 2, 1, px)
    assert decode_image(bmp, fake=False) == (16, 2, 1)
    # width 5 -> stride 8: padding must be stripped on decode
    px2 = bytes(range(15))  # 5x3
    assert decode_bmp(encode_bmp(5, 3, px2)) == (5, 3, 1, px2)


def test_decode_image_dispatch_routing():
    """decode_image: PNG routes to the real decoder regardless of the
    fake flag; non-decodable formats raise WITHOUT fake=True and give
    digest dims WITH it."""
    import pytest as _pytest

    from etl_extractor_spark.operators.multimodal import (
        decode_image,
        encode_png,
    )

    png = encode_png(4, 2, bytes(range(8)), channels=1)
    assert decode_image(png, fake=False) == (4, 2, 1)
    assert decode_image(png, fake=True) == (4, 2, 1)  # real path wins
    # jpeg is decodable since r5: real decoder wins, and a payload that
    # SNIFFS as jpeg but is structurally broken raises like a bad PNG
    # does (strict parse), it does not silently fall back to the fake
    with _pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xffjpegdata", fake=False)
    with _pytest.raises(NotImplementedError):
        decode_image(b"GIF89a...", fake=False)
    w, h, c = decode_image(b"GIF89a...", fake=True)
    assert 64 <= w <= 255 and 64 <= h <= 255 and 1 <= c <= 3


def test_rl_window_to_micros_parse():
    from etl_extractor_spark.streaming.events_stream import _window_to_micros

    assert _window_to_micros("1 day") == 86_400_000_000
    assert _window_to_micros("2 hours") == 7_200_000_000
    assert _window_to_micros("30 minutes") == 1_800_000_000
    assert _window_to_micros("45 seconds") == 45_000_000


def test_bpe_stack_fold_fuse_matches_replace(spark):
    """The r4 array stack-fold fuse must implement the same
    leftmost-first non-overlapping merge as the two-space string
    replace it replaced — including same-symbol runs (A A A → AA, A)."""
    from pyspark.sql import functions as F

    cases = [
        (["a", "a", "a"], "a", "a", ["aa", "a"]),
        (["a", "a", "a", "a"], "a", "a", ["aa", "aa"]),
        (["a", "b", "a", "b"], "a", "b", ["ab", "ab"]),
        (["x", "a", "b", "y"], "a", "b", ["x", "ab", "y"]),
        (["a", "b"], "b", "a", ["a", "b"]),  # no match
        (["ab", "b"], "a", "b", ["ab", "b"]),  # whole-symbol match only
    ]
    for syms, a, b, want in cases:
        df = spark.createDataFrame([(syms, a, b)], "syms array<string>, a string, b string")
        got = df.select(
            F.expr(
                "aggregate(syms, CAST(array() AS array<string>),"
                " (out, x) -> CASE WHEN size(out) > 0"
                "   AND element_at(out, -1) = a AND x = b"
                "  THEN concat(slice(out, 1, size(out) - 1),"
                "              array(concat(a, b)))"
                "  ELSE concat(out, array(x)) END)"
            ).alias("fused")
        ).collect()[0]["fused"]
        assert got == want, (syms, a, b, got, want)


def test_jpeg_codec_exact_constant_blocks():
    """Baseline JPEG with a flat quant table is BIT-EXACT on
    constant 8x8 blocks (DC-only spectra are integers), across the
    full DC-difference category range including the 0xFF-stuffing
    byte patterns."""
    import numpy as np

    from etl_extractor_spark.operators.multimodal import (
        decode_image,
        decode_jpeg_gray,
        detect_format,
        encode_jpeg_gray,
    )

    data = bytes(range(256)) + bytes(reversed(range(256)))
    px = np.repeat(np.frombuffer(data, np.uint8), 64).tobytes()
    jpg = encode_jpeg_gray(8, 8 * len(data), px, qtable=[1] * 64)
    assert detect_format(jpg) == "jpeg"
    assert decode_jpeg_gray(jpg) == (8, 8 * len(data), 1, px)
    # dispatch routes JPEG through the REAL decoder
    assert decode_image(jpg, fake=False) == (8, 8 * len(data), 1)


def test_jpeg_codec_lossy_fidelity_and_guards():
    """Standard Annex-K table on real content: non-multiple-of-8
    geometry pads by edge replication and crops back, reconstruction
    error stays within a few levels on smooth content; full AC
    Huffman paths (ZRL, all run/size categories) exercised by noise;
    progressive/multi-component inputs raise NotImplementedError."""
    import numpy as np
    import pytest

    from etl_extractor_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    img = np.add.outer(np.arange(43), np.arange(59)).astype(np.uint8)
    jpg = encode_jpeg_gray(59, 43, img.tobytes())
    w, h, c, px = decode_jpeg_gray(jpg)
    assert (w, h, c) == (59, 43, 1)
    err = np.abs(
        np.frombuffer(px, np.uint8).astype(int) - img.flatten().astype(int)
    )
    assert err.max() <= 4
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    w2, h2, _, px2 = decode_jpeg_gray(
        encode_jpeg_gray(40, 24, noise.tobytes(), qtable=[1] * 64)
    )
    err2 = np.abs(
        np.frombuffer(px2, np.uint8).astype(int) - noise.flatten().astype(int)
    )
    assert (w2, h2) == (40, 24) and err2.max() <= 1  # q=1 is near-lossless
    # SOF2 (progressive) must refuse explicitly, not mis-decode
    bad = jpg.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(bad)


def test_wav_codec_roundtrip_and_guards():
    """Real RIFF/WAVE PCM codec: byte-exact sample round-trip (odd
    lengths exercise RIFF word padding), chunk walking skips unknown
    chunks, sniffing routes RIFF+WAVE but not RIFF+WEBP, and
    16-bit/stereo/compressed streams refuse explicitly."""
    import struct

    import pytest

    from etl_extractor_spark.operators.multimodal import (
        decode_wav,
        detect_format,
        encode_wav,
    )

    for n in (0, 1, 255, 256, 1001):
        samples = bytes(range(256)) * (n // 256 + 1)
        samples = samples[:n]
        wav = encode_wav(samples, sample_rate=16000)
        assert detect_format(wav) == "wav"
        assert decode_wav(wav) == (16000, 1, 8, samples)
    # unknown chunk before data must be skipped by declared size
    wav = encode_wav(b"\x01\x02\x03")
    injected = wav[:12] + b"LIST" + struct.pack("<I", 4) + b"INFO" + wav[12:]
    assert decode_wav(injected)[3] == b"\x01\x02\x03"
    # 16-bit fmt refuses
    bad = bytearray(encode_wav(b"\x00\x00"))
    bad[34] = 16  # bits_per_sample
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00WEBPdata")


def test_gif_codec_lzw_roundtrip_and_guards():
    """Real GIF89a LZW: byte-exact round-trip through dictionary
    growth (9→12 bits), explicit resets on overflow, the KwKwK case
    (repetitive input), extension-block skipping, RGB palette branch,
    and the interlace refusal."""
    import struct

    import pytest

    from etl_extractor_spark.operators.multimodal import (
        decode_gif,
        detect_format,
        encode_gif,
    )

    rep = b"aaabbbaaabbbcccaaa" * 400  # KwKwK-heavy
    gif = encode_gif(60, 120, rep)
    assert detect_format(gif) == "gif"
    assert decode_gif(gif) == (60, 120, 1, rep[: 60 * 120])
    # extension block (e.g. GCE) before the image must be skipped
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = gif[:13 + 768] + ext + gif[13 + 768:]
    assert decode_gif(patched)[3] == rep[: 60 * 120]
    # interlace flag refuses explicitly
    bad = bytearray(gif)
    bad[13 + 768 + 9] |= 0x40  # image-descriptor flags byte
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(bad))
    # non-gray palette decodes via the RGB branch
    body = gif[13 + 768:]
    palette = b"".join(bytes((g, 255 - g, 0)) for g in range(256))
    rgb = gif[:10] + gif[10:13] + palette + body
    w, h, c, px = decode_gif(rgb)
    assert (w, h, c) == (60, 120, 3)
    assert px[:3] == bytes((rep[0], 255 - rep[0], 0))


def test_tar_codec_stdlib_cross_validation():
    """Our ustar writer must be readable by stdlib tarfile and our
    checksum-verifying reader must parse stdlib-written archives —
    format realism in both directions; corrupted checksums refuse."""
    import io
    import tarfile

    import pytest

    from etl_extractor_spark.operators.multimodal import decode_tar, encode_tar

    members = [("a.txt", b"hello"), ("b/c.txt", b""), ("d.bin", bytes(range(256)) * 3)]
    t = encode_tar(members)
    tf = tarfile.open(fileobj=io.BytesIO(t))
    assert [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()] == members
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w", format=tarfile.USTAR_FORMAT) as tw:
        for n, d in members:
            ti = tarfile.TarInfo(n)
            ti.size = len(d)
            tw.addfile(ti, io.BytesIO(d))
    assert decode_tar(bio.getvalue()) == members
    bad = bytearray(t)
    bad[0] ^= 0xFF  # corrupt the first header byte → checksum mismatch
    with pytest.raises(ValueError):
        decode_tar(bytes(bad))


def test_warc_codec_framing():
    """WARC/1.0 framing: Content-Length slicing (content containing
    CRLF-CRLF and 'WARC/1.0' must NOT desync), empty records, binary
    content, and unterminated records refuse."""
    import pytest

    from etl_extractor_spark.operators.multimodal import decode_warc, encode_warc

    recs = [
        ("r1", "http://a", b"body\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n"),
        ("r2", "http://b", b""),
        ("r3", "http://c", bytes(range(256))),
    ]
    w = encode_warc(recs)
    assert decode_warc(w) == recs
    with pytest.raises(ValueError):
        decode_warc(w[:-2])  # chopped terminator


def test_cms_grid_is_mergeable(spark):
    """Count-min algebra: the sketch of a union is the cellwise SUM of
    per-split sketches — the property that lets executors build grids
    map-side and merge at reduce time with no token ever shuffled."""
    from etl_extractor_spark.plans.training_eval import (
        CMS_DEPTH,
        CMS_WIDTH,
        _cms_bucket_expr,
    )

    toks = spark.createDataFrame(
        [(t,) for t in "a b c a b a d e f a b c".split()], "tok string"
    )
    seeds = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("seed")

    def grid(df):
        return {
            (r["seed"], r["bucket"]): r["cell"]
            for r in df.select("tok", seeds)
            .select("seed", _cms_bucket_expr("seed", "tok").alias("bucket"))
            .groupBy("seed", "bucket")
            .agg(F.count(F.lit(1)).alias("cell"))
            .collect()
        }

    whole = grid(toks)
    # deterministic value split (limit() would be partition-order luck)
    a = grid(toks.filter(F.col("tok") <= "c"))
    b = grid(toks.filter(F.col("tok") > "c"))
    merged: dict = {}
    for g in (a, b):
        for k, v in g.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == whole


def test_zip_codec_stdlib_cross_validation():
    """Our PKZIP writer must be readable by stdlib zipfile and our
    central-directory reader must parse stdlib archives, for both
    DEFLATE and STORED members; CRC corruption must be detected."""
    import io
    import zipfile

    import pytest

    from etl_extractor_spark.operators import multimodal as M

    mem = [("a.txt", b"hello zip" * 50), ("dir/b.bin", bytes(range(256)) * 3), ("empty", b"")]
    for method in (8, 0):
        z = M.encode_zip(mem, method=method)
        assert M.decode_zip(z) == mem
        zf = zipfile.ZipFile(io.BytesIO(z))
        assert [(i.filename, zf.read(i)) for i in zf.infolist()] == mem
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as w:
        for n, d in mem:
            w.writestr(n, d)
    assert M.decode_zip(buf.getvalue()) == mem
    # non-ASCII member name: the UTF-8 language-encoding flag (bit 11)
    # must be set or spec-conforming readers decode the name as cp437
    uni = [("résumé.txt", b"unicode name")]
    zu = M.encode_zip(uni)
    assert M.decode_zip(zu) == uni
    zf = zipfile.ZipFile(io.BytesIO(zu))
    assert [(i.filename, zf.read(i)) for i in zf.infolist()] == uni
    # flip a payload byte inside the first member -> CRC mismatch
    z = bytearray(M.encode_zip(mem, method=0))
    z[30 + len("a.txt")] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        M.decode_zip(bytes(z))
    with pytest.raises(ValueError, match="end-of-central"):
        M.decode_zip(b"not a zip at all")


def test_gzip_member_codec_stdlib_cross_validation():
    """Hand-framed gzip members: stdlib gzip must inflate our
    concatenated stream, we must split stdlib-compressed members, and
    truncation / bad magic must raise."""
    import gzip

    import pytest

    from etl_extractor_spark.operators import multimodal as M

    blobs = [b"record one", b"", b"x" * 10000, bytes(range(256))]
    cat = b"".join(M.encode_gzip_member(b) for b in blobs)
    assert M.decode_gzip_members(cat) == blobs
    assert gzip.decompress(cat) == b"".join(blobs)
    std = b"".join(gzip.compress(b, mtime=0) for b in blobs)
    assert M.decode_gzip_members(std) == blobs
    with pytest.raises(ValueError, match="magic"):
        M.decode_gzip_members(b"\x00\x00junk")
    with pytest.raises(ValueError, match="truncated"):
        M.decode_gzip_members(cat[:-6])


def test_bz2_member_codec_stdlib_cross_validation():
    """Concatenated independent bz2 streams (Wikipedia multistream):
    stdlib bz2 must inflate our stream, we must split stdlib members,
    and truncation / bad magic must raise."""
    import bz2

    import pytest

    from etl_extractor_spark.operators import multimodal as M

    blobs = [b"alpha", b"", b"x" * 5000, bytes(range(256))]
    cat = b"".join(M.encode_bz2_member(b) for b in blobs)
    assert M.decode_bz2_members(cat) == blobs
    assert bz2.decompress(cat) == b"".join(blobs)
    std = b"".join(bz2.compress(b) for b in blobs)
    assert M.decode_bz2_members(std) == blobs
    with pytest.raises(ValueError, match="magic"):
        M.decode_bz2_members(b"\x00junk")
    with pytest.raises(ValueError, match="truncated"):
        M.decode_bz2_members(cat[:-4])


def test_checkpoint_adoption_of_preexisting_dir():
    """Advice r6: a session arriving with a checkpoint dir already set
    and no cleanCheckpoints conf must not accumulate files there for
    the process lifetime — the helper redirects to a pid-named local
    subdir it can atexit-remove, leaves GC-managed sessions alone, and
    only warns (can't reach the files) for non-local URIs."""
    import os
    import warnings

    from etl_extractor_spark.operators.checkpoints import _adopt_subdir

    pid = os.getpid()
    # GC cleanup already on -> leave the operator's dir in place
    assert _adopt_subdir("/ckpt", "true") is None
    assert _adopt_subdir("hdfs://nn/ckpt", "TRUE") is None
    # local (bare path and file: URI) -> pid-named subdir; the spark
    # URI must carry an explicit file: scheme (a bare path resolves
    # against fs.defaultFS on a cluster) while cleanup gets the bare
    # local path
    sub = "/ckpt/reliable-ckpt-%d" % pid
    assert _adopt_subdir("/ckpt", "false") == ("file:" + sub, sub)
    sub2 = "/ckpt/uuid/reliable-ckpt-%d" % pid
    assert _adopt_subdir("file:/ckpt/uuid", "false") == ("file:" + sub2, sub2)
    # non-local URI -> no redirect, one warning
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert _adopt_subdir("hdfs://nn/ckpt", "false") is None
    assert any("accumulate" in str(x.message) for x in w)
