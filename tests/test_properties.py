"""Property-based tests (hypothesis) for the scalar function library:
Spark column expressions vs straight-Python reference semantics over
generated inputs — catches edge cases fixed fixtures miss."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_extractor_spark.functions.casts import to_double_or
from etl_extractor_spark.functions.text import normalize_text, prefixed_key

# normalize_text pins the ASCII \s class (Java + RE2 agree; Python's
# Unicode \s differs on U+0085/U+00A0/Zs — documented divergence), so
# the generator excludes the Unicode-only whitespace code points.
_UNICODE_ONLY_WS = "\x85\xa0                　᠎\x1c\x1d\x1e\x1f"
TEXT = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),
        max_codepoint=0x2FFF,
        blacklist_characters=_UNICODE_ONLY_WS,
    ),
    max_size=40,
)


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_normalize_text_property(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["t"])
    got = [r[0] for r in df.select(normalize_text("t")).collect()]
    # Python reference: strip + collapse ANY whitespace runs to one space
    want = [re.sub(r"\s+", " ", v).strip() for v in values]
    assert got == want


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**8), min_size=1, max_size=8))
def test_prefixed_key_property(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], ["id"])
    got = [r[0] for r in df.select(prefixed_key("id", "C", 9)).collect()]
    want = ["C" + str(k).zfill(9) for k in keys]
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(allow_nan=False, allow_infinity=False, width=32).map(str),
            st.text(max_size=6),
            st.none(),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_to_double_or_property(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v: string")
    got = [r[0] for r in df.select(to_double_or("v", -7.5)).collect()]
    # Model mirrors Spark's documented cast trim: any leading/trailing
    # char ≤ U+0020 (control chars included) is stripped before the
    # parse — e.g. '0\x1f' → 0.0, where Python float() raises. See
    # FIXTURES.md "cast semantics".
    trim = "".join(chr(i) for i in range(0x21))
    for v, g in zip(values, got):
        if v is None:
            assert g == -7.5
        else:
            try:
                want = float(v.strip(trim))
                assert abs(g - want) < 1e-6 or (want != want)
            except ValueError:
                assert g == -7.5  # unparseable → sentinel, never an exception


def test_approx_percentile_rank_error_bound(spark, sf_dir):
    """approx_percentile's contract: with accuracy a, the returned
    value's RANK is within n/a of the target rank (KLL-style sketch
    guarantee — rank error, not value error). This is the scalable
    substitute for exact percentile_cont at 100 TB (mergeable sketch,
    one pass, no global sort); the bound is what makes it safe to use.
    """
    from pyspark.sql import functions as F

    from etl_extractor_spark.sources.parquet import load_table

    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    accuracy = 1000
    for q in (0.1, 0.5, 0.9):
        approx = li.agg(
            F.expr(
                f"approx_percentile(l_extendedprice, {q}, {accuracy})"
            ).alias("v")
        ).first()["v"]
        rank = li.filter(F.col("l_extendedprice") <= approx).count()
        assert abs(rank - q * n) <= n / accuracy + 1, (q, rank, q * n, n)


def test_hll_approx_distinct_error_bound(spark, sf_dir):
    """approx_count_distinct's contract: relative standard deviation
    rsd ⇒ error within a few σ of exact. The HLL++ sketch is mergeable
    (combines across partitions without a distinct shuffle), which is
    why it replaces count(DISTINCT) at 100 TB; the bound is the safety
    contract."""
    from pyspark.sql import functions as F

    from etl_extractor_spark.sources.parquet import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select("l_partkey").distinct().count()
    for rsd in (0.05, 0.01):
        approx = li.agg(
            F.approx_count_distinct("l_partkey", rsd).alias("v")
        ).first()["v"]
        assert abs(approx - exact) <= 5 * rsd * exact + 1, (rsd, approx, exact)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.sampled_from([1, 3, 4]),
    st.integers(min_value=0, max_value=4),
    st.binary(min_size=0, max_size=24 * 24 * 4),
)
def test_png_codec_roundtrip_property(w, h, channels, filter_type, data):
    """Pure-stdlib PNG codec: encode→decode is pixel-exact for every
    geometry × color type × scanline filter × payload (payload is
    zero-padded to the raster size, mirroring the encoder contract)."""
    from etl_extractor_spark.operators.multimodal import decode_png, encode_png

    png = encode_png(w, h, data, channels=channels, filter_type=filter_type)
    dw, dh, dc, px = decode_png(png)
    assert (dw, dh, dc) == (w, h, channels)
    assert px == bytes(data[: w * h * channels].ljust(w * h * channels, b"\x00"))


def test_kll_quantile_rank_error_bound(spark, sf_dir):
    """Merged KLL p95 must sit within ±3 normalized-rank points of the
    true 0.95 rank (default k=200 guarantees ~1.65%); pins both the
    sketch contract AND the higher-order-reduce merge."""
    from pyspark.sql import functions as F

    from etl_extractor_spark.plans.events import kll_value_quantiles
    from etl_extractor_spark.sources.parquet import load_table

    est = {
        r.event_type: r.p95_est
        for r in kll_value_quantiles(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    for etype, p95 in est.items():
        sub = e.filter(F.col("event_type") == etype)
        n = sub.count()
        rank = sub.filter(F.col("value") <= p95).count() / n
        assert 0.92 <= rank <= 0.98, (etype, rank)


def test_theta_setops_error_bound(spark, sf_dir):
    """Theta intersection/difference estimates vs exact distinct set
    ops: ≤5% relative error (exact in sparse mode at these SFs)."""
    from pyspark.sql import functions as F

    from etl_extractor_spark.plans.events import theta_funnel_overlap
    from etl_extractor_spark.sources.parquet import load_table

    row = theta_funnel_overlap(spark, sf_dir).collect()[0]
    e = load_table(spark, sf_dir, "events")
    clicks = {r.user_id for r in e.filter(F.col("event_type") == "click").select("user_id").distinct().collect()}
    buys = {r.user_id for r in e.filter(F.col("event_type") == "purchase").select("user_id").distinct().collect()}
    inter, diff = len(clicks & buys), len(clicks - buys)
    assert abs(row.users_click_and_purchase_est - inter) <= max(1, 0.05 * inter)
    assert abs(row.users_click_no_purchase_est - diff) <= max(1, 0.05 * max(diff, 1))


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),          # group
            st.integers(min_value=0, max_value=10**6), # order value
            st.integers(min_value=0, max_value=10**9), # tiebreak id
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[2],
    )
)
def test_salted_topk_equals_naive_window(spark, rows):
    """salted_topk must be lossless vs the single-window top-k on
    arbitrary (group, value, id) data — including groups smaller than
    k and value ties (broken by id desc)."""
    from pyspark.sql import Window

    from etl_extractor_spark.operators.skew import salted_topk

    df = spark.createDataFrame(rows, "g string, v long, id long")
    got = {
        (r["g"], r["id"], r["rk"])
        for r in salted_topk(df, ["g"], "v", "id", k=3, n_salt=4).collect()
    }
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.desc("id"))
    expected = {
        (r["g"], r["id"], r["rk"])
        for r in df.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .collect()
    }
    assert got == expected


def test_canonicalize_url_idempotent_and_rules(spark):
    """Canonicalization is a normal form: applying it twice equals
    applying it once; and each documented rule fires."""
    from etl_extractor_spark.plans.web_curation import canonicalize_url

    raw = [
        ("HTTPS://WWW.Ex.COM:443/A/1/?utm_source=x&page=2&fbclid=y#f",),
        ("http://ex.com:80/path/",),
        ("https://ex.com/p?gclid=1",),
        ("https://ex.com/p?page=1&utm_campaign=z&id=9",),
        ("https://Ex.Com/CaseSensitivePath",),
    ]
    df = spark.createDataFrame(raw, "u string")
    once = df.select(canonicalize_url(F.col("u")).alias("c"))
    twice = once.select(canonicalize_url(F.col("c")).alias("c"))
    got = [r["c"] for r in once.collect()]
    assert got == [r["c"] for r in twice.collect()]
    assert got[0] == "https://ex.com/A/1?page=2"
    assert got[1] == "http://ex.com/path"
    assert got[2] == "https://ex.com/p"
    assert got[3] == "https://ex.com/p?page=1&id=9"
    assert got[4] == "https://ex.com/CaseSensitivePath"  # path case kept


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=5 * 86400),  # seconds offset
        ),
        min_size=1,
        max_size=40,
    )
)
def test_rate_limit_quota_property(spark, rows):
    """rate_limit invariants on random event sets: (a) at most
    max_per_window kept per (user, day bucket); (b) the kept set is
    exactly the earliest-(ts, event_id) events of each bucket — checked
    against a straight-Python reference."""
    import datetime

    from etl_extractor_spark.operators.events import rate_limit

    base = datetime.datetime(2024, 1, 1)
    data = [
        (i, u, base + datetime.timedelta(seconds=s))
        for i, (u, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "event_id long, user_id long, ts timestamp_ntz")
    got = {
        (r.user_id, r.event_id)
        for r in rate_limit(df, window="1 day", max_per_window=2)
        .filter("is_kept")
        .collect()
    }
    # Python reference
    from collections import defaultdict

    buckets = defaultdict(list)
    for i, u, ts in data:
        day = (ts - base).days
        buckets[(u, day)].append((ts, i))
    want = set()
    for (u, _), evs in buckets.items():
        for _, i in sorted(evs)[:2]:
            want.add((u, i))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=30, max_size=60),
        min_size=2,
        max_size=6,
        unique=True,
    )
)
def test_containment_dominates_jaccard(spark, texts):
    """For every unordered pair, max-direction containment >= Jaccard
    (set identity: |A∩B|/min(|A|,|B|) >= |A∩B|/|A∪B|) — the reason the
    containment detector catches subset duplication Jaccard misses.
    Verified by running BOTH operators on the same random corpus with
    thresholds dropped to zero."""
    from etl_extractor_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "doc_id", "text", k=8, threshold=0.0).collect()
    }
    con = {
        (r.id_a, r.id_b): r.containment_bps
        for r in ngram_containment_pairs(df, "doc_id", "text", k=8, min_bps=0).collect()
    }
    for (a, b), j in jac.items():
        c_max = max(con.get((a, b), 0), con.get((b, a), 0))
        assert c_max >= int(j * 10000) - 1  # -1 for the round/floor seam


def test_pq_codes_within_range_and_adc_self_optimal(spark, sf_dir):
    """PQ contract: every code is in [0, 16); and ADC(q, codes(q)) —
    the quantization residual — is <= ADC(q, codes(x)) for EVERY other
    vector x, because encoding takes the per-subspace argmin over the
    same codebook ADC reconstructs from. A sign/index regression in
    _pq_adc_col that preserved code ranges would break this ordering."""
    from pyspark.sql import functions as F

    from etl_extractor_spark.plans.similarity import (
        PQ_KCODE,
        _pq_adc_col,
        _pq_codes_col,
        _pq_int_vectors,
    )

    enc = (
        _pq_int_vectors(spark, sf_dir)
        .limit(30)
        .select("vec_id", "qv", _pq_codes_col().alias("codes"))
    )
    rows = enc.collect()
    for r in rows:
        assert all(0 <= c < PQ_KCODE for c in r.codes)
    q = enc.select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    x = enc.select(F.col("vec_id").alias("neighbor_id"), "codes")
    adc = (
        x.crossJoin(q)
        .select("query_id", "neighbor_id", _pq_adc_col().alias("d"))
        .collect()
    )
    self_d = {r.query_id: r.d for r in adc if r.query_id == r.neighbor_id}
    for r in adc:
        assert self_d[r.query_id] <= r.d, (r.query_id, r.neighbor_id)


def test_kmv_reach_estimator_error_bound(spark, sf_dir):
    """Deterministic KMV distinct-user estimate vs the exact count:
    exact when k_eff < K (sub-K cardinalities), within the published
    ~3/sqrt(K) relative bound when the estimator engages."""
    from pyspark.sql import functions as F

    from etl_extractor_spark.plans.events import KMV_REACH_K, kmv_user_reach
    from etl_extractor_spark.sources.parquet import load_table

    est = {r.event_type: r for r in kmv_user_reach(spark, sf_dir).collect()}
    exact = {
        r.event_type: r.u
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    tol = 3.0 / (KMV_REACH_K ** 0.5)
    for et, row in est.items():
        if row.k_eff < KMV_REACH_K:
            assert row.est_users == exact[et], et
        else:
            assert abs(row.est_users - exact[et]) <= tol * exact[et], (
                et, row.est_users, exact[et],
            )


def test_funnel_twin_bridges_theta_sketch(spark, sf_dir):
    """The exact funnel twin is the number the Theta error contract is
    measured against — assert the sketch estimates land within 5% of
    the twin's exact values (exact in sparse mode at these SFs)."""
    from etl_extractor_spark.plans.events import (
        funnel_overlap_exact,
        theta_funnel_overlap,
    )

    exact = funnel_overlap_exact(spark, sf_dir).collect()[0]
    est = theta_funnel_overlap(spark, sf_dir).collect()[0]
    for est_v, exact_v in [
        (est.users_click_and_purchase_est, exact.users_click_and_purchase),
        (est.users_click_no_purchase_est, exact.users_click_no_purchase),
    ]:
        assert abs(est_v - exact_v) <= max(1, 0.05 * max(exact_v, 1))


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),   # width
    st.integers(min_value=1, max_value=20),   # height
    st.binary(min_size=0, max_size=800),
)
def test_codec_roundtrip_property(w, h, payload):
    """Both real codecs, any geometry: encode → detect → decode
    returns exactly the zero-padded input pixels (PNG all filter
    types; BMP including non-multiple-of-4 strides)."""
    from etl_extractor_spark.operators.multimodal import (
        decode_bmp,
        decode_png,
        detect_format,
        encode_bmp,
        encode_png,
    )

    px = bytes(payload[: w * h]).ljust(w * h, b"\x00")
    bmp = encode_bmp(w, h, px)
    assert detect_format(bmp) == "bmp"
    assert decode_bmp(bmp) == (w, h, 1, px)
    for ft in (0, 1, 2, 3, 4):
        png = encode_png(w, h, px, channels=1, filter_type=ft)
        assert detect_format(png) == "png"
        assert decode_png(png) == (w, h, 1, px)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=900))
def test_gif_lzw_roundtrip_property(payload):
    """GIF LZW, any payload: encode → sniff → decode returns exactly
    the zero-padded input indices (exercises width growth, the
    decoder's one-entry lag, and the EOI-at-boundary width case)."""
    from etl_extractor_spark.operators.multimodal import (
        decode_gif,
        detect_format,
        encode_gif,
    )

    n = len(payload)
    h = max(1, -(-n // 16))
    gif = encode_gif(16, h, payload)
    assert detect_format(gif) == "gif"
    assert decode_gif(gif) == (16, h, 1, bytes(payload).ljust(16 * h, b"\x00"))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.text(max_size=80),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
        max_size=30,
    )
)
def test_avro_ocf_roundtrip_property(rows):
    """Avro OCF: any (long, string, double) rows — including negative
    zigzag extremes and non-ASCII strings — survive the binary
    round-trip exactly, with the schema resolved from the file."""
    from etl_extractor_spark.operators.multimodal import (
        decode_avro_ocf,
        encode_avro_ocf,
    )

    fields = [("a", "long"), ("b", "string"), ("c", "double")]
    got_fields, got_rows = decode_avro_ocf(encode_avro_ocf(fields, rows))
    assert got_fields == fields
    assert got_rows == [tuple(r) for r in rows]
