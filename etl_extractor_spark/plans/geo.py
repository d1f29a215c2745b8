"""Geospatial operators on deterministic hash-derived coordinates.

A 100 TB event/entity corpus almost always carries a spatial column
(IP-geolocated points, store/DC coordinates, delivery addresses); the
reference pipeline (nilfredb/ETL-Extractor, extractors/*.py — no geo
layer) would need exactly these four shapes to serve them at scale.
Coordinates are derived deterministically from the TPC-H keys with the
repo's md5→int idiom, so every query stays oracle-exact: points live
on an integer micro-degree plane (0..999,999 per axis) and all
distance math is integer (squared planar) or floor-quantized
(haversine meters), never raw-float output.

Queries (all oracle-backed):

- geo_grid_distance_join   : radius join customers×suppliers via grid
                             blocking — the small side explodes to its
                             3×3 neighbor cells, the big side shuffles
                             once on cell id; NEVER all-pairs
- geo_knn_nearest_supplier : nearest supplier per customer — broadcast
                             the supplier dim, min(struct) partial agg
                             (map-side combine, no global sort)
- geo_morton_hotspots      : Morton/Z-order cell ids by pure bit
                             interleave; top occupancy cells
- geo_haversine_nation_span: real great-circle distance (floor-
                             quantized to hectometers per row before
                             the integer sum) from each customer to
                             its nation centroid

100 TB notes are in each docstring; the common theme is that the only
shuffles are on cell ids or group keys, and the only explode is 9× on
the dimension side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_extractor_spark.sources.parquet import load_table

QUERIES: dict = {}
ORACLES: dict = {}

# --- deterministic coordinates -------------------------------------------
# 12 hex digits of md5 → BIGINT (the repo's engine-identical idiom:
# Spark conv(...,16,10)::long == DuckDB CAST('0x'||... AS BIGINT)),
# folded onto a 0..999,999 integer micro-degree axis.
_AXIS = 1_000_000


def _coord(salt: str, key):
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 12), 16, 10)
    return h.cast("long") % F.lit(_AXIS)


def _coord_sql(salt: str, key: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 12)) AS BIGINT) "
        f"% {_AXIS}"
    )


def _customers_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_nationkey",
        _coord("geo-cx-", F.col("c_custkey")).alias("cx"),
        _coord("geo-cy-", F.col("c_custkey")).alias("cy"),
    )


_CUST_XY_SQL = f"""
    SELECT c_custkey, c_nationkey,
           {_coord_sql('geo-cx-', 'c_custkey')} AS cx,
           {_coord_sql('geo-cy-', 'c_custkey')} AS cy
    FROM customer
"""


def _suppliers_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        _coord("geo-sx-", F.col("s_suppkey")).alias("sx"),
        _coord("geo-sy-", F.col("s_suppkey")).alias("sy"),
    )


_SUPP_XY_SQL = f"""
    SELECT s_suppkey,
           {_coord_sql('geo-sx-', 's_suppkey')} AS sx,
           {_coord_sql('geo-sy-', 's_suppkey')} AS sy
    FROM supplier
"""


# --- 1. grid-blocked radius join ------------------------------------------
_GRID = 25_000  # cell edge; radius must stay <= _GRID so 3x3 covers
_RADIUS = 20_000


def geo_grid_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (customer, supplier) pairs within planar radius 20,000
    micro-degrees, by grid blocking: suppliers (the small side) explode
    to their 3×3 neighbor cells, customers map to their single cell,
    and the equi-join on cell id bounds the candidate space — the
    radius filter then runs only inside a cell neighborhood. Because
    radius ≤ cell edge, the 3×3 stencil is complete (no missed pair),
    and candidates are verified exactly, so precision is 1 by
    construction — the classic block-then-verify shape shared with the
    LSH dedup operators.

    100 TB: candidate count is density-bounded per cell, not O(n·m);
    both sides hash-shuffle once on cell id (the dim side is NOT
    broadcast-hinted — the planner broadcasts it while it fits and AQE
    demotes to a shuffle join when the dim is SF-scaled, which a hard
    hint would forbid; review catch); skewed cells are ordinary AQE
    skew splits since the join is a plain equi-join."""
    cust = _customers_xy(spark, sf_dir).withColumn(
        "cell", F.floor(F.col("cx") / _GRID) * 1000 + F.floor(F.col("cy") / _GRID)
    )
    supp = (
        _suppliers_xy(spark, sf_dir)
        .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn(
            "cell",
            (F.floor(F.col("sx") / _GRID) + F.col("dx")) * 1000
            + (F.floor(F.col("sy") / _GRID) + F.col("dy")),
        )
        .select("s_suppkey", "sx", "sy", "cell")
    )
    d2 = (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx")) + (
        F.col("cy") - F.col("sy")
    ) * (F.col("cy") - F.col("sy"))
    return (
        cust.join(supp, "cell")
        .where(d2 <= F.lit(_RADIUS * _RADIUS))
        .select("c_custkey", "s_suppkey", d2.alias("dist2"))
    )


QUERIES["geo_grid_distance_join"] = geo_grid_distance_join
ORACLES["geo_grid_distance_join"] = f"""
    WITH c AS ({_CUST_XY_SQL}), s AS ({_SUPP_XY_SQL})
    SELECT c_custkey, s_suppkey,
           (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS dist2
    FROM c CROSS JOIN s
    WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)
          <= {_RADIUS} * {_RADIUS}
"""


# --- 2. nearest supplier per customer --------------------------------------
def geo_knn_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier (squared planar distance, supplier-key
    tie-break) for every customer. The supplier dim broadcasts; the
    argmin is min(struct(dist2, s_suppkey)) — an algebraic aggregate,
    so the per-customer reduction happens map-side inside the scan
    task and the one shuffle carries a single row per customer.

    100 TB: no global sort and no window; the hinted broadcast side
    is the supplier dim — this brute-force variant's CONTRACT is a
    broadcastable dim (it is the exact-baseline sibling of the pruned
    kNN paths; an SF-scaled dim belongs on geo_grid_distance_join or
    the IVF operators instead). Map-side combine keeps the shuffle
    O(customers), independent of the candidate fan-out. The customer
    side is fan_out-repartitioned first: the O(customers × suppliers)
    broadcast-join work must not inherit the scan's single-file
    partitioning (one task evaluated the whole sf1 pair space before
    this — the round-5 codec lesson applied to joins)."""
    from etl_extractor_spark.operators.common import fan_out

    # multiple=4: with the dim broadcast, each task materializes
    # |task rows| × |dim| candidate structs through the sort-aggregate;
    # 4× the core count keeps that per-task pair block small enough to
    # survive a loaded long-lived JVM (a 1× fan-out OOMed task 24 of
    # the full sf1 sweep while passing standalone)
    cust = fan_out(_customers_xy(spark, sf_dir), multiple=4)
    supp = _suppliers_xy(spark, sf_dir)
    d2 = (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx")) + (
        F.col("cy") - F.col("sy")
    ) * (F.col("cy") - F.col("sy"))
    best = (
        cust.crossJoin(F.broadcast(supp))
        .select("c_custkey", F.struct(d2.alias("d2"), F.col("s_suppkey")).alias("cand"))
        .groupBy("c_custkey")
        .agg(F.min("cand").alias("best"))
    )
    return best.select(
        "c_custkey",
        F.col("best.s_suppkey").alias("s_suppkey"),
        F.col("best.d2").alias("dist2"),
    )


QUERIES["geo_knn_nearest_supplier"] = geo_knn_nearest_supplier
ORACLES["geo_knn_nearest_supplier"] = f"""
    WITH c AS ({_CUST_XY_SQL}), s AS ({_SUPP_XY_SQL}),
    best AS (
        -- same algebraic argmin the Spark plan uses: a struct-min
        -- aggregation, not a window sort over the pair space
        SELECT c_custkey,
               MIN({{'d2': (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy),
                    's_suppkey': s_suppkey}}) AS b
        FROM c CROSS JOIN s
        GROUP BY c_custkey
    )
    SELECT c_custkey, b.s_suppkey AS s_suppkey, b.d2 AS dist2 FROM best
"""


# --- 3. Morton / Z-order hotspot cells --------------------------------------
_MBITS = 5  # 5 bits/axis -> 32x32 = 1024 Z-ordered cells


def _morton_expr(x, y):
    """Interleave the top _MBITS bits of each axis (x bit i -> out bit
    2i+1, y bit i -> out bit 2i) — pure integer bit ops, identical
    on both engines."""
    xs = (x / F.lit(_AXIS // (1 << _MBITS))).cast("long")
    ys = (y / F.lit(_AXIS // (1 << _MBITS))).cast("long")
    out = F.lit(0).cast("long")
    for i in range(_MBITS):
        out = out + F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        out = out + F.shiftleft(F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i)
    return out


def _morton_sql(x: str, y: str) -> str:
    step = _AXIS // (1 << _MBITS)
    terms = []
    for i in range(_MBITS):
        terms.append(f"((((({x}) // {step}) >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((((({y}) // {step}) >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def geo_morton_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer occupancy per Z-order (Morton) cell — the locality-
    preserving integer cell id used for spatial range pruning (a Z
    range covers a rectangle with O(log) splits; same curve the repo's
    Z-order writer uses for file layout, sinks/zorder.py). Top-40
    cells by customer count, cell-id tie-break.

    100 TB: one hash aggregation on a 10-bit key; the Morton id is a
    handful of codegen'd bit ops, and the top-k is a 1024-row sort."""
    cust = _customers_xy(spark, sf_dir)
    cells = (
        cust.select(
            _morton_expr(F.col("cx"), F.col("cy")).alias("morton_cell"),
            "c_custkey",
        )
        .groupBy("morton_cell")
        .agg(F.count("*").alias("n_customers"))
    )
    return cells.orderBy(F.desc("n_customers"), "morton_cell").limit(40)


QUERIES["geo_morton_hotspots"] = geo_morton_hotspots
ORACLES["geo_morton_hotspots"] = f"""
    WITH c AS ({_CUST_XY_SQL})
    SELECT {_morton_sql('cx', 'cy')} AS morton_cell,
           COUNT(*) AS n_customers
    FROM c
    GROUP BY 1
    ORDER BY n_customers DESC, morton_cell
    LIMIT 40
"""


# --- 4. haversine span to nation centroid -----------------------------------
def geo_haversine_nation_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle distance from each customer to its nation
    centroid (both points hash-derived: lat ∈ [-60, 60), lon ∈ [-180,
    180)), rolled up per nation. The haversine runs in doubles but
    every per-row distance is floor-quantized BEFORE the sum (the
    repo's order-independence idiom), so the per-nation aggregates are
    exact integers. Quantum = 1 hectometer, NOT meters: sin/cos/asin
    are the repo's only transcendentals and are not IEEE-exactly
    specified, so JVM and DuckDB libm may differ by ~1 ulp (~1e-8 m
    here); at a 100 m quantum a per-row floor flip needs the true
    distance within ~1e-10 of a boundary — ~1e-5 odds per 150k-row
    sweep, vs ~1e-3 at meters (review catch; the residual risk is
    documented, not zero).

    100 TB: map-only trig + one 25-key aggregation; the nation
    centroid frame broadcasts."""
    cust = _customers_xy(spark, sf_dir)
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        (_coord("geo-nx-", F.col("n_nationkey")) * 120.0 / _AXIS - 60.0).alias("nlat"),
        (_coord("geo-ny-", F.col("n_nationkey")) * 360.0 / _AXIS - 180.0).alias("nlon"),
    )
    pts = cust.select(
        "c_nationkey",
        (F.col("cy") * 120.0 / _AXIS - 60.0).alias("clat"),
        (F.col("cx") * 360.0 / _AXIS - 180.0).alias("clon"),
    ).join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
    dphi = F.radians(F.col("nlat") - F.col("clat")) / 2
    dlmb = F.radians(F.col("nlon") - F.col("clon")) / 2
    a = F.sin(dphi) * F.sin(dphi) + F.cos(F.radians("clat")) * F.cos(
        F.radians("nlat")
    ) * F.sin(dlmb) * F.sin(dlmb)
    hm = F.floor(2 * 6371000.0 * F.asin(F.sqrt(a)) / 100)
    return (
        pts.select("n_nationkey", hm.alias("m"))
        .groupBy("n_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("m").alias("sum_hm"),
            F.min("m").alias("min_hm"),
            F.max("m").alias("max_hm"),
        )
    )


QUERIES["geo_haversine_nation_span"] = geo_haversine_nation_span
ORACLES["geo_haversine_nation_span"] = f"""
    WITH c AS ({_CUST_XY_SQL}),
    nat AS (
        SELECT n_nationkey,
               ({_coord_sql('geo-nx-', 'n_nationkey')}) * 120.0 / {_AXIS} - 60.0 AS nlat,
               ({_coord_sql('geo-ny-', 'n_nationkey')}) * 360.0 / {_AXIS} - 180.0 AS nlon
        FROM nation
    ),
    pts AS (
        SELECT n_nationkey,
               cy * 120.0 / {_AXIS} - 60.0 AS clat,
               cx * 360.0 / {_AXIS} - 180.0 AS clon,
               nlat, nlon
        FROM c JOIN nat ON c_nationkey = n_nationkey
    ),
    dist AS (
        SELECT n_nationkey,
               FLOOR(2 * 6371000.0 * ASIN(SQRT(
                   SIN(RADIANS(nlat - clat) / 2) * SIN(RADIANS(nlat - clat) / 2)
                   + COS(RADIANS(clat)) * COS(RADIANS(nlat))
                     * SIN(RADIANS(nlon - clon) / 2) * SIN(RADIANS(nlon - clon) / 2)
               )) / 100)::BIGINT AS m
        FROM pts
    )
    SELECT n_nationkey,
           COUNT(*) AS n_customers,
           SUM(m)::BIGINT AS sum_hm,
           MIN(m) AS min_hm,
           MAX(m) AS max_hm
    FROM dist
    GROUP BY n_nationkey
"""
