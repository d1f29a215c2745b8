"""The end-to-end ETL pipeline (X1/X2/X3 — reference pipeline.py:10-43,
main.py:417-431).

The reference runs extract → stage → dims → fact → DW-load as separate
OS processes handing data through a SQLite file. Spark-first, the whole
flow is ONE driver process and ONE SparkSession; stage boundaries are
durable parquet zones (staging / gold), and each stage is lazy
DataFrame composition with a single write action at its end — Catalyst
optimizes across each stage's full expression tree.

Stage map (reference → here):
  read_sources   main.py:29-76     source registry, per-source isolation
  stage          main.py:82-93     overwrite-mode staging parquet
  build_dims     main.py:97-190    dim_cliente/producto/fuente/fecha
  build_fact     main.py:196-306   conform + union + enrich + sentinel
  load_gold      main.py:323-411   surrogate FK resolve (modulo fold +
                                   broadcast date lookup), partitioned
                                   fact layout (K4 analog)
"""

from __future__ import annotations

import logging
import os
from logging.handlers import RotatingFileHandler

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_extractor_spark.functions.casts import to_double_or, to_string_or
from etl_extractor_spark.functions.dates import fecha_key
from etl_extractor_spark.functions.text import normalize_text, prefixed_key, truncate
from etl_extractor_spark.operators.dims import add_surrogate_key, build_dim_date
from etl_extractor_spark.operators.facts import (
    conform_block,
    enrich_lookup,
    modulo_fk_fold,
    scalar_agg,
    union_blocks,
)
from etl_extractor_spark.sinks.writers import write_overwrite, write_partitioned


def get_logger(log_path: str | None = None) -> logging.Logger:
    """X3: rotating-file + console logging (reference core/logger.py)."""
    log = logging.getLogger("etl_extractor_spark.pipeline")
    if not log.handlers:
        log.setLevel(logging.INFO)
        fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        log.addHandler(sh)
        if log_path:
            fh = RotatingFileHandler(log_path, maxBytes=2_000_000, backupCount=3)
            fh.setFormatter(fmt)
            log.addHandler(fh)
    return log


def stage_sources(
    spark: SparkSession, sources: dict[str, DataFrame], staging_dir: str, log: logging.Logger
) -> dict[str, str]:
    """K1: overwrite-write every source frame to the staging zone.
    Idempotent by construction (fixes the reference's rerun-append
    duplication, SURVEY §4.2.5)."""
    paths: dict[str, str] = {}
    for name, df in sources.items():
        path = os.path.join(staging_dir, f"stg_{name}")
        try:  # X2: per-source isolation — a bad source never kills the run
            write_overwrite(df, path)
            paths[name] = path
            log.info("STAGING: stg_%s written", name)
        except Exception as exc:
            log.warning("STAGING: stg_%s failed: %s", name, exc)
    return paths


def build_dimensions(spark: SparkSession, staged: dict[str, str], gold_dir: str, log) -> dict[str, DataFrame]:
    """Dims from the staged star-schema sources (reference
    main.py:97-190; FIXTURES.md mapping customer/part/supplier/dates)."""
    read = lambda k: spark.read.parquet(staged[k])  # noqa: E731

    dim_cliente = (
        read("customer")
        .select(
            prefixed_key("c_custkey", "C", 9).alias("cliente_id"),
            normalize_text("c_name").alias("nombre"),
            F.col("c_mktsegment").alias("segmento"),
        )
        .dropDuplicates()
    )
    dim_producto = (
        read("part")
        .select(
            prefixed_key("p_partkey", "P", 9).alias("producto_id"),
            normalize_text("p_name").alias("nombre"),
            F.col("p_type").alias("categoria"),
        )
        .dropDuplicates()
    )
    dim_fuente = (
        read("supplier")
        .select(
            prefixed_key("s_suppkey", "F", 9).alias("fuente_id"),
            normalize_text("s_name").alias("nombre"),
        )
        .dropDuplicates()
    )
    # the reference unions the date columns of EVERY source feeding the
    # fact (main.py:164-190) — so the fact's date keys always resolve
    dim_fecha = build_dim_date(
        [
            read("orders").select("o_orderdate"),
            read("lineitem").select("l_shipdate"),
            read("events").select(F.to_date("ts").cast("timestamp").alias("ts")),
        ]
    )

    dims = {
        "dim_cliente": add_surrogate_key(dim_cliente, "cliente_id", "IdCliente"),
        "dim_producto": add_surrogate_key(dim_producto, "producto_id", "IdProducto"),
        "dim_fuente": add_surrogate_key(dim_fuente, "fuente_id", "IdFuente"),
        "dim_fecha": dim_fecha.withColumn("IdFecha", F.col("fecha_key")),
    }
    for name, df in dims.items():
        write_overwrite(df, os.path.join(gold_dir, name))
        log.info("DIM: %s built", name)
    return {
        name: spark.read.parquet(os.path.join(gold_dir, name)) for name in dims
    }


def build_fact(spark: SparkSession, staged: dict[str, str], log) -> DataFrame:
    """Conform heterogeneous sources to the canonical opinion-like fact
    (reference add_block, main.py:208-269) and union them (U1)."""
    orders = spark.read.parquet(staged["orders"])
    events = spark.read.parquet(staged["events"])
    blocks = [
        conform_block(
            orders,
            {
                "src": F.lit("orders"),
                "cliente_key": F.col("o_custkey").cast("long"),
                "producto_key": F.lit(None).cast("long"),
                "fecha_key": fecha_key("o_orderdate"),
                "puntaje": to_double_or("o_totalprice", 0.0),
                "texto": truncate("o_orderpriority", 2000),
            },
        ),
        conform_block(
            events,
            {
                "src": F.lit("events"),
                "cliente_key": F.col("user_id").cast("long"),
                "producto_key": F.lit(None).cast("long"),
                "fecha_key": fecha_key("ts"),
                "puntaje": to_double_or("value", 0.0),
                "texto": truncate("props", 2000),
            },
        ),
    ]
    fact = union_blocks(blocks)
    log.info("FACT: conformed %d source blocks", len(blocks))
    return fact


def load_gold(
    spark: SparkSession, fact: DataFrame, dims: dict[str, DataFrame], gold_dir: str, log
) -> DataFrame:
    """FK resolution with the reference's never-drop-rows policy
    (main.py:323-411): modulo-fold out-of-range business keys into the
    dim key range (J5), resolve date keys via broadcast lookup (J3),
    sentinel-default what cannot match — then write the fact partitioned
    by year (K4: the Spark substitute for the reference's B-tree index
    on the date key is partition pruning)."""
    max_cliente = int(scalar_agg(dims["dim_cliente"], F.max("IdCliente")))
    max_producto = int(scalar_agg(dims["dim_producto"], F.max("IdProducto")))
    default_fuente = int(scalar_agg(dims["dim_fuente"], F.min("IdFuente")))

    resolved = (
        fact.withColumn(
            "IdCliente",
            modulo_fk_fold(F.coalesce(F.col("cliente_key"), F.lit(1)), max_cliente),
        )
        .withColumn(
            "IdProducto",
            modulo_fk_fold(F.coalesce(F.col("producto_key"), F.lit(1)), max_producto),
        )
        .withColumn("IdFuente", F.lit(default_fuente).cast("long"))
    )
    resolved = enrich_lookup(
        resolved,
        dims["dim_fecha"].select("fecha_key", "IdFecha"),
        "fecha_key",
        "fecha_key",
        {"IdFecha": "IdFecha"},
        {"IdFecha": F.lit(-1)},
    )
    gold_fact = resolved.select(
        "src",
        "IdCliente",
        "IdProducto",
        "IdFuente",
        F.col("IdFecha").cast("long").alias("IdFecha"),
        F.round("puntaje", 4).alias("Calificacion"),
        F.lit("").alias("Sentimiento"),  # reserved, reference main.py:392
        F.col("texto").alias("Comentario"),
        (F.col("fecha_key") / 10000).cast("int").alias("anio"),
    )
    write_partitioned(gold_fact, os.path.join(gold_dir, "fact_opinion"), ["anio"])
    out = spark.read.parquet(os.path.join(gold_dir, "fact_opinion"))
    log.info("GOLD: fact_opinion loaded (%d rows)", out.count())
    return out


def run_pipeline(
    spark: SparkSession,
    sources: dict[str, DataFrame],
    staging_dir: str,
    gold_dir: str,
    log_path: str | None = None,
) -> dict[str, int]:
    """X1: the orchestrator — sequential stages, fail-fast between
    stages, per-source isolation inside extraction/staging. Returns the
    row-count reconciliation the reference logs at every stage."""
    log = get_logger(log_path)
    staged = stage_sources(spark, sources, staging_dir, log)
    dims = build_dimensions(spark, staged, gold_dir, log)
    fact = build_fact(spark, staged, log)
    gold = load_gold(spark, fact, dims, gold_dir, log)
    counts = {name: df.count() for name, df in dims.items()}
    counts["fact_opinion"] = gold.count()
    log.info("PIPELINE DONE: %s", counts)
    return counts
