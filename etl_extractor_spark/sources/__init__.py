from etl_extractor_spark.sources.parquet import load_table, load_tables, register_views
from etl_extractor_spark.sources.csv import read_csv
from etl_extractor_spark.sources.json_api import read_json_records
from etl_extractor_spark.sources.registry import SourceRegistry

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "read_csv",
    "read_json_records",
    "SourceRegistry",
]
