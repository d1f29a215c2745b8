from etl_extractor_spark.functions.text import (
    normalize_text,
    standardize_columns,
    truncate,
    prefixed_key,
)
from etl_extractor_spark.functions.dates import (
    parse_date,
    fecha_key,
    date_dim_columns,
)
from etl_extractor_spark.functions.casts import (
    to_double_or,
    to_long_or,
    to_string_or,
)

__all__ = [
    "normalize_text",
    "standardize_columns",
    "truncate",
    "prefixed_key",
    "parse_date",
    "fecha_key",
    "date_dim_columns",
    "to_double_or",
    "to_long_or",
    "to_string_or",
]
