from etl_extractor_spark.sinks.writers import (
    write_overwrite,
    write_append,
    write_partitioned,
)

__all__ = ["write_overwrite", "write_append", "write_partitioned"]
