from demv_spark.sources.readers import (
    read_csv,
    read_csv_noheader,
    read_csv_semicolon,
    read_table,
)

__all__ = ["read_table", "read_csv", "read_csv_noheader", "read_csv_semicolon"]
