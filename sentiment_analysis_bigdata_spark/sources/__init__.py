from sentiment_analysis_bigdata_spark.sources.catalog import (
    load_table,
    load_tables,
    read_csv,
    write_csv,
    write_parquet,
)

__all__ = ["load_table", "load_tables", "read_csv", "write_csv", "write_parquet"]
