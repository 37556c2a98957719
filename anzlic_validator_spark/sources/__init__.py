"""Table sources: parquet test tables, Iceberg gateway, fixture loaders."""

from anzlic_validator_spark.sources.tables import (
    load_table,
    load_tables,
    read_clips,
    TESTDATA_TABLES,
)

__all__ = ["load_table", "load_tables", "read_clips", "TESTDATA_TABLES"]
