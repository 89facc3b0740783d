from .readers import TABLES, load_table, load_tables, read_csv, read_parquet
from .writers import write_parquet

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_parquet",
    "write_parquet",
]
