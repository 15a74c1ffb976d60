from .scans import (
    load_tables,
    read_csv_positional,
    read_json_rows,
    read_parquet_table,
    read_jdbc_table,
    read_jdbc_query,
)
from .sinks import (
    append_history,
    dual_write,
    merge_upsert,
    write_parquet,
)

__all__ = [
    "load_tables",
    "read_csv_positional",
    "read_json_rows",
    "read_parquet_table",
    "read_jdbc_table",
    "read_jdbc_query",
    "append_history",
    "dual_write",
    "merge_upsert",
    "write_parquet",
]
