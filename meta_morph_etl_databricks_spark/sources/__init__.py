from .layout import file_pruning_fraction, write_zordered, zorder_key
from .scans import (
    load_tables,
    read_binary_files,
    read_csv_positional,
    read_jdbc_query,
    read_jdbc_table,
    read_json_rows,
    read_jsonl,
    read_orc,
    read_parquet_table,
    write_orc,
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
    "read_jsonl",
    "read_parquet_table",
    "read_jdbc_table",
    "read_jdbc_query",
    "read_orc",
    "write_orc",
    "read_binary_files",
    "append_history",
    "dual_write",
    "merge_upsert",
    "write_parquet",
    "zorder_key",
    "write_zordered",
    "file_pruning_fraction",
]
