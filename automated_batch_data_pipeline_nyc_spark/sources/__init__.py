from .readers import (
    TABLE_NAMES,
    from_rows,
    load_tables,
    read_csv,
    read_csv_glob,
    read_parquet,
    read_sql_table,
)
from .writers import (
    export_csv_single_file,
    write_csv,
    write_parquet,
    write_table,
)

__all__ = [
    "TABLE_NAMES",
    "from_rows",
    "load_tables",
    "read_csv",
    "read_csv_glob",
    "read_parquet",
    "read_sql_table",
    "export_csv_single_file",
    "write_csv",
    "write_parquet",
    "write_table",
]
