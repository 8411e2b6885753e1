from tda596_lab02mapreduce_spark.sources.files import (
    compact_parquet,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text_lines,
    read_whole_files,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
)

__all__ = [
    "compact_parquet",
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet",
    "read_text_lines",
    "read_whole_files",
    "write_csv",
    "write_json",
    "write_orc",
    "write_parquet",
]
