from scio_db_spark.sources.readers import (
    from_rows,
    read_date_partitioned,
    read_files,
    read_stream_files,
    read_stream_rate,
    read_stream_queue,
)

__all__ = [
    "from_rows",
    "read_date_partitioned",
    "read_files",
    "read_stream_files",
    "read_stream_rate",
    "read_stream_queue",
]
