from scio_db_spark.sources.readers import (
    from_rows,
    has_avro_jar,
    queue_reader_options,
    read_date_partitioned,
    read_files,
    read_stream_avro,
    read_stream_files,
    read_stream_queue,
    read_stream_rate,
    read_table_jdbc,
)

__all__ = [
    "from_rows",
    "has_avro_jar",
    "queue_reader_options",
    "read_date_partitioned",
    "read_files",
    "read_stream_avro",
    "read_stream_files",
    "read_stream_queue",
    "read_stream_rate",
    "read_table_jdbc",
]
