from scio_db_spark.operators.asof import asof_join
from scio_db_spark.operators.bucketing import write_bucketed_table
from scio_db_spark.operators.clusters import connected_components
from scio_db_spark.operators.dedup import (
    distinct_by_key,
    first_per_key,
    mark_duplicates,
    ttl_sessionize,
)
from scio_db_spark.operators.joins import (
    anti_join_split,
    assert_unique_keys,
    interval_join,
    lookup_join,
)
from scio_db_spark.operators.keying import with_idempotent_key
from scio_db_spark.operators.rank import global_rank
from scio_db_spark.operators.skew import salted_agg, salted_join_key
from scio_db_spark.operators.validity import is_valid_ber, split_ok_ko
from scio_db_spark.operators.windows import tumbling_window_agg

__all__ = [
    "asof_join",
    "with_idempotent_key",
    "is_valid_ber",
    "split_ok_ko",
    "distinct_by_key",
    "first_per_key",
    "mark_duplicates",
    "ttl_sessionize",
    "anti_join_split",
    "assert_unique_keys",
    "interval_join",
    "lookup_join",
    "connected_components",
    "global_rank",
    "salted_agg",
    "salted_join_key",
    "write_bucketed_table",
    "tumbling_window_agg",
]
