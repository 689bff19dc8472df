from scio_db_spark.operators.keying import with_idempotent_key
from scio_db_spark.operators.validity import is_valid_ber, split_ok_ko
from scio_db_spark.operators.dedup import (
    distinct_by_key,
    first_per_key,
    mark_duplicates,
    ttl_sessionize,
)
from scio_db_spark.operators.joins import (
    anti_join_split,
    assert_unique_keys,
    lookup_join,
)
from scio_db_spark.operators.windows import tumbling_window_agg

__all__ = [
    "with_idempotent_key",
    "is_valid_ber",
    "split_ok_ko",
    "distinct_by_key",
    "first_per_key",
    "mark_duplicates",
    "ttl_sessionize",
    "anti_join_split",
    "assert_unique_keys",
    "lookup_join",
    "tumbling_window_agg",
]
