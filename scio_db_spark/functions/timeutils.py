"""Date/time scalar library.

Re-expresses the reference's ``utils/time/TimeUtils.scala`` on Column
expressions (SURVEY.md §2.3 note):

- multi-pattern timestamp parsing (TimeUtils.scala:67-84 tries 6
  patterns then ISO) → ``coalesce(try_to_timestamp(c, p) for p in ...)``
- shard-name formatting (:38-57) → ``date_format``
- epoch→string (:140-143) → ``from_unixtime``
- ms → "1h 2m 3sec" (:127-138) → format expression
- weekend/seasonal filter (:115-120) → ``dayofweek``/``month``

Everything stays JVM-side (whole-stage codegen); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Default pattern ladder, mirroring the reference's ordered attempts.
DEFAULT_PATTERNS = (
    "yyyy-MM-dd HH:mm:ss",
    "yyyy/MM/dd HH:mm:ss",
    "dd-MM-yyyy HH:mm:ss",
    "yyyyMMdd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd",
)


def parse_timestamp_multi(
    col: str | Column, patterns: tuple[str, ...] = DEFAULT_PATTERNS
) -> Column:
    """Try each pattern in order; first success wins; else NULL."""
    c = F.col(col) if isinstance(col, str) else col
    attempts = [F.try_to_timestamp(c, F.lit(p)) for p in patterns]
    return F.coalesce(*attempts)


def shard_name(start: Column, end: Column, fmt: str = "yyyyMMddHHmmss") -> Column:
    """Window shard name ``<start>_<end>`` (TimeUtils.scala:38-57)."""
    return F.concat_ws(
        "_", F.date_format(start, fmt), F.date_format(end, fmt)
    )


def epoch_millis_to_string(col: Column, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Epoch-millis long → formatted string (TimeUtils.scala:140-143)."""
    return F.date_format(F.timestamp_millis(col), fmt)


def human_duration(ms: Column) -> Column:
    """Millis → '1h 2m 3sec' (TimeUtils.scala:127-138)."""
    secs = (ms / 1000).cast("long")
    return F.concat(
        (secs / 3600).cast("long").cast("string"),
        F.lit("h "),
        ((secs % 3600) / 60).cast("long").cast("string"),
        F.lit("m "),
        (secs % 60).cast("string"),
        F.lit("sec"),
    )


def is_weekend(ts: Column) -> Column:
    """dayofweek ∈ {Sat, Sun} (TimeUtils.scala:115-120)."""
    return F.dayofweek(ts).isin(1, 7)


def date_partition_suffix(ts: Column, name: str = "date") -> Column:
    """``name=yyyyMMdd`` partition-path suffix (TimeUtils.scala:145-149)."""
    return F.concat(F.lit(f"{name}="), F.date_format(ts, "yyyyMMdd"))


def day_list(days_back: int) -> Column:
    """Sequence of the last N dates (TimeUtilsInterim.scala:10-14)."""
    return F.sequence(
        F.date_sub(F.current_date(), days_back), F.current_date()
    )
