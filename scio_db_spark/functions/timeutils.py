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

import re

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
    """Exactly the last N dates ending today
    (TimeUtilsInterim.scala:10-14) — same window as the S4 path probe
    (``_existing_date_paths(days=N)``). ``N <= 0`` is an empty list:
    Spark's sequence() with start > stop would otherwise auto-step -1
    and return [tomorrow, today]."""
    if days_back <= 0:
        return F.array().cast("array<date>")
    return F.sequence(
        F.date_sub(F.current_date(), days_back - 1), F.current_date()
    )


def in_months(ts: Column, months: tuple[int, ...]) -> Column:
    """Seasonal calendar filter (TimeUtils.scala:115-120)."""
    return F.month(ts).isin(*months)


_ISO_DUR = re.compile(
    r"^P(?:(?P<d>\d+)D)?"
    r"(?:T(?:(?P<h>\d+)H)?(?:(?P<m>\d+)M)?(?:(?P<s>\d+(?:\.\d+)?)S)?)?$"
)


def parse_iso_duration(text: str) -> float:
    """ISO-8601 duration string → seconds, at PLAN time (driver-side).

    The reference parses ``PT30S``-style durations into (window start,
    duration) pairs (TimeUtils.scala:86-113); here the parsed seconds
    feed ``F.window(...)``/trigger configuration. Weeks/months/years
    are rejected (calendar-dependent), as in java.time.Duration.
    """
    m = _ISO_DUR.match(text.strip().upper())
    if not m or not any(m.groupdict().values()):
        raise ValueError(f"invalid ISO-8601 duration: {text!r}")
    days = int(m.group("d") or 0)
    hours = int(m.group("h") or 0)
    mins = int(m.group("m") or 0)
    secs = float(m.group("s") or 0)
    return days * 86400 + hours * 3600 + mins * 60 + secs


def window_from_iso(ts: Column, iso_duration: str) -> Column:
    """Tumbling window column whose length is an ISO-8601 duration."""
    return F.window(ts, f"{parse_iso_duration(iso_duration)} seconds")
