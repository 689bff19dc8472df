"""Exact integer math shared by the oracle-checked plans.

``bitlen`` = floor(log2(x)) + 1 for POSITIVE integers, computed from
the binary string length: a float log2 would risk cross-engine
last-ulp drift exactly at power-of-two boundaries, where these
operators put their bucket/quantization edges. Used by the surprisal
gates (plans/corpusops.py) and the gap histogram
(plans/mediation.py); ``BITLEN_SQL`` is the DuckDB twin (one ``%s``
placeholder for the integer expression).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bitlen(col: Column) -> Column:
    return F.length(F.conv(col.cast("string"), 10, 2))


# Plain string (not an f-string) so the braces stay single.
BITLEN_SQL = "length(format('{:b}', CAST(%s AS BIGINT)))"
