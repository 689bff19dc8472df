"""Exact-integer hygiene at the Arrow/pandas boundary.

Stateful Pandas operators in this package carry their statistics as
exact int64; pandas coerces a nullable int64 column to float64+NaN.
Below 2^53 every int64 is exactly representable in float64, so the
coercion is harmless and reversible; at or past 2^53 the information
is destroyed BEFORE any check can run (the rounded float round-trips
to itself, so no after-the-fact comparison can detect the loss).
The only sound policy is to REFUSE the range where exactness cannot
be verified — loud failure, never drift (streaming/anomaly.py
policy).
"""

from __future__ import annotations

import pandas as pd

_EXACT_LIMIT = 1 << 53  # float64 represents every |int| < 2^53 exactly


def exact_int64(xs: "pd.Series") -> "pd.Series":
    """Undo pandas' NULL-driven int64->float64 coercion, exactly.

    Values with abs(x) < 2^53 are recovered bit-exactly; any larger
    magnitude is refused outright (by the time this runs, a >=2^53
    value may ALREADY have been rounded by the coercion itself, so it
    cannot be verified — refusal is the only non-silent option).
    """
    if len(xs) and xs.dtype.kind == "f":
        if (xs.abs() >= _EXACT_LIMIT).any():
            raise ValueError(
                "integer magnitude >= 2^53 arrived float64-coerced in a "
                "NULL-bearing micro-batch chunk; exactness cannot be "
                "verified after the coercion. Pre-filter NULLs upstream "
                "or reduce the quantization scale"
            )
        return xs.astype("int64")
    return xs
