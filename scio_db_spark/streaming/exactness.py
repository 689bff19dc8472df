"""Exact-integer hygiene at the Arrow/pandas boundary.

Stateful Pandas operators in this package carry their statistics as
exact int64; pandas coerces a nullable int64 column to float64+NaN,
which silently rounds values past 2^53 — a contract violation that
must fail loudly, never drift (streaming/anomaly.py policy).
"""

from __future__ import annotations

import pandas as pd


def _exact_int64(xs: "pd.Series") -> "pd.Series":
    """Undo pandas' NULL-driven int64→float64 coercion EXACTLY.

    A micro-batch chunk containing a NULL arrives with the int column
    as float64+NaN; values past 2^53 would already have been rounded,
    so the round-trip is verified and failure is loud — never a
    silently drifted statistic (the module's no-float contract)."""
    if len(xs) and xs.dtype.kind == "f":
        as_int = xs.astype("int64")
        if not (as_int.astype(xs.dtype) == xs).all():
            raise ValueError(
                "integer value exceeded float64-exact range (2^53) in a "
                "NULL-bearing micro-batch; pre-filter NULLs upstream or "
                "reduce quantization scale"
            )
        return as_int
    return xs
