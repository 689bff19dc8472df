"""Idempotency-key extraction (P1/P2).

Reference: ``MyEventRecordUtils.scala:55`` builds
``s"${event.transactionId}-${customer.id}"``; ``MediationService.scala:216``
maps every record to that KV pair. Here it is a pure Column expression so
it stays inside whole-stage codegen — no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KEY_COL = "idempotent_key"


def idempotent_key(*parts: str | Column) -> Column:
    """``"part1-part2-..."`` — the reference's key shape.

    Null parts render as the literal ``"null"`` (Scala string
    interpolation semantics: ``s"${null}-x"`` is ``"null-x"``). A bare
    ``concat_ws`` would SKIP nulls, collapsing ``(null, "x")`` and
    ``("x", null)`` onto the same key and silently deduplicating
    distinct records.
    """
    cols = [
        F.coalesce(
            (F.col(p) if isinstance(p, str) else p).cast("string"),
            F.lit("null"),
        )
        for p in parts
    ]
    return F.concat_ws("-", *cols)


def with_idempotent_key(
    df: DataFrame, *parts: str | Column, key_col: str = KEY_COL
) -> DataFrame:
    """KV-pair mapping: keep the record, add the key column.

    The Spark analogue of Beam's ``KV[String, MyEventRecord]``
    (MediationService.scala:216-231): downstream keyed ops are
    ``groupBy(key_col)``.
    """
    return df.withColumn(key_col, idempotent_key(*parts))
