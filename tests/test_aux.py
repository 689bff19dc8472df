"""Auxiliary plumbing tests: mock generator, queue serializers, SSL."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_mock_bers_shape_and_keys(spark):
    from scio_db_spark.sources.mockdata import mock_bers

    df = mock_bers(spark, 100, distinct_keys=10)
    rows = df.collect()
    assert len(rows) == 100
    assert {r.customer_id for r in rows} == {str(i) for i in range(10)}
    # P10: jittered transaction ids are unique even with repeated keys.
    assert len({r.transaction_id for r in rows}) == 100
    assert all(r.retries is None for r in rows)


def test_stable_mock_bers_deterministic(spark):
    from scio_db_spark.sources.mockdata import stable_mock_bers

    a = {r.transaction_id for r in stable_mock_bers(spark, 20, 5).collect()}
    b = {r.transaction_id for r in stable_mock_bers(spark, 20, 5).collect()}
    assert a == b and len(a) == 5


def test_serialize_json_wire_shape(spark):
    from scio_db_spark.sinks.queue import serialize_json

    df = spark.createDataFrame([(1, "x")], "id int, name string")
    out = serialize_json(df, key_col="id").collect()[0]
    assert out.key == "1"
    assert '"name":"x"' in out.value


def test_ssl_context_default_and_jks_gate():
    from scio_db_spark.security import build_ssl_context

    ctx = build_ssl_context()
    assert ctx.protocol is not None
    with pytest.raises(NotImplementedError, match="JKS/P12"):
        build_ssl_context(
            secret_provider=lambda n: b"", ca_secret="store.jks"
        )


def test_ssl_context_cache_is_bounded():
    """Per-rotation providers must evict, not accumulate (security.py)."""
    from scio_db_spark import security

    start = len(security._cached)
    for _ in range(security._CACHE_MAX + 10):
        security.build_ssl_context(secret_provider=lambda n: b"")
    assert len(security._cached) <= security._CACHE_MAX
    assert len(security._cached) >= min(start + 1, security._CACHE_MAX)


def test_ssl_context_unhashable_provider_skips_cache():
    from scio_db_spark import security

    class EqNoHash:
        __hash__ = None  # defining __eq__ without __hash__ does this

        def __eq__(self, other):
            return True

        def __call__(self, name):
            return b""

    before = len(security._cached)
    ctx = security.build_ssl_context(secret_provider=EqNoHash())
    assert ctx is not None
    assert len(security._cached) == before


def test_env_secret_provider(monkeypatch):
    from scio_db_spark.security import env_secret_provider

    monkeypatch.setenv("MY_SECRET", "s3cr3t")
    assert env_secret_provider("MY_SECRET") == b"s3cr3t"
    with pytest.raises(KeyError):
        env_secret_provider("ABSENT_SECRET")


def test_day_list_zero_is_empty(spark):
    from scio_db_spark.functions.timeutils import day_list

    row = spark.range(1).select(day_list(0).alias("d")).first()
    assert row.d == []
    row3 = spark.range(1).select(day_list(3).alias("d")).first()
    assert len(row3.d) == 3


def test_quality_score_null_text_parity_with_oracle(spark):
    """NULL text must score NULL on BOTH engines (DuckDB least()
    ignores NULLs, so the oracle needs its explicit CASE guard —
    without it a NULL doc scores 0.8 and quality gates diverge)."""
    import duckdb

    from pyspark.sql import functions as F

    from scio_db_spark.functions import text as X

    sdf = spark.createDataFrame(
        [(0, None), (1, "the quick fox")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.q
        for r in sdf.select(
            "doc_id", X.quality_score(F.col("text")).alias("q")
        ).collect()
    }
    con = duckdb.connect()
    duck = dict(
        con.execute(
            f"SELECT doc_id, {X.quality_score_sql('text')} FROM "
            "(VALUES (0, NULL), (1, 'the quick fox')) AS t(doc_id, text)"
        ).fetchall()
    )
    assert got[0] is None and duck[0] is None
    assert abs(got[1] - duck[1]) < 1e-12


def test_ssl_context_rejects_half_client_pair():
    import pytest as _pytest

    from scio_db_spark.security import build_ssl_context

    with _pytest.raises(ValueError, match="together"):
        build_ssl_context(
            secret_provider=lambda _s: b"x",
            client_cert_secret="cert.pem",
        )
