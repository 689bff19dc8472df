"""Driver-contract smoke tests: entry(), queries(), oracle_sql() coherence,
plus an oracle spot-check of representative queries at sf0.001."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "spark_entry", os.path.join(_REPO_ROOT, "__spark_entry__.py")
)
entry_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(entry_mod)

SPOT_QUERIES = [
    "q01_pricing_summary",
    "events_dedup_ttl_sessions",
    "docs_minhash_signature",
    "emb_cosine_topk",
]


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) >= 3


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 40


@pytest.mark.parametrize("name", SPOT_QUERIES)
def test_spot_oracle_match(spark, sf_dir, name):
    from scio_db_spark.plans.catalog import TABLES

    key = entry_mod._driver_key(name)
    q = entry_mod.queries()[key]
    sql = entry_mod.oracle_sql()[key]
    spark_pd = q(spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    duck_pd = con.execute(sql).fetchdf()
    assert len(spark_pd) == len(duck_pd)
    assert sorted(spark_pd.columns) == sorted(duck_pd.columns)
    cols = sorted(spark_pd.columns)

    def canon(df):
        return sorted(
            tuple(repr(float(v)) if isinstance(v, float) else str(v) for v in rec)
            for rec in df[cols].itertuples(index=False)
        )

    assert canon(spark_pd) == canon(duck_pd)


def test_driver_verified_set_current():
    """_DRIVER_VERIFIED must be regenerated after each round.

    The driver's correctness gate records only the first 50 of
    sorted(queries()); stale aliases ("a_" prefixes on already-green
    queries) evict genuinely-new queries from the window. This makes
    committing a round without running tools/update_driver_verified.py
    a hard suite failure instead of a tool warning (round-4 verdict
    item #5).
    """
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "update_driver_verified",
        os.path.join(_REPO_ROOT, "tools", "update_driver_verified.py"),
    )
    tool = _ilu.module_from_spec(spec)
    spec.loader.exec_module(tool)

    pinned = entry_mod._DRIVER_VERIFIED_ROUND
    names = tool.verified_names(pinned)
    current = set(entry_mod._DRIVER_VERIFIED)
    missing = names - current
    regressed = (current & tool._artifact_names(pinned)) - names
    assert not missing, (
        f"stale _DRIVER_VERIFIED: run tools/update_driver_verified.py "
        f"and paste the output into __spark_entry__.py; missing "
        f"{sorted(missing)}"
    )
    assert not regressed, (
        f"_DRIVER_VERIFIED contains entries whose latest driver row is "
        f"not green: {sorted(regressed)}"
    )
