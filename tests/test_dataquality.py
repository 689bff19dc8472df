"""operators/dataquality: profile + referential census semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from scio_db_spark.operators.dataquality import (
    constraint_census,
    profile,
    referential_census,
)


def test_constraint_census_three_valued(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], "id long, v double"
    )
    out = {
        r.constraint: r
        for r in constraint_census(
            df,
            {
                "v_nonneg": F.col("v") >= 0,
                "id_small": F.col("id") <= 2,
            },
        ).collect()
    }
    r = out["v_nonneg"]
    # NULL predicate is UNKNOWN, not a failure
    assert (r.n_rows, r.n_pass, r.n_fail, r.n_unknown) == (3, 1, 1, 1)
    r = out["id_small"]
    assert (r.n_pass, r.n_fail, r.n_unknown) == (2, 1, 0)


def test_profile_counts_nulls_distincts_uniqueness(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 1.5), (3, None, 1.5), (4, "b", 2.0)],
        "id long, s string, v double",
    )
    out = {r.column: r for r in profile(df).collect()}
    assert set(out) == {"id", "s", "v"}
    assert all(r.n_rows == 4 for r in out.values())
    assert (out["id"].n_null, out["id"].n_distinct) == (0, 4)
    assert out["id"].is_unique
    assert (out["s"].n_null, out["s"].n_distinct) == (1, 2)
    assert not out["s"].is_unique  # 'a' occurs twice
    assert (out["v"].n_null, out["v"].n_distinct) == (1, 2)
    assert not out["v"].is_unique  # 1.5 occurs twice


def test_hostile_names_survive_unpivot(spark):
    """Column and constraint names with spaces, quotes, backslashes,
    and dashes must pass through VERBATIM (no SQL interpolation)."""
    weird = ["order id", "isn't", "a\\b", "user-name"]
    df = spark.createDataFrame(
        [(1, 2, 3, 4)],
        schema=spark.createDataFrame([(1, 2, 3, 4)]).toDF(*weird).schema,
    ).toDF(*weird)
    out = {r.column: r for r in profile(df).collect()}
    assert set(out) == set(weird)
    assert all(r.n_null == 0 and r.n_distinct == 1 for r in out.values())

    cens = {
        r.constraint: r
        for r in constraint_census(
            df, {"isn't negative": df["order id"] >= 0, "b\\": df["a\\b"] > 0}
        ).collect()
    }
    assert set(cens) == {"isn't negative", "b\\"}
    assert all(r.n_pass == 1 and r.n_fail == 0 for r in cens.values())


def test_profile_all_null_column_not_unique(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, x string")
    out = {r.column: r for r in profile(df, ["x"]).collect()}
    assert (out["x"].n_null, out["x"].n_distinct) == (2, 0)
    assert not out["x"].is_unique  # vacuous uniqueness is not a key


def test_referential_census_orphans_and_childless(spark):
    child = spark.createDataFrame(
        [(10, "a"), (10, "b"), (20, "c"), (99, "orphan"), (99, "orphan2")],
        "fk long, payload string",
    )
    parent = spark.createDataFrame(
        [(10,), (20,), (30,)], "pk long"
    )
    r = referential_census(child, parent, "fk", "pk").collect()[0]
    assert r.n_child_rows == 5
    assert r.n_orphan_rows == 2 and r.n_orphan_keys == 1  # key 99
    assert r.n_parents == 3
    assert r.n_childless_parents == 1  # key 30


def test_referential_census_empty_child(spark):
    child = spark.createDataFrame([], "fk long, payload string")
    parent = spark.createDataFrame([(1,)], "pk long")
    r = referential_census(child, parent, "fk", "pk").collect()[0]
    assert r.n_child_rows == 0 and r.n_orphan_rows == 0
    assert r.n_parents == 1 and r.n_childless_parents == 1
