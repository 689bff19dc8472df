"""Property-based tests: asof_join and global_rank vs brute-force
Python models on arbitrary inputs (hypothesis)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from scio_db_spark.operators.asof import asof_join
from scio_db_spark.operators.rank import global_rank

_keys = st.sampled_from(["a", "b", "c"])
_times = st.integers(min_value=0, max_value=20).map(float)

_left_rows = st.lists(
    st.tuples(_keys, _times), min_size=1, max_size=12
)
_right_rows = st.lists(
    st.tuples(_keys, _times, st.integers(0, 99)), min_size=0, max_size=12
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows)
def test_asof_matches_bruteforce_model(spark, left, right):
    ldf = spark.createDataFrame(
        [Row(k=k, t=t, eid=i) for i, (k, t) in enumerate(left)],
        "k string, t double, eid int",
    )
    rdf = spark.createDataFrame([], "k string, rt double, fact int") if not right else spark.createDataFrame(
        [Row(k=k, rt=t, fact=f) for k, t, f in right],
        "k string, rt double, fact int",
    )
    out = asof_join(
        ldf, rdf, key="k", left_time="t", right_time="rt",
        payload_cols=["fact"], tie_col="fact",
    )
    got = {r.eid: r.fact for r in out.collect()}

    def model(k, t):
        cands = [(rt, f) for (rk, rt, f) in right if rk == k and rt <= t]
        if not cands:
            return None
        best_rt = max(rt for rt, _ in cands)
        return max(f for rt, f in cands if rt == best_rt)

    expected = {i: model(k, t) for i, (k, t) in enumerate(left)}
    assert got == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    nparts=st.integers(1, 5),
)
def test_global_rank_matches_sorted_positions(spark, vals, nparts):
    df = spark.createDataFrame(
        [Row(id=i, v=float(v)) for i, v in enumerate(vals)],
        "id long, v double",
    )
    out = global_rank(
        df, [F.asc("v"), F.asc("id")], rank_col="rk",
        num_partitions=nparts,
    )
    got = {r.id: r.rk for r in out.collect()}
    expected = {
        i: pos + 1
        for pos, (i, _) in enumerate(
            sorted(enumerate(vals), key=lambda t: (t[1], t[0]))
        )
    }
    assert got == expected
