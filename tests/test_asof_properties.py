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


_iv_left = st.lists(st.tuples(_keys, _times), min_size=1, max_size=10)
_iv_right = st.lists(
    st.tuples(_keys, _times, st.integers(0, 99)), min_size=0, max_size=10
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_iv_left, right=_iv_right)
def test_interval_join_matches_bruteforce_model(spark, left, right):
    # Batch execution of the streaming helper (watermarks are no-ops):
    # every (left, right) pair with equal keys and right_time within
    # [left_time, left_time + 5] must appear, nothing else.
    from scio_db_spark.operators.joins import interval_join

    import datetime

    base = datetime.datetime(2024, 1, 1)
    to_ts = lambda s: base + datetime.timedelta(seconds=s)  # noqa: E731
    ldf = spark.createDataFrame(
        [Row(ik=k, itime=to_ts(t), lid=i) for i, (k, t) in enumerate(left)],
        "ik string, itime timestamp, lid int",
    )
    rdf = spark.createDataFrame(
        [Row(ck=k, ctime=to_ts(t), rid=r) for k, t, r in right],
        "ck string, ctime timestamp, rid int",
    )
    out = interval_join(
        ldf, rdf, left_key="ik", right_key="ck",
        left_time="itime", right_time="ctime",
        lower="0 seconds", upper="5 seconds",
    )
    got = {(r.lid, r.rid) for r in out.collect()}
    expected = {
        (i, rid)
        for i, (lk, lt) in enumerate(left)
        for (rk, rt, rid) in right
        if lk == rk and lt <= rt <= lt + 5
    }
    assert got == expected


_mix_vals = st.lists(
    st.tuples(
        st.integers(min_value=-(1 << 62), max_value=1 << 62),
        st.floats(
            min_value=-1e9, max_value=1e9,
            allow_nan=False, allow_infinity=False,
        ),
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=_mix_vals, nparts=st.sampled_from([2, 7, 150]))
def test_global_rank_desc_mixed_types_and_two_level_probe(
    spark, vals, nparts
):
    """Exercises the round-7 probe rewrite: DESC folding via
    bitwise-NOT (long) and negation (double), extreme magnitudes, and
    (at nparts=150 >= _TWO_LEVEL_MIN_P) the two-level block search."""
    df = spark.createDataFrame(
        [Row(id=i, a=a, b=float(b)) for i, (a, b) in enumerate(vals)],
        "id long, a long, b double",
    )
    out = global_rank(
        df,
        [F.desc("a"), F.desc("b"), F.asc("id")],
        rank_col="rk",
        num_partitions=nparts,
    )
    got = {r.id: r.rk for r in out.collect()}
    expected = {
        i: pos + 1
        for pos, (i, _) in enumerate(
            sorted(
                enumerate(vals), key=lambda t: (-t[1][0], -t[1][1], t[0])
            )
        )
    }
    assert got == expected
