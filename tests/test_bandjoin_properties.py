"""Property-based: epsilon_self_join vs brute force on adversarial
values (band boundaries, duplicates, negatives, extreme magnitudes)."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from scio_db_spark.operators.bandjoin import epsilon_self_join

# values clustered near multiples of small eps (band boundaries), plus
# extremes and negatives
_vals = st.lists(
    st.one_of(
        st.integers(min_value=-20, max_value=20),
        st.integers(min_value=-20, max_value=20).map(lambda k: k * 5),
        st.sampled_from(
            [(1 << 60), (1 << 60) + 1, -(1 << 60), (1 << 53)]
        ),
    ),
    min_size=2,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=_vals, eps=st.sampled_from([0, 1, 5]))
def test_epsilon_join_matches_bruteforce(spark, vals, eps):
    rows = [Row(id=i, v=v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = sorted(
        (r.id_a, r.id_b)
        for r in epsilon_self_join(df, "id", "v", eps=eps).collect()
    )
    want = sorted(
        (a.id, b.id)
        for a, b in itertools.combinations(rows, 2)
        if abs(a.v - b.v) <= eps
    )
    assert got == want
