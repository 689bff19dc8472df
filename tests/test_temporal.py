"""Property tests for the temporal/CDC operator family.

Each operator is checked against an independent brute-force
formulation of its contract (sequential recurrence, interval
containment, full recompute), not against its own plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# -- snapshot_diff ----------------------------------------------------------
def _snap(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, a=a, b=b) for k, a, b in rows], "k INT, a STRING, b INT"
    )


def test_cdc_classifies_and_suppresses_unchanged(spark):
    from scio_db_spark.operators.cdc import snapshot_diff

    old = _snap(spark, [(1, "x", 1), (2, "y", 2), (3, "z", 3), (5, None, 5)])
    new = _snap(spark, [(2, "y", 2), (3, "Z", 3), (4, "w", 4), (5, None, 5)])
    out = {
        r["k"]: r.asDict()
        for r in snapshot_diff(
            old, new, key_cols=["k"], compare_cols=["a", "b"]
        ).collect()
    }
    # 1 deleted, 3 updated, 4 inserted; 2 and 5 (NULL == NULL) suppressed
    assert set(out) == {1, 3, 4}
    assert out[1]["op"] == "D" and out[1]["new_a"] is None
    assert out[3]["op"] == "U" and (out[3]["old_a"], out[3]["new_a"]) == (
        "z",
        "Z",
    )
    assert out[4]["op"] == "I" and out[4]["old_b"] is None


def test_cdc_null_to_value_is_update(spark):
    from scio_db_spark.operators.cdc import snapshot_diff

    old = _snap(spark, [(1, None, 1)])
    new = _snap(spark, [(1, "v", 1)])
    (row,) = snapshot_diff(
        old, new, key_cols=["k"], compare_cols=["a", "b"]
    ).collect()
    assert row["op"] == "U" and row["old_a"] is None and row["new_a"] == "v"


def test_cdc_roundtrip_reconstructs_new_snapshot(spark):
    """old + applied diff == new: the defining CDC property."""
    from scio_db_spark.operators.cdc import snapshot_diff

    old = _snap(spark, [(i, chr(97 + i % 5), i * i) for i in range(40)])
    new = _snap(
        spark,
        [
            (i, chr(97 + (i * 3) % 5), i * i + (i % 7 == 0))
            for i in range(8, 48)
        ],
    )
    diff = snapshot_diff(old, new, key_cols=["k"], compare_cols=["a", "b"])
    upserts = diff.filter(F.col("op") != "D").select(
        "k", F.col("new_a").alias("a"), F.col("new_b").alias("b")
    )
    deleted_or_changed = diff.select("k")
    applied = (
        old.join(deleted_or_changed, "k", "left_anti").unionByName(upserts)
    )
    assert sorted(map(tuple, applied.collect())) == sorted(
        map(tuple, new.collect())
    )


# -- cusum_crossings --------------------------------------------------------
def _cusum_sequential(vals, target, h):
    """Reference recurrence: S_i = max(0, S_{i-1} + (y_i - k))."""
    s, prev, n, first, mx = 0, 0, 0, None, 0
    for i, y in enumerate(vals):
        s = max(0, s + (y - target))
        if s > h and prev <= h:
            n += 1
            if first is None:
                first = i
        prev = s
        mx = max(mx, s)
    return n, first, mx


@pytest.mark.parametrize("target,h", [(50, 100), (30, 40), (80, 10)])
def test_cusum_matches_sequential_recurrence(spark, target, h):
    from scio_db_spark.operators.cusum import cusum_crossings

    import random

    rng = random.Random(42)
    data = []
    expect = {}
    for key in ("a", "b"):
        vals = [rng.randrange(0, 120) for _ in range(200)]
        data += [
            Row(k=key, ts=i, tie=i, v=v) for i, v in enumerate(vals)
        ]
        expect[key] = _cusum_sequential(vals, target, h)
    df = spark.createDataFrame(data, "k STRING, ts INT, tie INT, v LONG")
    out = {
        r["k"]: r
        for r in cusum_crossings(
            df, "k", "ts", "tie", F.col("v"), target, h
        ).collect()
    }
    for key, (n, first, mx) in expect.items():
        assert out[key]["n_crossings"] == n
        assert out[key]["first_alarm_ts"] == first
        assert out[key]["max_cusum"] == mx


def test_cusum_no_alarms_yields_null_first_ts(spark):
    from scio_db_spark.operators.cusum import cusum_crossings

    df = spark.createDataFrame(
        [Row(k="a", ts=i, tie=i, v=1) for i in range(10)],
        "k STRING, ts INT, tie INT, v LONG",
    )
    (row,) = cusum_crossings(
        df, "k", "ts", "tie", F.col("v"), 5, 1000
    ).collect()
    assert row["n_crossings"] == 0 and row["first_alarm_ts"] is None


# -- incremental agg --------------------------------------------------------
def test_incremental_merge_equals_full_recompute_any_split(spark):
    from scio_db_spark.operators.incremental import agg_state, merge_states

    df = spark.createDataFrame(
        [Row(k=i % 13, v=(i * 17) % 101) for i in range(500)],
        "k INT, v LONG",
    )
    full = agg_state(df, ["k"], {"sv": F.col("v")}, count_col="n")
    for mod in (2, 3, 5):
        parts = [
            agg_state(
                df.filter(F.col("v") % mod == r),
                ["k"],
                {"sv": F.col("v")},
                count_col="n",
            )
            for r in range(mod)
        ]
        merged = merge_states(parts, ["k"], ["n", "sv"])
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, full.collect())
        )


# -- PIT lookup (via the registered query, vs interval containment) --------
def test_pit_lookup_matches_interval_containment(spark, sf_dir):
    """Every probe's answer must be the history row whose
    [valid_from, valid_to) interval contains the probe instant —
    checked by the direct (non-scalable) inequality join."""
    from scio_db_spark.operators.scd2 import scd2_from_log
    from scio_db_spark.plans.catalog import table
    from scio_db_spark.plans.registry import all_queries

    out = all_queries()["orders_scd2_pit_lookup"].spark(spark, sf_dir)
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    hist = scd2_from_log(
        o, "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    # max-version state per (key, valid_from) is the PIT tie contract
    brute = (
        out.select("o_custkey", "grid_ts")
        .join(
            hist.withColumnRenamed("o_custkey", "hk"),
            (F.col("o_custkey") == F.col("hk"))
            & (F.col("valid_from") <= F.col("grid_ts")),
            "left",
        )
        .groupBy("o_custkey", "grid_ts")
        .agg(
            F.max_by("state", F.col("version")).alias("state_at"),
            F.max("version").cast("long").alias("version_at"),
        )
    )
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, brute.collect()))
    assert a == b


def test_cdc_null_keys_surface_as_separate_delete_and_insert(spark):
    """Equi-joins never match NULL keys, so a NULL-key row present in
    both snapshots surfaces as one D and one I (standard SQL join
    semantics) — never a misclassified op with swapped sides."""
    from scio_db_spark.operators.cdc import snapshot_diff

    old = _snap(spark, [(None, "x", 1)])
    new = _snap(spark, [(None, "x", 1)])
    out = [
        r.asDict()
        for r in snapshot_diff(
            old, new, key_cols=["k"], compare_cols=["a", "b"]
        ).collect()
    ]
    ops = sorted(r["op"] for r in out)
    assert ops == ["D", "I"]
    d = next(r for r in out if r["op"] == "D")
    i = next(r for r in out if r["op"] == "I")
    assert d["old_a"] == "x" and d["new_a"] is None
    assert i["new_a"] == "x" and i["old_a"] is None


def test_delta_join_law_on_random_splits(spark):
    """d(A JOIN B) must cover every pair exactly once for ANY split
    of either side — including cross-delta pairs."""
    import random

    from pyspark.sql import functions as F

    from scio_db_spark.operators.incremental import delta_join

    rng = random.Random(3)
    a_rows = [(rng.randrange(20), i) for i in range(200)]
    b_rows = [(k, k * 10) for k in range(20)]
    a = spark.createDataFrame(a_rows, "k long, av long")
    b = spark.createDataFrame(b_rows, "k long, bv long")
    full = sorted(
        (r.k, r.av, r.bv) for r in a.join(b, "k").collect()
    )
    for seed in (1, 2, 3):
        r2 = random.Random(seed)
        amask = [r2.random() < 0.3 for _ in a_rows]
        bmask = [r2.random() < 0.3 for _ in b_rows]
        a_old = spark.createDataFrame(
            [r for r, m in zip(a_rows, amask) if not m], "k long, av long"
        )
        d_a = spark.createDataFrame(
            [r for r, m in zip(a_rows, amask) if m], "k long, av long"
        )
        b_old = spark.createDataFrame(
            [r for r, m in zip(b_rows, bmask) if not m], "k long, bv long"
        )
        d_b = spark.createDataFrame(
            [r for r, m in zip(b_rows, bmask) if m], "k long, bv long"
        )
        v = a_old.join(b_old, "k").unionByName(
            delta_join(a_old, d_a, b_old, d_b, on=["k"])
        )
        got = sorted((r.k, r.av, r.bv) for r in v.collect())
        assert got == full, f"delta rule broke at seed {seed}"


def test_retract_merge_drops_vanished_groups(spark):
    from pyspark.sql import functions as F

    from scio_db_spark.operators.incremental import (
        agg_state,
        retract_merge,
    )

    base = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5)], "k string, v long"
    )
    state = agg_state(
        base, key_cols=["k"], sum_cols={"s": F.col("v")}, count_col="n"
    )
    # delete BOTH 'a' rows, add one 'c'
    retr = agg_state(
        spark.createDataFrame([("a", 10), ("a", 20)], "k string, v long"),
        key_cols=["k"], sum_cols={"s": F.col("v")}, count_col="n",
    )
    adds = agg_state(
        spark.createDataFrame([("c", 7)], "k string, v long"),
        key_cols=["k"], sum_cols={"s": F.col("v")}, count_col="n",
    )
    got = {
        r.k: (r.n, r.s)
        for r in retract_merge(
            state, retr, adds, key_cols=["k"], measure_cols=["s"]
        ).collect()
    }
    assert got == {"b": (1, 5), "c": (1, 7)}  # 'a' vanished entirely


def test_retract_merge_refuses_overdelete(spark):
    import pytest
    from pyspark.sql import functions as F

    from scio_db_spark.operators.incremental import (
        agg_state,
        retract_merge,
    )

    mk = lambda rows: agg_state(
        spark.createDataFrame(rows, "k string, v long"),
        key_cols=["k"], sum_cols={"s": F.col("v")}, count_col="n",
    )
    state = mk([("a", 1)])
    retr = mk([("a", 1), ("a", 1)])  # retracts 2 rows from a 1-row group
    adds = mk([("b", 1)])
    with pytest.raises(Exception, match="negative group count"):
        retract_merge(
            state, retr, adds, key_cols=["k"], measure_cols=["s"]
        ).collect()


def test_holt_forecast_matches_python_fold(spark, sf_dir):
    """Third derivation: re-fold each type's day-ordered series in
    plain Python and compare level/trend bit-for-bit (both engines'
    folds already hash-match each other; this pins them to the
    textbook recurrence rather than a shared mistake)."""
    from pyspark.sql import functions as F

    from scio_db_spark.plans.catalog import table
    from scio_db_spark.plans.registry import all_queries

    got = {
        r.event_type: (r.n_days, r.level, r.trend, r.forecast_next)
        for r in all_queries()["events_type_holt_forecast"]
        .spark(spark, sf_dir)
        .collect()
    }
    d = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in d:
        series.setdefault(r.event_type, []).append((r.day, r.x))
    for et, pairs in series.items():
        xs = [x for _, x in sorted(pairs)]
        lvl, tr = xs[0], 0.0
        for v in xs[1:]:
            nl = v * 0.25 + (lvl + tr) * 0.75
            tr = (nl - lvl) * 0.5 + tr * 0.5
            lvl = nl
        assert got[et] == (len(xs), lvl, tr, lvl + tr), et


def test_holt_single_day_series(spark):
    """One observation: level = x, trend = 0, forecast = x (the
    slice-from-2 edge the greatest() guard exists for)."""
    import datetime

    from pyspark.sql import Row

    from scio_db_spark.plans import temporal as T

    # drive the registered builder on a tiny in-memory stand-in table
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [Row(event_type="only", ts=datetime.datetime(2024, 1, 1), n=1)]
    )
    d = df.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    s = d.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "x"))),
            lambda r: r["x"],
        ).alias("xs")
    )
    holt = F.aggregate(
        F.expr("slice(xs, 2, greatest(size(xs) - 1, 0))"),
        F.struct(F.element_at("xs", 1).alias("l"), F.lit(0.0).alias("t")),
        lambda acc, x: F.struct(
            (x * F.lit(0.25) + (acc["l"] + acc["t"]) * F.lit(0.75)).alias(
                "l"
            ),
            (
                (
                    x * F.lit(0.25)
                    + (acc["l"] + acc["t"]) * F.lit(0.75)
                    - acc["l"]
                )
                * F.lit(0.5)
                + acc["t"] * F.lit(0.5)
            ).alias("t"),
        ),
    )
    r = s.select(holt.alias("h")).collect()[0].h
    assert (r.l, r.t) == (1.0, 0.0)


def test_changepoint_finds_planted_shift(spark):
    """Plant a clean level shift in a synthetic daily series: the
    census must split exactly at the jump (and the exact-integer
    fraction must dominate every other split)."""
    import datetime

    from pyspark.sql import functions as F

    rows = []
    eid = 0
    for day in range(20):
        # 2 events/day for 10 days, then 10/day: split at day index 9
        n = 2 if day < 10 else 10
        for _ in range(n):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1 + day), 7, "shift",
                 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from scio_db_spark.plans import temporal as T

    # patch the name the builder actually resolves: temporal.py binds
    # `table` at module import, so patching catalog.table is a no-op
    # once the module is loaded
    orig = T.table
    try:
        T.table = lambda spark_, sf_, name: (
            df if name == "events" else orig(spark_, sf_, name)
        )
        out = T.events_type_changepoint(spark, "/unused").collect()
    finally:
        T.table = orig
    assert len(out) == 1
    r = out[0]
    assert r.split_day == "2024-01-10"  # last low day
    assert (r.n_pre, r.n_post) == (10, 10)
    assert r.pre_mean_micro == 2_000_000
    assert r.post_mean_micro == 10_000_000


def test_multitouch_credit_conservation(spark, sf_dir):
    """Every purchase splits EXACTLY 1e6 micro-credits (remainder to
    the closest touch; touch-less purchases carry full credit on the
    'none' row): total credit == 1e6 * n_purchases, to the unit."""
    from pyspark.sql import functions as F

    from scio_db_spark.plans.catalog import table
    from scio_db_spark.plans.registry import all_queries

    rows = (
        all_queries()["events_multitouch_attribution"]
        .spark(spark, sf_dir)
        .collect()
    )
    total_credit = sum(r.credit_micro for r in rows)
    n_purchases = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert total_credit == 1_000_000 * n_purchases


def test_changepoint_wide_integer_score_exact(spark):
    """score_num = (S1*n2 - S2*n1)^2 past int64: fabricated day
    counts of ~1e15 push the square to ~1e33 — the pre-round-10 long
    arithmetic wrapped silently (non-ANSI Spark) while DuckDB's
    HUGEINT stayed exact, a silent engine divergence at exactly the
    100 TB scale the docstring advertises (round-9 ADVICE). The
    DECIMAL(38,0) tree must reproduce exact Python ints."""
    import datetime

    from scio_db_spark.plans.temporal import changepoint_score

    # ~1e11 events/day: micro-means stay in int64 (both engines
    # report them as BIGINT) while the squared term is ~1e24 — past
    # int64, inside the DECIMAL(38,0)/HUGEINT envelope
    xs = [10**11, 2 * 10**11, 9 * 10**11, 10**11]
    d = spark.createDataFrame(
        [
            ("big", datetime.date(2024, 1, 1 + i), x)
            for i, x in enumerate(xs)
        ],
        "event_type string, dy date, x long",
    )
    out = changepoint_score(d).collect()
    assert len(out) == 1
    r = out[0]
    # exact Python recompute of the argmax and its reported fraction
    n, s = len(xs), sum(xs)
    best = None
    for k in range(1, n):
        s1, n1 = sum(xs[:k]), k
        s2, n2 = s - sum(xs[:k]), n - k
        num = (s1 * n2 - s2 * n1) ** 2
        den = n1 * n2 * n
        key = (num / den, -k)  # earliest-day tie-break
        if best is None or key > best[0]:
            best = (key, k, num, den, s1, s2, n1, n2)
    _, k, num, den, s1, s2, n1, n2 = best
    assert num > 2**63  # the regression premise: int64 overflows
    assert r.split_day == f"2024-01-{k:02d}"
    assert int(r.score_num) == num
    assert r.score_den == den
    assert r.pre_mean_micro == (s1 * 1_000_000) // n1
    assert r.post_mean_micro == (s2 * 1_000_000) // n2
