"""As-of join and bucketed range join: semantics pinned on handmade
fixtures (inclusive bound, ties, no-match nulls, boundary exclusivity)
and the plan invariant that makes them 100 TB operators — a hash
equi-join shape, never Catalyst's nested-loop fallback for range
predicates."""

import datetime

from pyspark.sql import functions as F

from ontology_loader_spark.operators.events import (
    asof_join,
    range_join_window_counts,
)

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, sec, user, etype, value=1.0):
    return (eid, T0 + datetime.timedelta(seconds=sec), user, etype, value, "{}")

EVENT_DDL = ("event_id long, ts timestamp_ntz, user_id long, "
             "event_type string, value double, props string")


def test_asof_join_semantics(spark):
    events = spark.createDataFrame(
        [
            _ev(1, 0, 1, "view", 10.0),
            _ev(2, 60, 1, "view", 20.0),
            _ev(3, 60, 1, "click"),       # tie with view 2 -> inclusive
            _ev(4, 90, 1, "click"),       # latest view = 2
            _ev(5, 30, 2, "click"),       # user 2 has no view -> NULL
            # two views at the SAME (user, ts): max event_id must win
            _ev(6, 10, 3, "view", 1.0),
            _ev(7, 10, 3, "view", 2.0),
            _ev(8, 40, 3, "click"),
        ],
        EVENT_DDL,
    )
    got = {r["l_event_id"]: (r["r_event_id"], r["r_value"])
           for r in asof_join(events).collect()}
    assert got[3] == (2, 20.0)      # inclusive: ts == ts matches
    assert got[4] == (2, 20.0)
    assert got[5] == (None, None)   # left semantics
    assert got[8] == (7, 2.0)       # same-ts dedup keeps max event_id


def test_range_join_counts_and_boundaries(spark):
    win_sec = 30 * 60
    events = spark.createDataFrame(
        [
            _ev(1, 1000, 1, "error"),
            _ev(2, 1000, 1, "click", 1.5),          # t0 inclusive
            _ev(3, 1000 + win_sec - 1, 1, "click", 2.25),  # inside
            _ev(4, 1000 + win_sec, 1, "click", 4.0),       # t1 exclusive
            _ev(5, 999, 1, "click", 8.0),                  # before
            _ev(6, 1200, 2, "click", 16.0),                # other user
            _ev(7, 5000, 2, "error"),                      # zero matches
        ],
        EVENT_DDL,
    )
    got = {r["int_id"]: (r["n_probe_events"], r["sum_value_cents"])
           for r in range_join_window_counts(events).collect()}
    assert got[1] == (2, 150 + 225)
    assert got[7] == (0, 0)


def test_range_join_plans_as_hash_equi_join(spark):
    """The bucket decomposition must keep the range join out of
    Catalyst's nested-loop fallback: no BroadcastNestedLoopJoin or
    CartesianProduct anywhere in the physical plan."""
    events = spark.createDataFrame(
        [_ev(i, i * 17 % 7200, i % 5, t)
         for i in range(200) for t in ("error", "click")],
        EVENT_DDL,
    ).withColumn("event_id", F.monotonically_increasing_id())
    plan = (range_join_window_counts(events)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    # the naive range-predicate formulation DOES nested-loop — the
    # contrast that motivates the bucketed operator
    ints = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("int_id"), "user_id",
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t1"))
    probes = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    naive = ints.join(
        probes,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") >= F.col("t0")) & (F.col("p_ts") < F.col("t1")),
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    # equality on user gets hashed; Spark keeps it a hash join here —
    # but drop the user equality (pure range) and it nested-loops
    pure_range = ints.join(
        probes, (F.col("p_ts") >= F.col("t0")) & (F.col("p_ts") < F.col("t1"))
    )._jdf.queryExecution().executedPlan().toString()
    assert ("BroadcastNestedLoopJoin" in pure_range
            or "CartesianProduct" in pure_range)
    del naive_plan


def test_asof_and_range_join_partitioning_invariant(spark):
    """North-rule two-cluster-size criterion depends on results being
    identical at any parallelism: both operators must produce the same
    rows at 1 and 32 input partitions."""
    events = spark.createDataFrame(
        [_ev(i, (i * 37) % 7200, i % 9,
             ("view", "click", "error")[i % 3], float(i % 13))
         for i in range(600)],
        EVENT_DDL,
    )
    for op in (asof_join, range_join_window_counts):
        a = sorted(map(tuple, op(events.repartition(1)).collect()))
        b = sorted(map(tuple, op(events.repartition(32)).collect()))
        assert a == b and len(a) > 0


def test_funnel_strict_ordering(spark):
    """Stage k requires an event strictly after the user's earliest
    stage-(k-1) completion: same-timestamp events do not advance the
    funnel, and stage counts are monotone non-increasing."""
    from ontology_loader_spark.operators.events import funnel_stages

    events = spark.createDataFrame(
        [
            # user 1: full funnel in order
            _ev(1, 10, 1, "view"), _ev(2, 20, 1, "click"),
            _ev(3, 30, 1, "purchase"),
            # user 2: click BEFORE the first view -> stalls at view
            _ev(4, 50, 2, "click"), _ev(5, 60, 2, "view"),
            # user 3: click at the SAME ts as view -> strict, no advance
            _ev(6, 70, 3, "view"), _ev(7, 70, 3, "click"),
            # user 4: purchase without click -> stalls at view
            _ev(8, 80, 4, "view"), _ev(9, 90, 4, "purchase"),
            # user 5: never views
            _ev(10, 5, 5, "purchase"),
        ],
        EVENT_DDL,
    )
    got = {r["step"]: r["n_users"] for r in funnel_stages(events).collect()}
    assert got == {"view": 4, "click": 1, "purchase": 1}

    # user 2's later click would count if they viewed first; verify a
    # second click after the view advances them
    more = events.unionByName(spark.createDataFrame(
        [_ev(11, 65, 2, "click")], EVENT_DDL))
    got2 = {r["step"]: r["n_users"] for r in funnel_stages(more).collect()}
    assert got2["click"] == 2


def test_cohort_retention_fixture(spark):
    from ontology_loader_spark.operators.events import cohort_retention

    wk = 7 * 24 * 3600
    events = spark.createDataFrame(
        [
            _ev(1, 0, 1, "view"), _ev(2, wk + 5, 1, "view"),     # wk 0, 1
            _ev(3, 10, 2, "view"),                               # wk 0 only
            _ev(4, 2 * wk, 3, "view"), _ev(5, 3 * wk, 3, "view"),
            _ev(6, 2 * wk + 9, 3, "view"),                       # dup week
        ],
        EVENT_DDL,
    )
    got = {r["week_offset"]: r["n_users"]
           for r in cohort_retention(events).collect()}
    # offset 0: all 3 users; offset 1: users 1 and 3
    assert got == {0: 3, 1: 2}


# ------------------------------------------------------- winsorization


def test_winsorized_stats_discrete_cutoff(spark):
    """Type a: cents 1..10 -> p90 cutoff = 9 (least cents with cdf >=
    0.9), winsorized sum clips only the 10. Type b: constant values
    are their own cutoff."""
    from ontology_loader_spark.operators.events import winsorized_stats

    rows = [("a", i / 100.0) for i in range(1, 11)] + [("b", 0.05)] * 4
    ev = spark.createDataFrame(rows, "event_type string, value double")
    got = {
        r["event_type"]: (
            r["n_events"],
            r["sum_value_cents"],
            r["sum_winsorized_cents"],
            r["p_cutoff_cents"],
        )
        for r in winsorized_stats(ev).collect()
    }
    assert got["a"] == (10, 55, 54, 9)
    assert got["b"] == (4, 20, 20, 5)


def test_winsorized_stats_partitioning_invariant(spark):
    from ontology_loader_spark.operators.events import winsorized_stats

    rows = [(f"t{i % 3}", (i % 47) / 10.0) for i in range(500)]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    one = sorted(map(tuple, winsorized_stats(ev.coalesce(1)).collect()))
    many = sorted(map(tuple, winsorized_stats(ev.repartition(9)).collect()))
    assert one == many


# -------------------------------------------------- rolling actives


def test_rolling_active_users_window_semantics(spark):
    """u1 active day 0 and 3; u2 active day 0 only. WAU(d) counts
    users active in [d-6, d]; DAU counts that day only."""
    import datetime as dt

    from ontology_loader_spark.operators.events import rolling_active_users

    epoch = dt.datetime(1970, 1, 1)

    def ts(day, h=1):
        return epoch + dt.timedelta(days=day, hours=h)

    rows = [(1, ts(0)), (1, ts(0, 2)), (1, ts(3)), (2, ts(0))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["day_epoch"]: (r["dau"], r["wau"])
        for r in rolling_active_users(ev).collect()
    }
    # only days WITH activity are reported: day 0 and day 3
    assert got == {0: (2, 2), 3: (1, 2)}


def test_rolling_active_users_partitioning_invariant(spark):
    import datetime as dt

    from ontology_loader_spark.operators.events import rolling_active_users

    epoch = dt.datetime(1970, 1, 1)
    rows = [
        (i % 13, epoch + dt.timedelta(days=i % 19, minutes=i))
        for i in range(400)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    one = sorted(map(tuple, rolling_active_users(ev.coalesce(1)).collect()))
    many = sorted(map(tuple, rolling_active_users(ev.repartition(8)).collect()))
    assert one == many


# ---------------------------------------------------- props extract


def test_props_stats_parses_and_skips_malformed(spark):
    from ontology_loader_spark.operators.events import props_stats

    rows = [
        ("a", '{"k": 3}'), ("a", '{"k": 7}'), ("a", '{"other": 1}'),
        ("b", "not json"), ("b", '{"k": 10}'),
    ]
    ev = spark.createDataFrame(rows, "event_type string, props string")
    got = {
        r["event_type"]: (r["n_with_k"], r["sum_k"], r["min_k"], r["max_k"])
        for r in props_stats(ev).collect()
    }
    assert got["a"] == (2, 10, 3, 7)
    assert got["b"] == (1, 10, 10, 10)
