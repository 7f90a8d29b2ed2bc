"""Batch gap-based sessionization (operators/sessions.py)."""

from __future__ import annotations

import datetime as dt

from knowledge_graph_spark.operators.sessions import session_stats, sessionize_events


def _events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: three events inside one session, then a 31-min gap
        (0, base, 1, "view", 1.25, "{}"),
        (1, base + dt.timedelta(minutes=10), 1, "view", 2.50, "{}"),
        (2, base + dt.timedelta(minutes=40), 1, "purchase", 3.75, "{}"),
        (3, base + dt.timedelta(minutes=71, seconds=1), 1, "view", 4.00, "{}"),
        # user 2: single event
        (4, base, 2, "signup", 10.00, "{}"),
        # user 3: gap of exactly 30 min stays in-session (strict >)
        (5, base, 3, "view", 1.00, "{}"),
        (6, base + dt.timedelta(minutes=30), 3, "view", 1.00, "{}"),
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )


def test_session_boundaries(spark):
    sess = sessionize_events(_events(spark)).collect()
    by_event = {r.event_id: r for r in sess}
    assert by_event[0].session_id == by_event[1].session_id == by_event[2].session_id == "1-1"
    assert by_event[3].session_id == "1-2"  # 31m1s gap starts a new session
    assert by_event[4].session_id == "2-1"
    # exactly 30 min is NOT a break (strict >)
    assert by_event[5].session_id == by_event[6].session_id == "3-1"


def test_session_stats_values(spark):
    stats = {r.session_id: r for r in session_stats(_events(spark)).collect()}
    s = stats["1-1"]
    assert s.n_events == 3
    assert abs(s.total_value - 7.50) < 1e-12  # decimal-exact sum
    assert s.duration_us == 40 * 60 * 1_000_000
    assert stats["2-1"].n_events == 1 and stats["2-1"].duration_us == 0
    assert stats["3-1"].n_events == 2


def test_single_shuffle_plan(spark):
    """Both windows share partitioning+ordering: the plan must contain
    exactly one Exchange (hash on user_id) before the aggregation."""
    plan = session_stats(_events(spark))._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    # one for the window sort; the groupBy(user_id, session_id) partial agg
    # may add one more — anything beyond that means the windows stopped
    # sharing their sort
    assert n_exchanges <= 2, plan


def test_session_window_boundary_and_sliding(spark):
    """F.session_window semantics at the exact-gap boundary (MERGES —
    measured, not assumed; the oracle mirrors this with the same `>`
    convention as session_stats) and sliding-window multiplicity."""
    from pyspark.sql import functions as F

    from knowledge_graph_spark.operators.temporal import (
        session_rollup,
        sliding_rollup,
    )

    base = 1_700_000_000
    rows = [
        ("u1", 1, base, 1.0),          # session A
        ("u1", 2, base + 100, 2.0),    # merges (gap 100s < 1800s)
        ("u1", 3, base + 100 + 1800, 4.0),  # EXACTLY gap later -> still merges
        ("u1", 5, base + 100 + 1800 + 1801, 16.0),  # gap exceeded -> new
        ("u2", 4, base, 8.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id string, event_id long, sec long, value double"
    ).select("user_id", "event_id", F.timestamp_seconds("sec").alias("ts"), "value")

    sess = {
        (r.user_id, r.start_us): (r.n_events, r.end_us, r.total_value)
        for r in session_rollup(ev, "30 minutes").collect()
    }
    b_us = base * 1_000_000
    assert sess == {
        ("u1", b_us): (3, (base + 1900 + 1800) * 1_000_000, 7.0),
        ("u1", (base + 3701) * 1_000_000): (1, (base + 3701 + 1800) * 1_000_000, 16.0),
        ("u2", b_us): (1, (base + 1800) * 1_000_000, 8.0),
    }

    # sliding 1h/30m: every event appears in exactly two windows
    slid = sliding_rollup(ev, "1 hour", "30 minutes", dims=["user_id"]).collect()
    assert sum(r.n_events for r in slid) == 2 * len(rows)


def test_interval_overlaps_exact_and_no_nested_loop(spark):
    """Bucket-explode overlap join: hand-computed counts (including an
    endpoint-touching pair — inclusive) and the plan must contain NO
    nested-loop/cartesian join (the trap a raw range predicate plans)."""
    from knowledge_graph_spark.operators.temporal import interval_overlaps

    M = 1_000_000
    rows = [  # (user, session, start_s, end_s)
        ("u1", "u1-1", 0, 100),
        ("u2", "u2-1", 50, 150),     # overlaps u1-1, u3-1
        ("u3", "u3-1", 150, 200),    # touches u2-1 endpoint (inclusive)
        ("u1", "u1-2", 400, 500),    # overlaps nothing
        ("u2", "u2-2", 90, 95),      # inside u1-1
    ]
    iv = spark.createDataFrame(
        [(u, s, a * M, b * M) for u, s, a, b in rows],
        "user_id string, session_id string, start_us long, end_us long",
    )
    got = {r.session_id: r.n_concurrent for r in interval_overlaps(iv).collect()}
    assert got == {"u1-1": 2, "u2-1": 2, "u3-1": 1, "u1-2": 0, "u2-2": 1}
    p = interval_overlaps(iv)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
