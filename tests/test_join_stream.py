"""Watermarked stream-stream attribution join (streaming/join_stream.py):
the drained streaming result must equal the batch join with the same
predicate, including the window edges (a purchase exactly window_days
after the signup matches; one second later does not)."""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_spark.streaming.join_stream import (
    PURCHASE_DDL,
    SIGNUP_DDL,
    attribution_join,
    run_attribution_stream,
)

DAY = 86_400
BASE = 1_700_000_000

# (signup_id, user, ts_sec)
SIGNUPS = [
    (1, 10, BASE),
    (2, 10, BASE + 10 * DAY),   # second signup of the same user
    (3, 20, BASE),
]
# (event_id, user, ts_sec, value): edges — exactly +7d matches, +7d+1s not
PURCHASES = [
    (100, 10, BASE + 1, 5.0),            # -> signup 1
    (101, 10, BASE + 7 * DAY, 6.0),      # -> signup 1 (exact edge)
    (102, 10, BASE + 7 * DAY + 1, 7.0),  # -> nothing (past window; signup 2 later)
    (103, 10, BASE + 11 * DAY, 8.0),     # -> signup 2
    (104, 20, BASE + 3 * DAY, 9.0),      # -> signup 3
    (105, 30, BASE, 1.0),                # user never signed up
]


def _frames(spark):
    p = spark.createDataFrame(
        [(e, u, t, v) for e, u, t, v in PURCHASES],
        "event_id long, user_id long, sec long, value double",
    ).select("event_id", "user_id", F.timestamp_seconds("sec").alias("ts"), "value")
    s = spark.createDataFrame(
        SIGNUPS, "signup_id long, user_id long, sec long"
    ).select("signup_id", "user_id", F.timestamp_seconds("sec").alias("ts"))
    return p, s


def _key_set(rows):
    return {(r.event_id, r.signup_id) for r in rows}


def test_batch_join_semantics(spark):
    p, s = _frames(spark)
    got = _key_set(attribution_join(p, s).collect())
    assert got == {(100, 1), (101, 1), (103, 2), (104, 3)}


@pytest.mark.filterwarnings("ignore")
def test_stream_join_equals_batch(spark, tmp_path):
    p, s = _frames(spark)
    pdir, sdir = str(tmp_path / "p_in"), str(tmp_path / "s_in")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    p.coalesce(1).write.parquet(pdir)
    s.coalesce(1).write.parquet(sdir)
    run_attribution_stream(spark, pdir, sdir, out, ckpt)
    streamed = spark.read.parquet(out)
    assert _key_set(streamed.collect()) == _key_set(attribution_join(p, s).collect())
    # full row equality, not just keys
    b = attribution_join(p, s)
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, b.collect()))
