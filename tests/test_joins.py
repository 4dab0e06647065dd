"""as_of_join / time_window_pairs semantics."""

import datetime as dt

from pyspark.sql import functions as F


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_as_of_join_backward_inclusive(spark):
    from outliertree_spark.operators.joins import as_of_join

    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00")),
         (2, 10, _ts("2024-01-01 10:05:00")),
         (3, 20, _ts("2024-01-01 09:00:00")),   # no prior right row
         (4, 30, _ts("2024-01-01 12:00:00"))],  # key absent on right
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 10:00:00"), "a"),   # equal ts: counts (incl.)
         (10, _ts("2024-01-01 10:03:00"), "b"),
         (10, _ts("2024-01-01 10:09:00"), "c"),   # after both lefts
         (20, _ts("2024-01-01 09:30:00"), "d")],  # after left row 3
        "user_id long, ts timestamp, tag string")
    out = {r.event_id: r for r in
           as_of_join(left, right, "user_id", "ts", "ts").collect()}
    assert out[1].tag == "a" and out[1].ts_right == _ts("2024-01-01 10:00:00")
    assert out[2].tag == "b"
    assert out[3].tag is None and out[3].ts_right is None
    assert out[4].tag is None
    # left columns untouched
    assert out[2].ts == _ts("2024-01-01 10:05:00")


def test_time_window_pairs(spark):
    from outliertree_spark.operators.joins import time_window_pairs

    df = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00")),
         (2, 10, _ts("2024-01-01 10:00:30")),
         (3, 10, _ts("2024-01-01 10:01:00")),
         (4, 10, _ts("2024-01-01 10:10:00")),
         (5, 20, _ts("2024-01-01 10:00:10"))],
        "event_id long, user_id long, ts timestamp")
    pairs = time_window_pairs(df, "user_id", "ts", 60, id_col="event_id")
    got = {(r.event_id_a, r.event_id_b) for r in pairs.collect()}
    # 1-2 (30s), 1-3 (60s inclusive), 2-3 (30s); 4 is isolated; 5 other key
    assert got == {(1, 2), (1, 3), (2, 3)}
