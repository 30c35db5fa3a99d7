"""As-of join operator semantics (hand-built frames)."""

import datetime as dt


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward_semantics(spark):
    from metasra_pipeline_spark.functions.asof import asof_join

    left = spark.createDataFrame([
        (1, 10, _ts("2024-01-01T00:00:05")),   # after v1, before v2
        (2, 10, _ts("2024-01-01T00:00:10")),   # exactly at v2 -> tie matches
        (3, 10, _ts("2024-01-01T00:00:00")),   # before any view -> null
        (4, 20, _ts("2024-01-01T00:00:01")),   # user with no views -> null
    ], "event_id: bigint, user_id: bigint, ts: timestamp")
    right = spark.createDataFrame([
        (10, _ts("2024-01-01T00:00:02"), 101),   # v1
        (10, _ts("2024-01-01T00:00:10"), 102),   # v2
    ], "user_id: bigint, ts: timestamp, view_event_id: bigint")

    out = {r["event_id"]: (r["view_event_id"], r["asof_gap_us"])
           for r in asof_join(left, right, on="user_id", ts="ts",
                              payload=["view_event_id"]).collect()}
    assert out[1] == (101, 3_000_000)
    assert out[2] == (102, 0)          # equal-ts tie matches
    assert out[3] == (None, None)
    assert out[4] == (None, None)
    assert len(out) == 4               # every left row survives


def test_asof_join_tolerance_and_ts_dedup(spark):
    from metasra_pipeline_spark.functions.asof import asof_join

    left = spark.createDataFrame([
        (1, 1, _ts("2024-01-01T00:01:00")),
    ], "event_id: bigint, user_id: bigint, ts: timestamp")
    # two right rows at the SAME (user, ts): deterministic winner is the
    # largest payload struct (view_event_id 202), layout-independent
    right = spark.createDataFrame([
        (1, _ts("2024-01-01T00:00:00"), 201),
        (1, _ts("2024-01-01T00:00:00"), 202),
    ], "user_id: bigint, ts: timestamp, view_event_id: bigint")

    got = asof_join(left, right, on="user_id", ts="ts",
                    payload=["view_event_id"]).collect()[0]
    assert got["view_event_id"] == 202
    assert got["asof_gap_us"] == 60_000_000

    # 60s gap > 30s tolerance -> nulled out
    tol = asof_join(left, right, on="user_id", ts="ts",
                    payload=["view_event_id"],
                    tolerance_us=30_000_000).collect()[0]
    assert tol["view_event_id"] is None and tol["asof_gap_us"] is None
