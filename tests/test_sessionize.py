"""Gap sessionization (datapipe.sessionize) — hand oracle, boundary
inclusivity, tie ordering, partitioning invariance."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from prase_spark.datapipe.sessionize import sessionize


def _ts(s):
    return datetime(2024, 1, 1) + timedelta(seconds=s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: events at 0s, 10s (same session), 100s (gap 90 > 60 ->
        # new), 160s (gap exactly 60 -> SAME session)
        (1, 1, _ts(0)),
        (2, 1, _ts(10)),
        (3, 1, _ts(100)),
        (4, 1, _ts(160)),
        # user 2: single event
        (5, 2, _ts(30)),
        # user 3: two events with identical ts (tie broken by event_id)
        (6, 3, _ts(5)),
        (7, 3, _ts(5)),
    ]
    return spark.createDataFrame(rows, "event_id LONG, user_id LONG, ts TIMESTAMP")


def _key(df):
    return {
        (r["user_id"], r["session_seq"]): (
            r["n_events"],
            r["duration_us"],
        )
        for r in df.collect()
    }


def test_sessions_hand_oracle(events):
    out = _key(sessionize(events, gap_seconds=60))
    assert out == {
        (1, 1): (2, 10_000_000),
        (1, 2): (2, 60_000_000),  # 100s..160s, exact gap continues
        (2, 1): (1, 0),
        (3, 1): (2, 0),
    }


def test_gap_strictness(events):
    # gap 59: the 160s event is 60 > 59 after 100s -> its own session
    out = _key(sessionize(events, gap_seconds=59))
    assert out[(1, 2)] == (1, 0) and out[(1, 3)] == (1, 0)


def test_partitioning_invariance(events):
    a = sorted(map(tuple, sessionize(events, gap_seconds=60).collect()))
    b = sorted(
        map(tuple, sessionize(events.repartition(5), gap_seconds=60).collect())
    )
    assert a == b


def test_start_end_us(events):
    rows = {
        (r["user_id"], r["session_seq"]): (r["start_us"], r["end_us"])
        for r in sessionize(events, gap_seconds=60).collect()
    }
    s, e = rows[(1, 2)]
    assert e - s == 60_000_000
