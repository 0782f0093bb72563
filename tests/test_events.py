"""Event-stream operator semantics on hand-built rows + testdata sanity."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rustserini_spark.operators.events import (
    event_props_stats,
    sessionize,
    windowed_event_stats,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1: two sessions split by a 45-min gap (gap_seconds=1800)
        (0, _ts(0), 1, "click", 1.0, '{"k": 10}'),
        (1, _ts(10), 1, "view", 2.0, '{"k": 20}'),
        (2, _ts(55), 1, "click", 3.0, '{"other": 1}'),
        # user 2: one single-event session, in the second hour
        (3, _ts(90), 2, "error", 4.0, '{"k": -5}'),
        # same-timestamp tie for user 3: one session, deterministic order
        (4, _ts(30), 3, "view", 5.0, "{}"),
        (5, _ts(30), 3, "view", 6.0, '{"k": 7}'),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    )


def test_windowed_event_stats_epoch_aligned(ev):
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_stats(ev, window_seconds=3600).collect()
    }
    h0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert got[(h0, "click")] == (2, 4.0)      # minutes 0 and 55
    assert got[(h0, "view")] == (3, 13.0)      # minutes 10, 30, 30
    assert got[(h0 + 3600, "error")] == (1, 4.0)  # minute 90 -> next window
    assert len(got) == 3


def test_sessionize_gap_split(ev):
    rows = sessionize(ev, gap_seconds=1800).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r.session_start_us)
    assert len(u1) == 2                      # 45-min gap splits the session
    assert (u1[0].n_events, u1[0].duration_s) == (2, 600.0)
    assert (u1[1].n_events, u1[1].duration_s) == (1, 0.0)
    assert by_user[2][0].n_events == 1
    assert len(by_user[3]) == 1 and by_user[3][0].n_events == 2  # tie stays one session


def test_event_props_stats_extraction(ev):
    got = {r.event_type: (r.n_with_key, r.avg_val, r.max_val)
           for r in event_props_stats(ev, key="k").collect()}
    assert got["click"] == (1, 10.0, 10)     # second click has no "k"
    assert got["view"] == (2, 13.5, 20)      # 20 and 7
    assert got["error"] == (1, -5.0, -5)     # negative value extracted


def test_event_props_stats_int64_overflow_parity(spark):
    """Digit runs wider than int64 take their longest 18-digit prefix (the
    {1,18} bound) on BOTH engines instead of diverging: Spark would NULL an
    unbounded cast while DuckDB raises. 23 nines -> 18 nines extracted."""
    rows = [
        (0, T0, 1, "a", 1.0, '{"k": 12}'),
        (1, T0, 1, "a", 1.0, '{"k": ' + "9" * 23 + "}"),
        (2, T0, 1, "a", 1.0, '{"k": -' + "8" * 30 + "}"),
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    )
    r = event_props_stats(ev, key="k").collect()[0]
    assert r.n_with_key == 3  # no row silently dropped
    assert r.max_val == int("9" * 18)


def test_events_testdata_consistency(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sessions = sessionize(ev)
    # every event lands in exactly one session
    assert sessions.agg(F.sum("n_events")).first()[0] == ev.count()
    windows = windowed_event_stats(ev)
    assert windows.agg(F.sum("n_events")).first()[0] == ev.count()
    # window starts are hour-aligned epochs
    assert windows.filter(F.col("window_start") % 3600 != 0).count() == 0
