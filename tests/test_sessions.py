"""Gap-based sessionization + clickstream transitions vs hand-computed
session boundaries (operators/sessions.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hadoop_search_engine_spark.operators.sessions import (
    event_transitions,
    session_stats,
    sessionize,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _events(spark):
    rows = [
        # user 1: 3 events in one session, then a 31-min gap -> new one
        (0, T0, 1, "view", 1.0),
        (1, T0 + timedelta(minutes=5), 1, "click", 2.0),
        (2, T0 + timedelta(minutes=10), 1, "buy", 3.0),
        (3, T0 + timedelta(minutes=41), 1, "view", 4.0),
        # user 2: exactly-30-min gap stays ONE session (> gap, not >=)
        (4, T0, 2, "view", 5.0),
        (5, T0 + timedelta(minutes=30), 2, "click", 6.0),
        # user 3: single event
        (6, T0, 3, "error", 7.0),
        # same-timestamp tie: event_id breaks the order
        (7, T0 + timedelta(hours=2), 2, "view", 1.0),
        (8, T0 + timedelta(hours=2), 2, "click", 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


def test_sessionize_boundaries(spark):
    s = {r["event_id"]: r for r in sessionize(_events(spark), 30.0).collect()}
    assert [s[i]["session_idx"] for i in range(4)] == [0, 0, 0, 1]
    assert s[3]["is_session_start"]
    assert s[4]["session_idx"] == 0 and s[5]["session_idx"] == 0  # ==gap
    assert s[7]["session_idx"] == 1 and s[8]["session_idx"] == 1
    assert s[6]["session_idx"] == 0

    import pytest as _pytest
    with _pytest.raises(ValueError, match="gap"):
        sessionize(_events(spark), 0)


def test_session_stats_rollup(spark):
    st = {(r["user_id"], r["session_idx"]): r
          for r in session_stats(_events(spark), 30.0).collect()}
    assert st[(1, 0)]["n_events"] == 3
    assert st[(1, 0)]["value_sum"] == 6.0
    assert st[(1, 0)]["duration_sec"] == 600.0
    assert st[(1, 1)]["n_events"] == 1 and st[(1, 1)]["duration_sec"] == 0.0
    assert st[(2, 0)]["duration_sec"] == 1800.0
    assert len(st) == 5


def test_event_transitions_reset_at_session(spark):
    tr = {(r["prev_type"], r["next_type"]): r["n"]
          for r in event_transitions(_events(spark), gap_minutes=30.0)
          .collect()}
    # user1 session0: view->click->buy; user2 s0: view->click;
    # user2 s1: view->click; session breaks contribute nothing
    assert tr == {("view", "click"): 3, ("click", "buy"): 1}
    # without the reset, the cross-session pairs appear
    tr2 = {(r["prev_type"], r["next_type"]): r["n"]
           for r in event_transitions(_events(spark),
                                      within_session=False).collect()}
    assert tr2[("buy", "view")] == 1          # user1 across the gap
    assert tr2[("click", "view")] == 1        # user2 across the gap
