"""Cohort retention, ordered funnels, and trailing-z-score anomaly
flags — python-reference parity on synthetic event streams."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators.analytics import bucket_anomalies
from hadoop_search_engine_spark.operators.sessions import (
    cohort_retention,
    funnel_counts,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, t, u, e, 0.0) for i, (u, t, e) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


def test_cohort_retention_matches_python(spark):
    d = dt.datetime
    rows = [
        # cohort A (week of Mon 2024-03-04): users 1, 2
        (1, d(2024, 3, 5), "view"),
        (2, d(2024, 3, 6), "view"),
        (1, d(2024, 3, 12), "view"),     # week 1: only user 1 back
        (1, d(2024, 3, 26), "view"),     # week 3
        # cohort B (week of 2024-03-11): user 3
        (3, d(2024, 3, 13), "view"),
        (3, d(2024, 3, 20), "view"),     # week 1
    ]
    got = {
        (r["cohort"].date(), r["period_n"]): (r["n_active"],
                                              r["retention"])
        for r in cohort_retention(_ev(spark, rows), "week").collect()
    }
    a, b = dt.date(2024, 3, 4), dt.date(2024, 3, 11)
    assert got == {
        (a, 0): (2, 1.0),
        (a, 1): (1, 0.5),
        (a, 3): (1, 0.5),
        (b, 0): (1, 1.0),
        (b, 1): (1, 1.0),
    }
    with pytest.raises(ValueError, match="period"):
        cohort_retention(_ev(spark, rows), "decade")


def test_funnel_counts_first_touch_ordering(spark):
    d = dt.datetime
    rows = [
        # user 1: full ordered funnel
        (1, d(2024, 1, 1), "signup"),
        (1, d(2024, 1, 2), "click"),
        (1, d(2024, 1, 3), "purchase"),
        # user 2: signup then click, no purchase
        (2, d(2024, 1, 1), "signup"),
        (2, d(2024, 1, 5), "click"),
        # user 3: clicked BEFORE signing up (first-touch order fails)
        (3, d(2024, 1, 2), "click"),
        (3, d(2024, 1, 3), "signup"),
        # user 4: purchase only (skips earlier steps entirely)
        (4, d(2024, 1, 1), "purchase"),
    ]
    got = {
        r["step"]: (r["step_idx"], r["n_users"])
        for r in funnel_counts(
            _ev(spark, rows), ["signup", "click", "purchase"]).collect()
    }
    assert got == {"signup": (0, 3), "click": (1, 2), "purchase": (2, 1)}
    # single-step funnel = distinct users with the event
    one = funnel_counts(_ev(spark, rows), ["click"]).collect()
    assert one[0]["n_users"] == 3
    with pytest.raises(ValueError, match="steps"):
        funnel_counts(_ev(spark, rows), [])


def test_bucket_anomalies_flags_spike_only(spark):
    vals = [10.0, 11.0, 9.0, 10.0, 12.0, 11.0, 10.0, 100.0, 10.0]
    b = spark.createDataFrame(
        [(float(i), v) for i, v in enumerate(vals)],
        "bucket double, v double",
    )
    rows = {r["bucket"]: r for r in
            bucket_anomalies(b, "v", window=5, z=3.0).collect()}
    assert rows[7.0]["is_anomaly"] is True          # the spike
    assert not rows[0.0]["is_anomaly"]              # no history
    assert not rows[1.0]["is_anomaly"]              # 1 trailing value
    for i in (2.0, 3.0, 4.0, 5.0, 6.0):
        assert not rows[i]["is_anomaly"]
    # the bucket after the spike: trailing window CONTAINS the spike,
    # so its stddev is huge and the normal value is not flagged
    assert not rows[8.0]["is_anomaly"]
    # python replay of one row's trailing stats
    import statistics

    trail = vals[2:7]
    assert rows[7.0]["trail_mean"] == round(sum(trail) / 5, 6)
    assert rows[7.0]["trail_std"] == round(
        statistics.pstdev(trail), 6)
    with pytest.raises(ValueError, match="window"):
        bucket_anomalies(b, "v", window=1)
