"""Continuous-aggregate rollups: create / incremental refresh /
range queries answered from the materialized table — identity with
aggregating the raw events is the contract, plus the partition-pruned
read and the mergeable-refresh equivalence (refresh == one-shot
rebuild over the union)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators.rollup import (
    create_rollup,
    refresh_rollup,
    rollup_range,
    rollup_table,
)

METRICS = {
    "n_events": ("count", "*"),
    "value_sum": ("sum", "value"),
    "value_max": ("max", "value"),
}


@pytest.fixture(scope="module")
def events(spark):
    base = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
    rows = []
    for i in range(5000):
        ts = base + dt.timedelta(minutes=7 * i)   # ~24 days span
        rows.append((i, ts.replace(tzinfo=None),
                     ["click", "view", "error"][i % 3],
                     float(i % 97)))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, "
              "value double"
    ).persist()
    df.count()
    return df


def _raw(events, lo=None, hi=None, by_type=False, period="hour"):
    t = events
    if lo:
        t = t.where(F.col("ts") >= F.to_timestamp(F.lit(lo)))
    if hi:
        t = t.where(F.col("ts") < F.to_timestamp(F.lit(hi)))
    keys = [F.date_trunc(period, "ts").alias("bucket")]
    if by_type:
        keys.append(F.col("event_type"))
    return {
        ((r["bucket"], r["event_type"]) if by_type else r["bucket"]):
        (r["n_events"], r["value_sum"], r["value_max"])
        for r in t.groupBy(*keys).agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("value_sum"),
            F.max("value").alias("value_max"),
        ).collect()
    }


def test_rollup_range_matches_raw(spark, events, tmp_path):
    out = str(tmp_path / "ru")
    create_rollup(events, out, period="hour", dims=("event_type",),
                  metrics=METRICS)
    lo, hi = "2024-03-05 00:00:00", "2024-03-12 00:00:00"
    got = {
        (r["bucket"], r["event_type"]):
        (r["n_events"], r["value_sum"], r["value_max"])
        for r in rollup_range(spark, out, lo, hi,
                              ("bucket", "event_type")).collect()
    }
    assert got == _raw(events, lo, hi, by_type=True)
    # rolled further up: time axis only, dims summed away
    got_b = {
        r["bucket"]: (r["n_events"], r["value_sum"], r["value_max"])
        for r in rollup_range(spark, out, lo, hi, ("bucket",)).collect()
    }
    assert got_b == _raw(events, lo, hi)
    # one-row total over an open-ended range
    tot = rollup_range(spark, out, lo, None).collect()[0]
    want_n = events.where(
        F.col("ts") >= F.to_timestamp(F.lit(lo))).count()
    assert tot["n_events"] == want_n
    with pytest.raises(ValueError, match="group_dims"):
        rollup_range(spark, out, lo, hi, ("nope",))


def test_rollup_read_is_partition_pruned(spark, events, tmp_path):
    import io
    from contextlib import redirect_stdout

    out = str(tmp_path / "rup")
    create_rollup(events, out, period="hour", metrics=METRICS)
    q = rollup_range(spark, out, "2024-03-05 00:00:00",
                     "2024-03-07 00:00:00", ("bucket",))
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "p_date" in plan


def test_refresh_equals_one_shot_rebuild(spark, events, tmp_path):
    cut = "2024-03-18 00:00:00"
    old = events.where(F.col("ts") < F.to_timestamp(F.lit(cut)))
    new = events.where(F.col("ts") >= F.to_timestamp(F.lit(cut)))
    assert old.count() > 0 and new.count() > 0

    inc = str(tmp_path / "inc")
    create_rollup(old, inc, period="hour", dims=("event_type",),
                  metrics=METRICS)
    n_parts = refresh_rollup(spark, new, inc)
    assert n_parts >= 1

    full = str(tmp_path / "full")
    create_rollup(events, full, period="hour", dims=("event_type",),
                  metrics=METRICS)
    a = sorted(
        map(tuple, rollup_table(spark, inc)
            .select("bucket", "event_type", "n_events", "value_sum",
                    "value_max").collect())
    )
    b = sorted(
        map(tuple, rollup_table(spark, full)
            .select("bucket", "event_type", "n_events", "value_sum",
                    "value_max").collect())
    )
    assert a == b


def test_refresh_merges_same_bucket_arrivals(spark, events, tmp_path):
    # split INSIDE a bucket: both halves land in the same hour bucket
    # and must merge, not duplicate
    cut = "2024-03-10 12:30:00"
    old = events.where(F.col("ts") < F.to_timestamp(F.lit(cut)))
    new = events.where(F.col("ts") >= F.to_timestamp(F.lit(cut)))
    out = str(tmp_path / "mid")
    create_rollup(old, out, period="hour", dims=(), metrics=METRICS)
    refresh_rollup(spark, new, out)
    got = {
        r["bucket"]: (r["n_events"], r["value_sum"], r["value_max"])
        for r in rollup_table(spark, out)
        .select("bucket", "n_events", "value_sum", "value_max")
        .collect()
    }
    assert got == _raw(events)


def test_refresh_rejects_deep_backfill(spark, events, tmp_path):
    out = str(tmp_path / "bf")
    create_rollup(events, out, period="hour", metrics=METRICS)
    ancient = spark.createDataFrame(
        [(10**6, dt.datetime(2023, 1, 1), "click", 1.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    with pytest.raises(ValueError, match="backfill"):
        refresh_rollup(spark, ancient, out)
    # empty delta is a no-op
    assert refresh_rollup(spark, events.limit(0), out) == 0


def test_create_rollup_validation(spark, events, tmp_path):
    with pytest.raises(ValueError, match="period"):
        create_rollup(events, str(tmp_path / "x"), period="decade")
    with pytest.raises(ValueError, match="reserved"):
        create_rollup(events, str(tmp_path / "x"), dims=("bucket",))
    with pytest.raises(ValueError, match="kind"):
        create_rollup(events, str(tmp_path / "x"),
                      metrics={"m": ("median", "value")})


def test_rollup_stream_maintains_table(spark, events, tmp_path):
    from hadoop_search_engine_spark.operators.rollup import rollup_stream

    cut = "2024-03-15 00:00:00"
    old = events.where(F.col("ts") < F.to_timestamp(F.lit(cut)))
    new = events.where(F.col("ts") >= F.to_timestamp(F.lit(cut)))
    out = str(tmp_path / "stream_ru")
    create_rollup(old, out, period="hour", dims=("event_type",),
                  metrics=METRICS)
    src = str(tmp_path / "src")
    new.write.parquet(src)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        rollup_stream(stream, out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(map(tuple, rollup_table(spark, out)
                 .select("bucket", "event_type", "n_events",
                         "value_sum", "value_max").collect()))
    full = str(tmp_path / "full_ru")
    create_rollup(events, full, period="hour", dims=("event_type",),
                  metrics=METRICS)
    want = sorted(map(tuple, rollup_table(spark, full)
                  .select("bucket", "event_type", "n_events",
                          "value_sum", "value_max").collect()))
    assert got == want
