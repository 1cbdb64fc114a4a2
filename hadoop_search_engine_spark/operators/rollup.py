"""Continuous aggregates (hypertable rollups): precomputed
time-bucketed aggregate tables over an append-only event stream, with
incremental refresh and partition-pruned range queries.

The TimescaleDB continuous-aggregate / druid rollup shape, Spark-first:

* :func:`create_rollup` — one partial-aggregated groupBy over the raw
  events: ``(bucket, <dims...>, n_events, <metric sums/mins/maxes>)``,
  written as parquet **partitioned by the bucket's date** so a time
  range prunes at the file listing, plus a JSON manifest (period,
  dims, metrics, watermark).
* :func:`refresh_rollup` — append NEW events without re-scanning old
  raw data: only the delta is aggregated, and only the affected tail
  partitions are re-merged (every stored metric is MERGEABLE —
  count/sum/min/max — so merge = one more groupBy over tail rows +
  delta partials). Late events older than the watermark bucket are
  rejected loudly (they belong to a backfill recompute, not a silent
  double count).
* :func:`rollup_range` — answer a time-range aggregation FROM the
  rollup: scan |buckets in range| rows instead of |events in range|.
  Dims can be further rolled up (group by any subset, including
  none); ``avg`` is derived sum/count at read. Results are identical
  to aggregating the raw events (by oracle).

100 TB shape: the rollup table is |buckets × dim-cardinality| rows —
bounded by time × dimensions, not by event volume; refresh cost is
the delta scan plus a tail-partition rewrite; range queries never
touch raw events, and the ``p_date`` partitioning makes the read
bucket-pruned. The reference has no analog (its only aggregation is
term counting at index time); this is the standard serving-layer
companion every event pipeline builds beside a search index.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "rollup.json"
_PERIODS = ("minute", "hour", "day", "week", "month")
# metric kinds that merge associatively across partial aggregates
_MERGEABLE = ("count", "sum", "min", "max")


def _bucket(ts_col: str, period: str):
    return F.date_trunc(period, F.col(ts_col).cast("timestamp")).alias(
        "bucket"
    )


def _metric_aggs(metrics: dict[str, tuple[str, str]]):
    aggs = []
    for name, (kind, col) in metrics.items():
        if kind == "count":
            aggs.append(F.count("*").cast("long").alias(name))
        elif kind == "sum":
            aggs.append(F.sum(F.col(col).cast("double")).alias(name))
        elif kind == "min":
            aggs.append(F.min(F.col(col).cast("double")).alias(name))
        elif kind == "max":
            aggs.append(F.max(F.col(col).cast("double")).alias(name))
        else:
            raise ValueError(
                f"metric kind must be one of {_MERGEABLE}, got {kind!r}"
            )
    return aggs


def _merge_aggs(metrics: dict[str, tuple[str, str]]):
    """Re-aggregate already-partial rows: count→sum, sum→sum,
    min→min, max→max (the mergeability that makes refresh a
    tail-rows + delta groupBy instead of a raw re-scan)."""
    aggs = []
    for name, (kind, _col) in metrics.items():
        x = F.col(name)
        if kind == "count":
            aggs.append(F.sum(x).cast("long").alias(name))
        elif kind == "sum":
            aggs.append(F.sum(x).alias(name))
        elif kind == "min":
            aggs.append(F.min(x).alias(name))
        else:
            aggs.append(F.max(x).alias(name))
    return aggs


def _validate(period: str, dims, metrics) -> None:
    if period not in _PERIODS:
        raise ValueError(f"period must be one of {_PERIODS}")
    if not metrics:
        raise ValueError("metrics must name at least one (kind, col)")
    reserved = {"bucket", "p_date"} & set(dims)
    if reserved:
        raise ValueError(f"dims may not use reserved names {reserved}")
    if set(metrics) & set(dims):
        raise ValueError("metric names collide with dims")


def _aggregate(
    events: DataFrame,
    ts_col: str,
    period: str,
    dims: tuple,
    metrics: dict,
) -> DataFrame:
    rows = (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(_bucket(ts_col, period), *[F.col(d) for d in dims])
        .agg(*_metric_aggs(metrics))
    )
    return rows.withColumn("p_date", F.to_date("bucket"))


def create_rollup(
    events: DataFrame,
    out_dir: str,
    period: str = "hour",
    dims: tuple = ("event_type",),
    metrics: dict[str, tuple[str, str]] | None = None,
    ts_col: str = "ts",
) -> None:
    """Materialize the rollup table. ``metrics`` maps output column →
    ``(kind, source col)`` with kind in count/sum/min/max (``col`` is
    ignored for count). Default: ``{"n_events": ("count", "*")}``."""
    metrics = metrics or {"n_events": ("count", "*")}
    _validate(period, dims, metrics)
    rows = _aggregate(events, ts_col, period, tuple(dims), metrics)
    rows.write.mode("overwrite").partitionBy("p_date").parquet(
        os.path.join(out_dir, "table")
    )
    hi = events.agg(F.max(F.col(ts_col).cast("timestamp"))).first()[0]
    manifest = {
        "period": period,
        "dims": list(dims),
        "metrics": {k: list(v) for k, v in metrics.items()},
        "ts_col": ts_col,
        "watermark_us": (
            0 if hi is None
            else int(hi.timestamp() * 1_000_000)
        ),
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f)


def _load_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        return json.load(f)


def rollup_table(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "table"))


def refresh_rollup(
    spark: SparkSession,
    new_events: DataFrame,
    out_dir: str,
) -> int:
    """Fold NEW events into the rollup. Only the delta is scanned;
    affected tail partitions (dates touched by the delta) are
    re-merged row-wise with the delta's partial aggregates and
    rewritten — old partitions stay byte-untouched. Events at or
    before the watermark BUCKET boundary are fine (same-bucket
    arrivals merge); events in buckets older than any affected-date
    partition already closed are detected by date and merged the same
    way — but a delta reaching back more than ``28`` days before the
    watermark raises (that is a backfill; run create_rollup again).
    Returns the number of affected partitions."""
    m = _load_manifest(out_dir)
    period, dims = m["period"], tuple(m["dims"])
    metrics = {k: tuple(v) for k, v in m["metrics"].items()}
    ts_col = m["ts_col"]

    delta = _aggregate(new_events, ts_col, period, dims, metrics)
    dates = [r["p_date"] for r in delta.select("p_date").distinct()
             .collect()]
    if not dates:
        return 0
    import datetime as _dt

    wm = m.get("watermark_us", 0)
    if wm:
        wm_date = _dt.datetime.fromtimestamp(
            wm / 1_000_000, tz=_dt.timezone.utc
        ).date()
        horizon = wm_date - _dt.timedelta(days=28)
        stale = [d for d in dates if d < horizon]
        if stale:
            raise ValueError(
                f"delta reaches back to {min(stale)}, more than 28 "
                "days before the watermark — backfill with "
                "create_rollup instead"
            )

    table_dir = os.path.join(out_dir, "table")
    existing = spark.read.parquet(table_dir).where(
        F.col("p_date").isin(dates)
    )
    merged = (
        existing.unionByName(delta)
        .groupBy("bucket", *[F.col(d) for d in dims], "p_date")
        .agg(*_merge_aggs(metrics))
    )
    # stage the merged partitions, then swap them in (dynamic
    # partition overwrite touches only the affected dates)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        staged = merged.persist()
        staged.count()
        staged.write.mode("overwrite").partitionBy("p_date").parquet(
            table_dir
        )
        staged.unpersist()
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "static")
    hi = new_events.agg(
        F.max(F.col(ts_col).cast("timestamp"))
    ).first()[0]
    if hi is not None:
        m["watermark_us"] = max(
            m.get("watermark_us", 0), int(hi.timestamp() * 1_000_000)
        )
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(m, f)
    return len(dates)


def rollup_range(
    spark: SparkSession,
    out_dir: str,
    lo: str | None = None,
    hi: str | None = None,
    group_dims: tuple = (),
) -> DataFrame:
    """Answer a time-range aggregation FROM the rollup: buckets with
    ``lo <= bucket < hi`` (either side open with None), optionally
    rolled further up to any SUBSET of the stored group columns —
    ``group_dims=()`` gives ONE total row over the range,
    ``("bucket",)`` keeps the time axis, ``("event_type",)`` sums the
    time axis away. Output: the requested group columns + every
    stored metric re-merged. The ``p_date`` filter prunes partitions
    at the file listing."""
    m = _load_manifest(out_dir)
    metrics = {k: tuple(v) for k, v in m["metrics"].items()}
    stored = set(m["dims"]) | {"bucket"}
    bad = [d for d in group_dims if d not in stored]
    if bad:
        raise ValueError(
            f"group_dims {bad} not in the rollup (stored: "
            f"{sorted(stored)})"
        )
    t = rollup_table(spark, out_dir)
    if lo is not None:
        t = t.where(F.col("p_date") >= F.to_date(F.lit(str(lo))))
        t = t.where(F.col("bucket") >= F.to_timestamp(F.lit(str(lo))))
    if hi is not None:
        t = t.where(F.col("p_date") <= F.to_date(F.lit(str(hi))))
        t = t.where(F.col("bucket") < F.to_timestamp(F.lit(str(hi))))
    if group_dims:
        out = t.groupBy(*[F.col(d) for d in group_dims]).agg(
            *_merge_aggs(metrics)
        )
        return out.orderBy(*[F.asc(d) for d in group_dims])
    return t.agg(*_merge_aggs(metrics))


def rollup_stream(
    events_stream: DataFrame,
    out_dir: str,
):
    """Maintain the rollup FROM A STREAM (the continuous in
    continuous aggregate): each micro-batch folds in through
    :func:`refresh_rollup` — delta-only aggregation, tail-partition
    merge, watermark advance. The table must exist
    (:func:`create_rollup` on the history, or on an empty frame with
    the right schema). Returns the ``DataStreamWriter`` — caller
    picks trigger/checkpoint. foreachBatch rather than a streaming
    aggregation sink: the merge needs dynamic partition overwrite,
    which only the batch writer speaks."""

    def fb(batch_df: DataFrame, _epoch: int) -> None:
        refresh_rollup(batch_df.sparkSession, batch_df, out_dir)

    return events_stream.writeStream.foreachBatch(fb)
