"""spark-submit entrypoint: continuous-aggregate rollups over events.

    spark-submit --py-files dist/hadoop_search_engine_spark.zip \
        jobs/rollup.py --rollup /path/to/rollup \
        --create events.parquet [--period hour] [--dims event_type] \
            [--metrics 'n:count,v_sum:sum:value,v_max:max:value']
      | --refresh new_events.parquet
      | --query [--from TS --to TS] [--group bucket,event_type]

create materializes the (bucket, dims, mergeable metrics) table
partitioned by bucket date; refresh folds a delta parquet in without
re-scanning old raw data; query answers a range aggregation from the
rollup (one JSON line per group row). See operators/rollup.py.
"""

from __future__ import annotations

import argparse
import json


def _parse_metrics(spec: str) -> dict:
    out = {}
    for part in spec.split(","):
        bits = part.split(":")
        if len(bits) == 2 and bits[1] == "count":
            out[bits[0]] = ("count", "*")
        elif len(bits) == 3:
            out[bits[0]] = (bits[1], bits[2])
        else:
            raise ValueError(
                f"metric {part!r} must be name:count or name:kind:col"
            )
    return out


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rollup", required=True, help="rollup directory")
    ap.add_argument("--create", metavar="EVENTS_PARQUET")
    ap.add_argument("--refresh", metavar="DELTA_PARQUET")
    ap.add_argument("--query", action="store_true")
    ap.add_argument("--period", default="hour")
    ap.add_argument("--dims", default="event_type",
                    help="comma-separated dim columns ('' for none)")
    ap.add_argument("--metrics", default="n_events:count",
                    help="name:count | name:sum|min|max:col, comma-sep")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--from", dest="lo", default=None, metavar="TS")
    ap.add_argument("--to", dest="hi", default=None, metavar="TS")
    ap.add_argument("--group", default="bucket",
                    help="comma-separated group columns for --query")
    args = ap.parse_args(argv)

    modes = sum(bool(x) for x in (args.create, args.refresh, args.query))
    if modes != 1:
        ap.error("exactly one of --create / --refresh / --query")

    from pyspark.sql import SparkSession

    from hadoop_search_engine_spark.operators.rollup import (
        create_rollup,
        refresh_rollup,
        rollup_range,
    )
    from hadoop_search_engine_spark.session import get_spark

    owns = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="hse-rollup")
    if args.create:
        dims = tuple(d for d in args.dims.split(",") if d)
        create_rollup(
            spark.read.parquet(args.create), args.rollup,
            period=args.period, dims=dims,
            metrics=_parse_metrics(args.metrics), ts_col=args.ts_col,
        )
        print(json.dumps({"created": args.rollup, "period": args.period,
                          "dims": list(dims)}))
    elif args.refresh:
        n = refresh_rollup(spark, spark.read.parquet(args.refresh),
                           args.rollup)
        print(json.dumps({"refreshed": args.rollup,
                          "partitions_touched": n}))
    else:
        g = tuple(d for d in args.group.split(",") if d)
        for r in rollup_range(spark, args.rollup, args.lo, args.hi,
                              g).collect():
            print(json.dumps(r.asDict(), default=str))
    if owns and SparkSession.getActiveSession() is not None:
        spark.stop()


if __name__ == "__main__":
    main()
