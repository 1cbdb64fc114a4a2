"""spark-submit entrypoint: event analytics over an events table.

    spark-submit --py-files dist/hadoop_search_engine_spark.zip \
        jobs/events.py --input events.parquet \
        [--sessions GAP_MIN] [--cohort day|week|month] \
        [--funnel view,click,purchase] \
        [--anomalies EVENT_TYPE[:WINDOW[:Z]]]

Each requested analysis prints its rows as JSON lines (sessions print
the per-user session stats; cohort the retention matrix; funnel the
ordered step counts; anomalies the daily timeline with trailing
z-score flags). Input schema: (event_id, ts, user_id, event_type,
value) — the events testdata shape.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="events parquet path")
    ap.add_argument("--sessions", type=float, default=None,
                    metavar="GAP_MIN")
    ap.add_argument("--cohort", default=None,
                    choices=["day", "week", "month"])
    ap.add_argument("--funnel", default=None, metavar="STEPS",
                    help="comma-separated ordered event types")
    ap.add_argument("--anomalies", default=None,
                    metavar="TYPE[:WINDOW[:Z]]")
    args = ap.parse_args(argv)

    if not any((args.sessions, args.cohort, args.funnel,
                args.anomalies)):
        ap.error("request at least one analysis")

    from pyspark.sql import SparkSession, functions as F

    from hadoop_search_engine_spark.session import get_spark

    owns = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="hse-events")
    ev = spark.read.parquet(args.input)

    def emit(df):
        for r in df.collect():
            print(json.dumps(r.asDict(), default=str))

    if args.sessions:
        from hadoop_search_engine_spark.operators.sessions import (
            session_stats,
        )

        emit(session_stats(ev, args.sessions))
    if args.cohort:
        from hadoop_search_engine_spark.operators.sessions import (
            cohort_retention,
        )

        emit(cohort_retention(ev, args.cohort))
    if args.funnel:
        from hadoop_search_engine_spark.operators.sessions import (
            funnel_counts,
        )

        steps = [s for s in args.funnel.split(",") if s]
        emit(funnel_counts(ev, steps))
    if args.anomalies:
        from hadoop_search_engine_spark.operators.analytics import (
            bucket_anomalies,
        )

        bits = args.anomalies.split(":")
        etype = bits[0]
        window = int(bits[1]) if len(bits) > 1 else 7
        z = float(bits[2]) if len(bits) > 2 else 3.0
        daily = (
            ev.where(F.col("event_type") == etype)
            .groupBy(F.date_trunc("day", "ts").alias("bucket"))
            .agg(F.count("*").cast("long").alias("n"))
        )
        emit(bucket_anomalies(daily, "n", window=window,
                              z=z).orderBy("bucket"))
    if owns and SparkSession.getActiveSession() is not None:
        spark.stop()


if __name__ == "__main__":
    main()
