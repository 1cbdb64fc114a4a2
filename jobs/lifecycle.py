"""Time-partitioned index lifecycle CLI (ES data-stream / ILM shape).

Build monthly/weekly/daily generations from a timestamped corpus,
append new periods (rollover), drop old ones (retention), inspect the
manifest, and run range-routed searches — one JSON line per action.

    spark-submit --py-files dist/hse_spark.zip jobs/lifecycle.py \
        --index /idx --build docs.parquet --ts-col warc_ts --interval month
    ... --rollover new_docs.parquet
    ... --retain-after 2026-02-01
    ... --list
    ... --search "spark query" --from 2026-01-15 --to 2026-03-10 --k 10
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import datetime, timezone

sys.path.insert(0, ".")

from hadoop_search_engine_spark.session import get_spark  # noqa: E402


def _us(s: str) -> int:
    """ISO date/datetime -> epoch micros (UTC)."""
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True,
                    help="time-partitioned index root directory")
    ap.add_argument("--build", metavar="PARQUET",
                    help="build generations from a timestamped corpus "
                         "(doc_id, text, <ts-col>)")
    ap.add_argument("--rollover", metavar="PARQUET",
                    help="append NEW periods from a corpus slice "
                         "(existing periods are immutable)")
    ap.add_argument("--ts-col", default="warc_ts")
    ap.add_argument("--interval", default="month",
                    choices=["year", "quarter", "month", "week", "day",
                             "hour"])
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--retain-after", metavar="ISO",
                    help="drop periods whose docs all predate this "
                         "date (ILM delete phase; metadata-cost only)")
    ap.add_argument("--list", action="store_true",
                    help="print the period manifest")
    ap.add_argument("--search", metavar="QUERY",
                    help="range-routed search (requires --from/--to)")
    ap.add_argument("--from", dest="t_from", metavar="ISO")
    ap.add_argument("--to", dest="t_to", metavar="ISO")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=["or", "and"], default="or")
    args = ap.parse_args(argv)

    from hadoop_search_engine_spark.operators.time_partitioned import (
        TimePartitionedIndex,
        build_time_partitioned_index,
        drop_periods,
        rollover_append,
        route_time_range,
        search_time_range,
    )

    spark = get_spark(app_name="hse-lifecycle")
    if args.build:
        docs = spark.read.parquet(args.build)
        tpi = build_time_partitioned_index(
            spark, docs, args.index, ts_col=args.ts_col,
            interval=args.interval, n_buckets=args.n_buckets,
        )
        print(json.dumps({"built": [p["name"] for p in tpi.periods]}))
        spark.stop()
        return

    tpi = TimePartitionedIndex.load(spark, args.index)
    if args.rollover:
        docs = spark.read.parquet(args.rollover)
        tpi = rollover_append(tpi, docs, ts_col=args.ts_col,
                              n_buckets=args.n_buckets)
        print(json.dumps({"periods": [p["name"] for p in tpi.periods]}))
    if args.retain_after:
        before = [p["name"] for p in tpi.periods]
        tpi = drop_periods(tpi, _us(args.retain_after))
        kept = [p["name"] for p in tpi.periods]
        print(json.dumps(
            {"dropped": sorted(set(before) - set(kept)), "kept": kept}
        ))
    if args.list:
        print(json.dumps({"interval": tpi.interval, "periods": tpi.periods}))
    if args.search:
        if not (args.t_from and args.t_to):
            ap.error("--search needs --from and --to")
        lo, hi = _us(args.t_from), _us(args.t_to)
        route = route_time_range(tpi, lo, hi)
        rows = search_time_range(tpi, args.search, lo, hi, k=args.k,
                                 mode=args.mode).collect()
        print(json.dumps({
            "route": route,
            "hits": [
                {"period": r["period"], "doc_id": r["doc_id"],
                 "score": r["score"]}
                for r in rows
            ],
        }))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
