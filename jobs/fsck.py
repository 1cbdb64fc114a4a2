"""spark-submit entrypoint: index integrity verification (fsck).

    spark-submit --py-files dist/hadoop_search_engine_spark.zip \
        jobs/fsck.py --index /path/to/index [--sample 0.05]

Recomputes every derivable invariant of a committed index — lineage
counters vs postings, lexicon vs rollup, block layout keys, doc_stats
vs the stats header, a sampled blob decode, tombstone sanity — and
prints one JSON report. Exit status 0 iff every check passed; run it
after a merge, vacuum, legacy import, or a suspicious copy before
putting a segment into serving. ``--sample 1.0`` decodes every block
(a full scrub).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True)
    ap.add_argument("--sample", type=float, default=0.05,
                    help="fraction of blocks to fully decode (1.0 = all)")
    args = ap.parse_args(argv)

    from hadoop_search_engine_spark.operators.fsck import verify_index
    from hadoop_search_engine_spark.operators.query_exec import Index
    from hadoop_search_engine_spark.session import get_spark

    spark = get_spark(app_name="hse-fsck")
    report = verify_index(Index.load(spark, args.index),
                          sample_fraction=args.sample)
    print(json.dumps(report, indent=2, sort_keys=True))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
