"""ES ``_analyze`` analog: show the token stream an analyzer produces.

    jobs/analyze.py --text "The Café studies 春は曙" --fold --stem s
    jobs/analyze.py --text "..." --index /path/to/index   # that index's
                                                         # recorded config

Pure driver-side (no Spark session): the analysis chain is the same
pure-Python implementation the query parser uses, so what this prints
is byte-for-byte what the index and the queries agree on. Prints ONE
JSON line {"tokens": [...], "config": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--text", required=True)
    ap.add_argument("--index",
                    help="read the analyzer config from this index's "
                         "stats.json instead of the flags")
    ap.add_argument("--stopwords", default=None,
                    help="'english' or a comma-joined list")
    ap.add_argument("--stem", default="none", choices=("none", "s", "porter"))
    ap.add_argument("--fold", action="store_true")
    ap.add_argument("--cjk", action="store_true")
    args = ap.parse_args(argv)

    from hadoop_search_engine_spark.functions.analyzer import (
        ENGLISH_STOPWORDS,
        analyze,
    )

    if args.index:
        from hadoop_search_engine_spark.operators.index_build import read_stats

        st = read_stats(args.index)
        cfg = {
            "stopwords": tuple(st.stopwords),
            "stem": st.stem,
            "fold": bool(getattr(st, "fold", False)),
            "cjk": bool(getattr(st, "cjk", False)),
        }
    else:
        if args.stopwords is None:
            stop: tuple = ()
        elif args.stopwords == "english":
            stop = ENGLISH_STOPWORDS
        else:
            stop = tuple(w for w in args.stopwords.split(",") if w)
        cfg = {"stopwords": stop, "stem": args.stem, "fold": args.fold,
               "cjk": args.cjk}

    tokens = analyze(args.text, **cfg)
    print(json.dumps({
        "tokens": tokens,
        "config": {**cfg, "stopwords": list(cfg["stopwords"])},
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
