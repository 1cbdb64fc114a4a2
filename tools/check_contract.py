"""Driver-mimic correctness harness.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark at a
given sf dir, runs the matching ``oracle_sql()`` in DuckDB over the
same parquet tables, and compares row count, sorted column names, and
a value hash over column-name-sorted, row-sorted output — the same
shape of compare the round driver performs for CORRECTNESS_r{N}.json.

Usage: python tools/check_contract.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows: list[tuple]) -> str:
    def norm(v):
        if v is None:
            return "\\N"
        if isinstance(v, float):
            return f"{v:.6g}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    lines = sorted(",".join(norm(v) for v in row) for row in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from hadoop_search_engine_spark.session import get_spark

    spark = get_spark(app_name="contract-check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [tuple(r[c] for c in scols) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        dcols = sorted(ddf.columns)
        drows = [tuple(row[c] for c in dcols) for _, row in ddf.iterrows()]
        ok_cols = [c.lower() for c in scols] == [c.lower() for c in dcols]
        ok_count = len(srows) == len(drows)
        sh, dh = value_hash(srows), value_hash(drows)
        ok_hash = sh == dh
        status = "PASS" if (ok_cols and ok_count and ok_hash) else "FAIL"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        detail = ""
        if not ok_cols:
            detail += f" cols spark={scols} duck={dcols}"
        if not ok_count:
            detail += f" rows spark={len(srows)} duck={len(drows)}"
        if ok_cols and ok_count and not ok_hash:
            sset = set(srows)
            dset = set(drows)
            so = sorted(sset - dset)[:3]
            do = sorted(dset - sset)[:3]
            detail += f" hash mismatch; spark-only={so} duck-only={do}"
        print(f"{status}  {name}: {len(srows)} rows{detail} [{time.time()-t0:.1f}s]")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
