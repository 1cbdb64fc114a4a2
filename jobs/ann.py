"""spark-submit entrypoint: ANN table build + query.

    # build a persisted ANN table (artifact dir with a meta.json sidecar)
    jobs/ann.py --embeddings emb.parquet --build ivfpq --output /idx/ann
    # query it (vector inline, or by the id of a stored embedding)
    jobs/ann.py --table /idx/ann --query-id 0 --k 10 --n-probe 4 \
                --embeddings emb.parquet
    jobs/ann.py --embeddings emb.parquet --method exact --query 0.1,0.2,...

Methods: ``exact`` (brute-force cosine), ``lsh`` (sign-bucket
partitioned table), ``ivf`` (coarse-quantizer partitioned table),
``pq`` (product-quantized codes), ``ivfpq`` (coarse + residual codes).
Each build writes ``meta.json`` beside the data with the method,
params, and the trained centroids/codebooks, so a query needs only
the table dir. Prints ONE JSON line: {"method", "k", "hits": [[id,
score], ...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_meta(out_dir: str, meta: dict) -> None:
    tmp = os.path.join(out_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, "meta.json"))


def _read_meta(table_dir: str) -> dict:
    with open(os.path.join(table_dir, "meta.json")) as f:
        return json.load(f)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--embeddings",
                    help="embeddings parquet (vec_id, embedding) — needed "
                         "for --build, --method exact, and --query-id")
    ap.add_argument("--build", choices=("lsh", "ivf", "pq", "ivfpq"),
                    help="train + persist an ANN table at --output")
    ap.add_argument("--output", help="table dir for --build")
    ap.add_argument("--table", help="persisted table dir to query")
    ap.add_argument("--method", choices=("exact", "lsh", "ivf", "pq",
                                         "ivfpq"),
                    help="query method (inferred from the table's "
                         "meta.json when --table is given)")
    ap.add_argument("--query", help="comma-separated query vector")
    ap.add_argument("--query-id", type=int, default=None,
                    help="use the stored embedding with this vec_id")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-probe", type=int, default=4)
    ap.add_argument("--n-planes", type=int, default=8)
    ap.add_argument("--n-centroids", type=int, default=16)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--nbits", type=int, default=3)
    args = ap.parse_args(argv)

    import numpy as np
    from pyspark.sql import SparkSession

    from hadoop_search_engine_spark.operators import similarity as S
    from hadoop_search_engine_spark.session import get_spark

    owns = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="hse-ann")

    emb = spark.read.parquet(args.embeddings) if args.embeddings else None

    if args.build:
        if not args.output or emb is None:
            ap.error("--build needs --embeddings and --output")
        os.makedirs(args.output, exist_ok=True)
        meta: dict = {"method": args.build}
        data_dir = os.path.join(args.output, "data")
        if args.build == "lsh":
            planes = S.write_lsh_bucketed(emb, data_dir,
                                          n_planes=args.n_planes)
            meta["n_planes"] = args.n_planes
            meta["dim"] = int(planes.shape[1])
        elif args.build == "ivf":
            cents = S.ivf_train(emb, n_centroids=args.n_centroids,
                                n_iters=args.iters)
            S.write_ivf_clustered(emb, data_dir, cents)
            meta["centroids"] = cents.tolist()
        elif args.build == "pq":
            cb = S.pq_train(emb, m=args.m, nbits=args.nbits,
                            n_iters=args.iters)
            S.write_pq_table(emb, cb, data_dir)
            meta["m"], meta["nbits"] = args.m, args.nbits
        else:  # ivfpq
            cents, cb = S.ivfpq_train(
                emb, n_centroids=args.n_centroids, ivf_iters=args.iters,
                m=args.m, nbits=args.nbits, pq_iters=args.iters,
            )
            S.ivfpq_encode(emb, cents, cb).write.mode("overwrite").parquet(
                data_dir
            )
            meta["centroids"] = cents.tolist()
            meta["codebooks"] = {"shape": list(cb.shape),
                                 "values": cb.ravel().tolist()}
        _write_meta(args.output, meta)
        print(json.dumps({"built": args.build, "output": args.output}))
        if owns:
            spark.stop()
        return

    # ---- query path
    if args.query:
        qvec = [float(x) for x in args.query.split(",")]
    elif args.query_id is not None:
        if emb is None:
            ap.error("--query-id needs --embeddings")
        from pyspark.sql import functions as F

        row = emb.where(F.col("vec_id") == args.query_id).first()
        if row is None:
            ap.error(f"vec_id {args.query_id} not found")
        qvec = [float(x) for x in row["embedding"]]
    else:
        ap.error("pass --query or --query-id")

    if args.table:
        meta = _read_meta(args.table)
        method = args.method or meta["method"]
        data_dir = os.path.join(args.table, "data")
        if method == "lsh":
            top = S.lsh_bucket_topk_table(
                spark, data_dir, qvec, k=args.k,
                n_planes=int(meta["n_planes"]),
            )
        elif method == "ivf":
            top = S.ivf_topk_table(
                spark, data_dir, qvec,
                np.asarray(meta["centroids"], dtype=np.float64),
                k=args.k, n_probe=args.n_probe,
            )
        elif method == "pq":
            top = S.pq_topk_table(spark, data_dir, qvec, k=args.k)
        elif method == "ivfpq":
            cb = np.asarray(
                meta["codebooks"]["values"], dtype=np.float64
            ).reshape(meta["codebooks"]["shape"])
            top = S.ivfpq_topk(
                spark.read.parquet(data_dir),
                np.asarray(meta["centroids"], dtype=np.float64),
                cb, qvec, k=args.k, n_probe=args.n_probe,
            )
        else:
            ap.error(f"table meta has unknown method {method!r}")
    else:
        if emb is None:
            ap.error("--method exact needs --embeddings")
        top = S.cosine_topk(emb, qvec, k=args.k)

    rows = top.collect()
    score_col = "score" if "score" in top.columns else "cosine"
    print(json.dumps({
        "method": (args.method or (meta["method"] if args.table else "exact")),
        "k": args.k,
        "hits": [[int(r["vec_id"]), float(r[score_col])] for r in rows],
    }))
    if owns:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
