"""Dense doc_id assignment at scale — no single-partition window.

The reference keys documents by file name strings (``video_name``,
/root/reference/processVideo/process.py:34-48); compressed posting
lists need dense integer doc_ids instead (small deltas -> small
varints). doc_id := global rank of ``(xxhash64(url), url)`` —
deterministic, independent of partitioning and parallelism.

A naive ``row_number() OVER (ORDER BY h)`` funnels the whole table
through one partition; instead we do the classic two-pass zipWithIndex
shape in pure DataFrame ops:

  1. range-repartition by the hash (global order across partitions),
  2. count rows per partition (one tiny job -> P-row offsets table),
  3. broadcast-join the offsets and window *within* each partition.

Each partition windows independently, so the plan scales to 10^12 rows
with one range shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_doc_ids(docs: DataFrame, num_partitions: int | None = None,
                   key_col: str = "url") -> DataFrame:
    """Add a dense ``doc_id`` (0..N-1) column keyed by ``key_col`` hash
    order (any hashable column type — urls, legacy ids, 64-bit hashes)."""
    num_partitions = num_partitions or docs.sparkSession.sparkContext.defaultParallelism
    hashed = docs.withColumn("_h", F.xxhash64(F.col(key_col)))
    parts = hashed.repartitionByRange(num_partitions, "_h", key_col)
    with_pid = parts.withColumn("_pid", F.spark_partition_id())
    # checkpoint-free two-pass: the counts job re-executes the lineage,
    # so persist the partitioned data once.
    with_pid.persist()
    counts = with_pid.groupBy("_pid").count()
    # offsets are tiny (one row per partition) — compute on the driver.
    rows = sorted((r["_pid"], r["count"]) for r in counts.collect())
    offsets, acc = {}, 0
    for pid, cnt in rows:
        offsets[pid] = acc
        acc += cnt
    spark = docs.sparkSession
    import pandas as pd

    # pandas input → Arrow path (a Python-list createDataFrame costs a
    # fresh non-reused Python worker per downstream job, ~5 s each)
    offsets_df = spark.createDataFrame(
        pd.DataFrame(
            {"pid": list(offsets.keys()), "_offset": list(offsets.values())}
        ).astype({"pid": "int32", "_offset": "int64"})
    )
    w = Window.partitionBy("_pid").orderBy("_h", key_col)
    out = (
        with_pid.withColumn("_rn", F.row_number().over(w) - 1)
        .join(F.broadcast(offsets_df), F.col("_pid") == F.col("pid"))
        .withColumn("doc_id", (F.col("_offset") + F.col("_rn")).cast("long"))
        .drop("_h", "_pid", "_rn", "pid", "_offset")
    )
    return out
