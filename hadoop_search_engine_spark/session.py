"""SparkSession factory with the engine's standard configuration.

Local-mode settings mirror what the job would ship with via
``spark-submit --py-files`` to a real cluster: AQE on (runtime skew /
coalesce handling), Arrow enabled (every Python crossing is a pandas
UDF batch), UTC session timezone (oracle comparability — DuckDB
timestamps are UTC-naive), and shuffle partitions sized to cores
rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hadoop_search_engine_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        shuffle_partitions = 32 if n == "*" else int(n)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 64k-row Arrow batches: the streaming encoder pays a fixed
        # concat/slice cost per batch, and 10k-row batches (default)
        # multiply it 6x for nothing at these row widths (~30 bytes).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # conservative default — get_spark backs the spark-submit jobs
        # and tests too, and a 48g ask on a small host gets the driver
        # OOM-killed mid-build; benches opt into more via
        # SPARK_GRAFT_DRIVER_MEM.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # File-split sizing: with the 128 MB default, a few hundred MB
        # of input parquet becomes ~4 map tasks and the scan+tokenize
        # stage runs on 4 cores no matter how many the session has —
        # the map side must fan out at least as wide as the executor
        # pool. 16 MB splits keep map-stage parallelism ≥ cores at
        # bench scale and AQE re-coalesces tiny downstream partitions;
        # at 100 TB the same setting yields bounded-size tasks (file
        # count dominates split math there).
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
