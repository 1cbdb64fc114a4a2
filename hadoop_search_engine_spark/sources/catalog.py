"""Table catalog: Iceberg when available, Parquet layout otherwise.

BASELINE.json targets Iceberg tables. The Iceberg runtime jars are not
on this container's classpath, so the catalog abstracts the three
operations the engine needs — read a table, create/replace it, append
to it — and degrades to a plain-Parquet directory layout with the same
partitioning. The Iceberg branch is import/config-gated, not deleted:
on a cluster with ``spark.sql.catalog.*`` configured it activates
unchanged.

Replaces the reference's Hive-managed-table plumbing
(``saveAsTable`` / ``insertInto`` — /root/reference/processVideo/
upload_videos_to_hive.py:34-36, process.py:248-250) and its explicit
HDFS dir delete/mkdir job reset (process.py:176-197), which becomes a
snapshot-replace (Iceberg) or overwrite (Parquet).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured on this session."""
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:
        return False
    return any(k.startswith("spark.sql.catalog.") for k, _ in confs) and any(
        "iceberg" in v.lower() for _, v in confs
    )


class Catalog:
    def __init__(self, spark: SparkSession, base_dir: str, namespace: str = "engine"):
        self.spark = spark
        self.base_dir = base_dir
        self.namespace = namespace
        self.use_iceberg = iceberg_available(spark)

    def _ident(self, name: str) -> str:
        return f"{self.namespace}.{name}"

    def _path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(self._ident(name))
        return self.spark.read.parquet(self._path(name))

    def create_or_replace(self, df: DataFrame, name: str,
                          partition_by: list[str] | None = None) -> None:
        if self.use_iceberg:
            w = df.writeTo(self._ident(name))
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
            return
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def append(self, df: DataFrame, name: str,
               partition_by: list[str] | None = None) -> None:
        if self.use_iceberg:
            df.writeTo(self._ident(name)).append()
            return
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(self._ident(name))
        return os.path.isdir(self._path(name))
