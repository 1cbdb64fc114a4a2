"""Raw-asset ingestion: files -> binary-column DataFrame.

The reference shells out ``hdfs dfs -put`` per file and records
(name, path) rows in a Hive table (/root/reference/processVideo/
upload_videos_to_hive.py:16-36); the Spark-native equivalent is the
``binaryFile`` source — one distributed scan, payload + metadata as
columns, no driver-side file loop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_binary_assets(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """-> (url, length, mod_time, payload binary)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select(
        F.col("path").alias("url"),
        F.col("length"),
        F.col("modificationTime").alias("mod_time"),
        F.col("content").alias("payload"),
    )


def assets_to_documents(assets: DataFrame) -> DataFrame:
    """binary assets -> input_hint-shaped documents rows (html payload),
    text extracted by the canonical extractor as an Arrow batch UDF."""
    from ..corpus import extract_text

    @F.pandas_udf(T.StringType())
    def extract_udf(payloads: pd.Series) -> pd.Series:
        return payloads.map(lambda b: extract_text(bytes(b)) if b is not None else "")

    return assets.select(
        F.col("url"),
        F.col("mod_time").alias("warc_ts"),
        F.col("payload").alias("html"),
        extract_udf(F.col("payload")).alias("text"),
        F.lit("und").alias("lang"),
    )
