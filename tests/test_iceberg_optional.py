"""Iceberg catalog path — exercised only where the runtime jars and a
catalog conf exist (skipped in this container, which ships no Iceberg
jars; sources/catalog.py degrades to the Parquet layout there, and
THAT branch is covered by tests/test_sources.py).

Opt in with ``SPARK_GRAFT_ICEBERG=1`` on a cluster whose session conf
carries ``spark.sql.catalog.*`` entries pointing at an Iceberg
catalog; the test then round-trips create/append/read through the
same Catalog facade the engine uses.
"""

from __future__ import annotations

import os

import pytest

from hadoop_search_engine_spark.sources.catalog import Catalog, iceberg_available


def test_iceberg_roundtrip_where_jars_present(spark, tmp_path):
    if os.environ.get("SPARK_GRAFT_ICEBERG") != "1":
        pytest.skip(
            "SPARK_GRAFT_ICEBERG != 1 (no Iceberg jars in this "
            "container); Parquet fallback covered by test_sources.py"
        )
    if not iceberg_available(spark):
        pytest.fail(
            "SPARK_GRAFT_ICEBERG=1 but the session has no "
            "spark.sql.catalog.* Iceberg conf — configure the catalog "
            "or unset the flag"
        )
    cat = Catalog(spark, str(tmp_path), namespace="engine_it")
    assert cat.use_iceberg
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    cat.create_or_replace(df, "probe")
    cat.append(df, "probe")
    assert cat.read("probe").count() == 20
    cat.create_or_replace(df, "probe")  # snapshot replace
    assert cat.read("probe").count() == 10
