"""Ingest pipelines: processor semantics, ordering, validation, and
Spark↔DuckDB parity of the compiled chain."""

from __future__ import annotations

import pytest

from hadoop_search_engine_spark.operators.ingest import (
    apply_pipeline,
    sql_pipeline_duckdb,
)

PIPE = [
    {"copy": {"from": "text", "to": "raw"}},
    {"gsub": {"field": "text", "pattern": "[0-9]+", "replacement": "#"}},
    {"lowercase": {"field": "text"}},
    {"trim": {"field": "text"}},
    {"split": {"field": "text", "separator": " +"}},
    {"join": {"field": "text", "separator": " "}},
    {"substring": {"field": "raw", "start": 1, "length": 5}},
    {"rename": {"field": "raw", "target_field": "head"}},
    {"set": {"field": "source", "value": "crawl"}},
    {"default": {"field": "lang", "value": "und"}},
    {"convert": {"field": "doc_id", "type": "string"}},
]


def _rows():
    return [
        (0, "  Hello   WORLD 42  ", None),
        (1, "MiXeD 7 Case", "en"),
        (2, None, "es"),
    ]


def test_pipeline_semantics(spark):
    docs = spark.createDataFrame(
        _rows(), "doc_id long, text string, lang string"
    )
    out = apply_pipeline(docs, [{"drop": {"if_missing": "text"}}] + PIPE)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {"0", "1"}  # doc 2 dropped, doc_id now string
    assert rows["0"]["text"] == "hello world #"
    assert rows["0"]["head"] == "  Hel"
    assert rows["0"]["lang"] == "und" and rows["1"]["lang"] == "en"
    assert all(r["source"] == "crawl" for r in rows.values())
    assert "raw" not in out.columns and "head" in out.columns


def test_pipeline_validation(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="missing field"):
        apply_pipeline(docs, [{"lowercase": {"field": "nope"}}])
    with pytest.raises(ValueError, match="unknown ingest processor"):
        apply_pipeline(docs, [{"frobnicate": {"field": "text"}}])
    with pytest.raises(ValueError, match="needs 'pattern'"):
        apply_pipeline(docs, [{"gsub": {"field": "text"}}])
    with pytest.raises(ValueError, match="single-key"):
        apply_pipeline(docs, [{"a": {}, "b": {}}])
    with pytest.raises(ValueError, match="convert type"):
        apply_pipeline(docs, [{"convert": {"field": "text",
                                           "type": "decimal"}}])


def test_pipeline_duckdb_parity(spark):
    import duckdb

    docs = spark.createDataFrame(
        _rows(), "doc_id long, text string, lang string"
    )
    pipe = [{"drop": {"if_missing": "text"}}] + PIPE
    got = sorted(
        tuple(r) for r in apply_pipeline(docs, pipe).collect()
    )
    con = duckdb.connect()
    con.register(
        "documents", docs.toPandas()
    )
    sql = sql_pipeline_duckdb(pipe, ["doc_id", "text", "lang"])
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_rename_existing_target_raises(spark):
    """Round-4 ADVICE: withColumnRenamed onto an existing name mints a
    DUPLICATE column while the DuckDB replay overwrites — both
    compilers now reject the collision (ES rename semantics)."""
    import pytest

    from hadoop_search_engine_spark.operators.ingest import (
        apply_pipeline,
        sql_pipeline_duckdb,
    )

    df = spark.createDataFrame([(1, "a", "b")], "doc_id long, x string, y string")
    procs = [{"rename": {"field": "x", "target_field": "y"}}]
    with pytest.raises(ValueError, match="already exists"):
        apply_pipeline(df, procs)
    with pytest.raises(ValueError, match="already exists"):
        sql_pipeline_duckdb(procs, ["doc_id", "x", "y"])


def test_sql_lit_escaping_and_null():
    """set/default values with apostrophes, None, and bools must render
    as valid DuckDB literals in the oracle replay."""
    import duckdb

    from hadoop_search_engine_spark.operators.ingest import (
        _sql_lit,
        sql_pipeline_duckdb,
    )

    assert _sql_lit("o'brien") == "'o''brien'"
    assert _sql_lit(None) == "NULL"
    assert _sql_lit(True) == "TRUE"
    assert _sql_lit(False) == "FALSE"
    assert _sql_lit(3) == "3"
    sql = sql_pipeline_duckdb(
        [{"set": {"field": "who", "value": "o'brien"}},
         {"default": {"field": "maybe", "value": None}},
         {"set": {"field": "flag", "value": True}}],
        ["doc_id", "maybe"],
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 1::BIGINT AS doc_id, "
                "NULL::VARCHAR AS maybe")
    row = con.execute(sql).fetchone()
    assert row == (1, None, "o'brien", True)
