"""Cross-engine murmur3 parity: Spark's hash() == the Python reference
== the DuckDB SQL emitter, over ASCII / unicode / length fuzz — the
foundation the fingerprint and simhash DuckDB oracles stand on."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from hadoop_search_engine_spark.functions.hashes import (
    mm3_u32_ref_str,
    murmur3_u32,
    sql_murmur3_u32_duckdb,
)


def _fuzz_words() -> list[str]:
    rng = random.Random(7)
    words = [
        "", "a", "ab", "abc", "abcd", "abcde", "spark",
        "Σσς", "naïve", "日本語テスト", "x" * 33,
    ]
    words += [
        "".join(rng.choice("abcdefgh0123 é日") for _ in range(rng.randint(1, 40)))
        for _ in range(40)
    ]
    return words


def test_spark_hash_matches_reference(spark):
    words = _fuzz_words()
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id long, w string"
    )
    rows = df.select(
        "id",
        murmur3_u32(F.col("w")).alias("lo"),
        murmur3_u32(F.col("w"), "hi").alias("hi"),
    ).orderBy("id").collect()
    for r, w in zip(rows, words):
        assert int(r["lo"]) == mm3_u32_ref_str(w), repr(w)
        assert int(r["hi"]) == mm3_u32_ref_str(w, "hi"), repr(w)
        assert 0 <= int(r["lo"]) < (1 << 32)


def test_duckdb_emitter_matches_reference():
    words = _fuzz_words()
    con = duckdb.connect()
    con.execute("CREATE TABLE w AS SELECT * FROM (SELECT unnest(?) AS t)", [words])
    lo = sql_murmur3_u32_duckdb("t")
    hi = sql_murmur3_u32_duckdb("'hi'", seed=lo)
    got = con.execute(f"SELECT t, {lo} AS lo, {hi} AS hi FROM w").fetchall()
    assert len(got) == len(words)
    for t, lo_v, hi_v in got:
        assert int(lo_v) == mm3_u32_ref_str(t), repr(t)
        assert int(hi_v) == mm3_u32_ref_str(t, "hi"), repr(t)


def test_duckdb_emitter_nested_in_list_transform():
    """The oracles apply the emitter per token INSIDE list_transform —
    the binding lambdas must survive that nesting."""
    con = duckdb.connect()
    mm = sql_murmur3_u32_duckdb("_w")
    got = con.execute(
        f"SELECT list_transform(['a', 'bc', ''], _w -> {mm})"
    ).fetchone()[0]
    assert got == [mm3_u32_ref_str("a"), mm3_u32_ref_str("bc"), mm3_u32_ref_str("")]
