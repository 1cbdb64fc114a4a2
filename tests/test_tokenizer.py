import pandas as pd
from pyspark.sql import functions as F

from hadoop_search_engine_spark.corpus import SYNONYMS
from hadoop_search_engine_spark.functions.tokenizer import (
    rewrite_terms,
    rewrite_terms_col,
    sql_tokens_duckdb,
    sql_tokens_spark,
    tokenize,
    tokenize_series,
    tokens_col,
    tokens_pandas_udf,
)

GOLDEN = [
    ("Hola, Personas!? car", ["hola", "personas", "car"]),
    ("", []),
    (None, []),
    ("   ", []),
    ("a.b,c!d?e", ["abcde"]),
    ("  Mixed   CASE  words ", ["mixed", "case", "words"]),
    ("one\ttwo\nthree", ["one", "two", "three"]),
    ("trailing, punct.", ["trailing", "punct"]),
    ("(parens) [kept-as-is]", ["(parens)", "[kept-as-is]"]),
    ("W00006!!", ["w00006!!".replace("!", "")]),
]


def test_golden_vectors_python():
    for text, want in GOLDEN:
        assert tokenize(text) == want, text


def test_pandas_matches_python():
    texts = [t for t, _ in GOLDEN]
    got = tokenize_series(pd.Series(texts, dtype=object)).tolist()
    assert got == [w for _, w in GOLDEN]


def test_spark_expr_matches_python(spark):
    texts = [(t,) for t, _ in GOLDEN if t is not None]
    df = spark.createDataFrame(texts, "text string")
    got = [r["toks"] for r in df.select(tokens_col(F.col("text")).alias("toks")).collect()]
    assert got == [tokenize(t) for t, _ in GOLDEN if t is not None]


def test_pandas_udf_matches_expr(spark, tiny_corpus):
    both = tiny_corpus.select(
        tokens_col(F.col("text")).alias("a"),
        tokens_pandas_udf(F.col("text")).alias("b"),
    )
    assert both.where(F.col("a") != F.col("b")).count() == 0


def test_sql_fragments_match(spark):
    import duckdb

    texts = [t for t, _ in GOLDEN if t]
    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    sdf.createOrReplaceTempView("tok_in")
    s_rows = spark.sql(
        f"select {sql_tokens_spark('text')} as toks from tok_in"
    ).collect()
    d_rows = duckdb.sql(
        "select "
        + sql_tokens_duckdb("text")
        + " as toks from (select unnest(?) as text)",
        params=[texts],
    ).fetchall()
    assert [r["toks"] for r in s_rows] == [list(r[0]) for r in d_rows]
    assert [r["toks"] for r in s_rows] == [tokenize(t) for t in texts]


def test_synonym_rewrite_python():
    assert rewrite_terms(tokenize("Personas!? coche"), SYNONYMS) == ["w00000", "w00001"]
    assert rewrite_terms(["person", "persona", "x"], SYNONYMS) == ["w00000", "x"]


def test_synonym_rewrite_spark(spark):
    df = spark.createDataFrame([("Personas!? coche perro",)], "text string")
    got = df.select(
        rewrite_terms_col(tokens_col(F.col("text")), SYNONYMS).alias("t")
    ).collect()[0]["t"]
    assert got == ["w00000", "w00001", "w00002"]


def test_arrow_matches_python_golden():
    import pyarrow as pa

    from hadoop_search_engine_spark.functions.tokenizer import tokenize_arrow

    got = tokenize_arrow(pa.array([t for t, _ in GOLDEN], type=pa.string()))
    assert got.to_pylist() == [w for _, w in GOLDEN]


def test_arrow_matches_jvm_on_edge_chars(spark):
    """The Arrow tokenizer's parity target is the JVM build path
    (tokens_col), including the characters where regex engines
    disagree: \\x0B (in Java's \\s, not RE2's), \\xa0 (in Python's
    unicode \\s, in neither Java's nor RE2's), and the two
    SpecialCasing lowercase rows (İ, final sigma)."""
    import pyarrow as pa

    from hadoop_search_engine_spark.functions.tokenizer import tokenize_arrow

    texts = [
        "a\x0bb", "a\fb", "a\rc d", "nbsp\xa0stays", "İstanbul I ı",
        "ΟΔΟΣ ΣΟΦΙΑ", "café STRASSE ß", "日本語 テスト", "",
        "  lead trail  ", "a.b,c!d?e", "ONE\ttwo\nTHREE",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    jvm = [
        r["toks"]
        for r in df.select(tokens_col(F.col("text")).alias("toks")).collect()
    ]
    arrow = tokenize_arrow(pa.array(texts, type=pa.string())).to_pylist()
    assert arrow == jvm


def test_arrow_null_text_is_empty_list():
    import pyarrow as pa

    from hadoop_search_engine_spark.functions.tokenizer import tokenize_arrow

    got = tokenize_arrow(pa.array([None, "x y", None], type=pa.string()))
    assert got.to_pylist() == [[], ["x", "y"], []]
