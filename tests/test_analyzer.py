"""Analysis chain: stopwords + stemming (functions/analyzer.py) and
the analyzer-aware index/query integration.

Parity contract (module docstring of analyzer.py): pure Python, the
Spark JVM Column path, and the DuckDB oracle fragment must analyze
byte-identically, and an analyzed index must apply the SAME chain to
queries (stats.json round-trip) — the classic analyzer-mismatch bug
class, pinned here.
"""

from __future__ import annotations

import pytest

from hadoop_search_engine_spark.functions.analyzer import (
    ENGLISH_STOPWORDS,
    analyze,
    analyze_tokens_col,
    analyzed_text_col,
    make_token_fn,
    porter_stem,
    porter_stem_series,
    s_stem,
    sql_analyze_duckdb,
)
from hadoop_search_engine_spark.functions.tokenizer import tokenize, tokens_col

# Golden vectors from the published algorithm (M.F. Porter, "An
# algorithm for suffix stripping", Program 14(3) 1980 — the worked
# examples given alongside each rule).
PORTER_VECTORS = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    # step 1b (+ cleanup)
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
    "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


def test_porter_golden_vectors():
    bad = {
        w: (porter_stem(w), want)
        for w, want in PORTER_VECTORS.items()
        if porter_stem(w) != want
    }
    assert not bad, bad


def test_porter_series_matches_scalar():
    import pandas as pd

    words = list(PORTER_VECTORS) * 3 + ["", "a", "xy", "e5", "spark"]
    out = porter_stem_series(pd.Series(words, dtype=object))
    assert list(out) == [porter_stem(w) for w in words]


def test_s_stem_rules():
    assert s_stem("ponies") == "pony"
    assert s_stem("queries") == "query"
    assert s_stem("tables") == "table"
    assert s_stem("cats") == "cat"
    # guard lists
    assert s_stem("glass") == "glass"      # -ss
    assert s_stem("bus") == "bus"          # -us
    assert s_stem("goes") == "goes"        # -oes
    assert s_stem("trees") == "trees"      # -ees
    assert s_stem("is") == "is"            # len < 3
    assert s_stem("species") == "specy"    # ies wins over es


def test_token_fn_identity_is_none():
    assert make_token_fn((), "none") is None
    fn = make_token_fn(("the",), "none")
    assert fn("the") is None and fn("spark") == "spark"
    fn = make_token_fn((), "s")
    assert fn("tables") == "table"
    with pytest.raises(ValueError):
        make_token_fn((), "bogus")


TRICKY_TEXTS = [
    "The Tables of the Queries, and their Indexes!",
    "a an and are as at be but by for",          # all stopwords
    "glasses buses goes trees species is this",
    "  spark   queries\tengines\nthe tables  ",
    "",
    None,
    "no-suffix words xyz q",
]


def test_roundtrip_property():
    # analyzed text re-tokenizes to exactly the analyzed stream — the
    # property the index build's text rewrite relies on
    for txt in TRICKY_TEXTS:
        for stem in ("none", "s", "porter"):
            toks = analyze(txt, ENGLISH_STOPWORDS, stem)
            assert tokenize(" ".join(toks)) == toks, (txt, stem)


def test_spark_and_duckdb_parity(spark):
    import duckdb

    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.functions.tokenizer import (
        sql_tokens_duckdb,
    )

    rows = [(i, t) for i, t in enumerate(TRICKY_TEXTS)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_spark = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id",
            analyze_tokens_col(
                tokens_col(F.col("text")), ENGLISH_STOPWORDS, "s"
            ).alias("toks"),
        ).collect()
    }
    frag = sql_analyze_duckdb(sql_tokens_duckdb("text"), ENGLISH_STOPWORDS, "s")
    con = duckdb.connect()
    con.execute(
        "create table t(doc_id bigint, text varchar)"
    )
    con.executemany("insert into t values (?, ?)", rows)
    got_duck = dict(
        con.execute(f"select doc_id, {frag} from t").fetchall()
    )
    for i, txt in rows:
        want = analyze(txt, ENGLISH_STOPWORDS, "s")
        assert (got_spark[i] or []) == want, (txt, got_spark[i], want)
        assert (got_duck[i] or []) == want, (txt, got_duck[i], want)


def test_analyzed_text_col_porter_matches_python(spark):
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(TRICKY_TEXTS)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["out"]
        for r in df.select(
            "doc_id",
            analyzed_text_col(
                F.col("text"), ENGLISH_STOPWORDS, "porter"
            ).alias("out"),
        ).collect()
    }
    for i, txt in rows:
        assert got[i] == " ".join(analyze(txt, ENGLISH_STOPWORDS, "porter"))


# ---------------------------------------------------------------------------
# Index integration
# ---------------------------------------------------------------------------

ANALYZED_DOCS = [
    (0, "The spark tables are fast"),
    (1, "a query engine for the sparks and queries"),
    (2, "tables tables tables"),
    (3, "this engine queries the table"),
    (4, "and the of is are to"),          # all stopwords -> empty doc
    (5, "unrelated words entirely"),
]


@pytest.fixture(scope="module")
def analyzed_index(spark, tmp_path_factory):
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import Index

    docs = spark.createDataFrame(ANALYZED_DOCS, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("aix") / "ix")
    build_index(
        spark, docs, out, num_shards=2, n_buckets=4, block_size=8,
        positions=True, stopwords=ENGLISH_STOPWORDS, stem="s",
    )
    return Index.load(spark, out)


def test_analyzer_recorded_in_stats(analyzed_index):
    st = analyzed_index.stats
    assert st.stem == "s"
    assert st.stopwords == tuple(sorted(set(ENGLISH_STOPWORDS)))
    assert analyzed_index.token_fn() is not None


def test_analyzed_index_equals_preanalyzed_build(spark, tmp_path):
    """Building with the analyzer == analyzing the corpus yourself and
    building plain, then querying with pre-analyzed terms — score- and
    rank-identical (the definition of the text-rewrite integration)."""
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import (
        Index,
        search_topk,
    )

    docs = spark.createDataFrame(ANALYZED_DOCS, "doc_id long, text string")
    pre = [
        (i, " ".join(analyze(t, ENGLISH_STOPWORDS, "s")))
        for i, t in ANALYZED_DOCS
    ]
    pre_docs = spark.createDataFrame(pre, "doc_id long, text string")
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, docs, d1, num_shards=2, n_buckets=4, block_size=8,
                stopwords=ENGLISH_STOPWORDS, stem="s")
    build_index(spark, pre_docs, d2, num_shards=2, n_buckets=4, block_size=8)
    ia, ib = Index.load(spark, d1), Index.load(spark, d2)
    q_raw = "The Tables and Queries"
    q_pre = " ".join(analyze(q_raw, ENGLISH_STOPWORDS, "s"))
    got = [(r["doc_id"], r["score"])
           for r in search_topk(ia, q_raw, k=10).collect()]
    want = [(r["doc_id"], r["score"])
            for r in search_topk(ib, q_pre, k=10).collect()]
    assert got == want and got  # non-empty


def test_stopword_only_query_matches_nothing(analyzed_index):
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    assert search_topk(analyzed_index, "the and of", k=5).count() == 0


def test_stemmed_query_form_matches(analyzed_index):
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    # "tables" and "table" stem to the same term; both query forms
    # return the identical result set
    a = [(r["doc_id"], r["score"])
         for r in search_topk(analyzed_index, "tables", k=10).collect()]
    b = [(r["doc_id"], r["score"])
         for r in search_topk(analyzed_index, "table", k=10).collect()]
    assert a == b
    assert {d for d, _ in a} == {0, 2, 3}


def test_phrase_across_removed_stopword(analyzed_index):
    from hadoop_search_engine_spark.operators.query_exec import phrase_search

    # doc 3: "this engine queries the table" -> analyzed
    # "engine query table": the phrase "queries the table" must match
    # contiguously post-removal
    hits = phrase_search(analyzed_index, "queries the table", k=5)
    assert [r["doc_id"] for r in hits.collect()] == [3]


def test_boolean_stopword_clause_drops(analyzed_index):
    from hadoop_search_engine_spark.operators.boolean import (
        search_topk_boolean,
    )
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    got = [(r["doc_id"], r["score"]) for r in
           search_topk_boolean(analyzed_index, "tables AND the", k=10)
           .collect()]
    want = [(r["doc_id"], r["score"]) for r in
            search_topk(analyzed_index, "tables", k=10).collect()]
    assert got == want
    # all-stopword boolean query: empty, not an error
    assert search_topk_boolean(analyzed_index, "the AND a", k=5).count() == 0


def test_merge_refuses_mixed_analyzers(spark, tmp_path):
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.index_maint import (
        merge_indexes,
    )

    docs = spark.createDataFrame(
        ANALYZED_DOCS[:3], "doc_id long, text string"
    )
    d1, d2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    build_index(spark, docs, d1, shard_span=8, n_buckets=4,
                stopwords=ENGLISH_STOPWORDS, stem="s")
    build_index(spark, docs, d2, shard_span=8, n_buckets=4)
    with pytest.raises(ValueError, match="stopwords|stem"):
        merge_indexes(spark, [d1, d2], str(tmp_path / "m"))


def test_porter_index_end_to_end(spark, tmp_path):
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import (
        Index,
        search_topk,
    )

    docs = spark.createDataFrame(
        [
            (0, "the runner was running quickly"),
            (1, "he runs a marathon"),
            (2, "nothing related here"),
        ],
        "doc_id long, text string",
    )
    out = str(tmp_path / "pix")
    build_index(spark, docs, out, num_shards=1, n_buckets=2,
                stopwords=ENGLISH_STOPWORDS, stem="porter")
    ix = Index.load(spark, out)
    # "running", "runs", "run" all stem to "run"
    hits = {r["doc_id"] for r in search_topk(ix, "run", k=10).collect()}
    assert hits == {0, 1}
    hits2 = {r["doc_id"]
             for r in search_topk(ix, "RUNNING!", k=10).collect()}
    assert hits2 == {0, 1}


def test_resume_mismatch_on_analyzer(spark, tmp_path):
    from hadoop_search_engine_spark.operators.index_build import build_index

    docs = spark.createDataFrame(ANALYZED_DOCS, "doc_id long, text string")
    out = str(tmp_path / "rix")
    build_index(spark, docs, out, num_shards=2, n_buckets=4,
                stopwords=("the",), stem="s")
    with pytest.raises(ValueError, match="resume.*differing|differing"):
        build_index(spark, docs, out, num_shards=2, n_buckets=4,
                    resume=True)


def test_streaming_analyzed_compaction_matches_batch(spark, tmp_path):
    """A stream analyzed in its micro-batches, compacted with the same
    analyzer config, serves rank- and score-identically to a batch
    analyzed build over the same documents (modulo dense-id minting:
    compare via urls)."""
    import os

    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.corpus import gen_documents
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import (
        Index,
        materialize,
        search_topk,
    )
    from hadoop_search_engine_spark.streaming.incremental import (
        compact_deltas,
        incremental_tf_sink,
        stream_documents,
    )

    src = str(tmp_path / "in")
    delta = str(tmp_path / "delta")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    gen_documents(spark, 60, n_partitions=1).write.mode("append").parquet(src)

    stream = stream_documents(spark, src, max_files=1)
    q = incremental_tf_sink(
        stream, delta, ckpt, stopwords=ENGLISH_STOPWORDS, stem="s"
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    sidx_dir = str(tmp_path / "sidx")
    compact_deltas(spark, delta, sidx_dir, n_buckets=4, block_size=16,
                   stopwords=ENGLISH_STOPWORDS, stem="s")
    sidx = Index.load(spark, sidx_dir)
    assert sidx.stats.stem == "s" and sidx.stats.stopwords

    from hadoop_search_engine_spark.operators.doc_ids import assign_doc_ids

    docs = assign_doc_ids(gen_documents(spark, 60, n_partitions=1))
    bidx_dir = str(tmp_path / "bidx")
    build_index(spark, docs.select("doc_id", "text"), bidx_dir,
                n_buckets=4, block_size=16,
                stopwords=ENGLISH_STOPWORDS, stem="s")
    bidx = Index.load(spark, bidx_dir)

    q_raw = "the tables and queries of w00007"
    smap = spark.read.parquet(os.path.join(sidx_dir, "doc_map"))
    got = sorted(
        (r["url"], round(r["score"], 9))
        for r in materialize(search_topk(sidx, q_raw, k=20), smap)
        .select("url", "score").collect()
    )
    want = sorted(
        (r["url"], round(r["score"], 9))
        for r in materialize(search_topk(bidx, q_raw, k=20), docs)
        .select("url", "score").collect()
    )
    assert got == want and got
