"""End-to-end: index build + all query paths vs the NumPy oracle."""

import math

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.corpus import SYNONYMS, reference_queries
from hadoop_search_engine_spark.operators.query_exec import (
    bm25_topk_dataframe,
    or_union_search,
    search_topk,
)


def _pairs(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _assert_rank_and_score_identical(got, want, qtext):
    assert len(got) == len(want), f"{qtext}: {len(got)} vs {len(want)} results"
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gd == wd, f"{qtext}: doc order {got} vs {want}"
        assert math.isclose(gs, ws, rel_tol=1e-12, abs_tol=1e-12), (
            f"{qtext}: score {gs} vs {ws} for doc {gd}"
        )


@pytest.mark.parametrize("algorithm", ["wand", "dense"])
def test_index_topk_matches_oracle_full_query_set(tiny_index, tiny_oracle, algorithm):
    for q in reference_queries():
        want = tiny_oracle.search(q["query_text"], k=q["k"], synonyms=SYNONYMS)
        got = _pairs(
            search_topk(
                tiny_index, q["query_text"], k=q["k"],
                synonyms=SYNONYMS, algorithm=algorithm,
            )
        )
        _assert_rank_and_score_identical(got, want, q["query_text"])


def test_dataframe_scorer_matches_oracle(tiny_corpus, tiny_oracle):
    for q in reference_queries()[:12] + reference_queries()[18:30]:
        want = tiny_oracle.search(q["query_text"], k=q["k"], synonyms=SYNONYMS)
        got = _pairs(
            bm25_topk_dataframe(tiny_corpus, q["query_text"], k=q["k"], synonyms=SYNONYMS)
        )
        _assert_rank_and_score_identical(got, want, q["query_text"])


def test_empty_and_absent_queries(tiny_index, tiny_oracle):
    for qtext in ["zzzzz", "", "   ", "!!??..", "qqq xxx zzz"]:
        assert search_topk(tiny_index, qtext, k=10).count() == len(
            tiny_oracle.search(qtext, k=10)
        )


def test_needle_fixture_hand_checkable(tiny_index, tiny_oracle):
    got = _pairs(search_topk(tiny_index, "needle7", k=10))
    assert sorted(d for d, _ in got) == sorted(d for d, _ in tiny_oracle.search("needle7"))
    # needle7 exists in exactly 3 docs, tf=3 each
    assert len(got) == 3


def test_or_union_compat_matches_reference_semantics(tiny_index, tiny_oracle):
    for qtext in ["needle7 w00000", "w00001 w00002", "needle3 zzz w00005"]:
        want = tiny_oracle.or_union_first_seen(qtext, synonyms=SYNONYMS)
        rows = or_union_search(tiny_index, qtext, synonyms=SYNONYMS).collect()
        got = [(r["doc_id"], r["matched_term"]) for r in sorted(rows, key=lambda r: r["rank"])]
        assert got == want, qtext


def test_lexicon_consistent_with_oracle(tiny_index, tiny_oracle):
    lex = {r["term"]: r["df"] for r in tiny_index.lexicon.collect()}
    assert lex["needle7"] == 3
    assert lex["needle3"] == 1
    for term in ["w00000", "w00001", "w05000"]:
        if term in lex or tiny_oracle.df(term):
            assert lex.get(term, 0) == tiny_oracle.df(term)
    n = tiny_index.stats.n_docs
    assert n == tiny_oracle.n_docs
    assert math.isclose(tiny_index.stats.avgdl, tiny_oracle.avgdl, rel_tol=1e-9)


def test_blocks_are_compressed_and_sorted(tiny_index):
    h = tiny_index.lexicon.where(F.col("term") == "w00000").collect()[0]["term_hash"]
    rows = tiny_index.postings.where(F.col("term_hash") == h).collect()
    assert rows, "head term must exist"
    # head term df ~= N → many blocks across shards
    bs = tiny_index.stats.block_size
    for r in rows:
        assert 1 <= r["n_docs"] <= bs
        assert len(bytes(r["doc_ids"])) < 8 * r["n_docs"]
    # global doc_id order within the term across (shard, block_id)
    ordered = sorted(rows, key=lambda r: (r["shard"], r["block_id"]))
    firsts = [r["first_doc_id"] for r in ordered]
    assert firsts == sorted(firsts)


def test_checkpoints_lineage_counters(tiny_index, tiny_oracle):
    ck = tiny_index.checkpoints.where(F.col("bucket") >= 0)
    agg = ck.agg(
        F.sum("postings").alias("p"), F.sum("tokens").alias("t")
    ).collect()[0]
    want_postings = sum(len(p) for p in tiny_oracle.postings.values())
    want_tokens = sum(tiny_oracle.doc_len.values())
    assert agg["p"] == want_postings
    assert agg["t"] == want_tokens


def test_resume_after_injected_failure(spark, tiny_corpus, tiny_oracle, tmp_path):
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import Index

    out = str(tmp_path / "idx_resume")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(
            spark, tiny_corpus, out, num_shards=4, n_buckets=8,
            block_size=16, n_waves=4, fail_after_waves=2,
        )
    # resume completes the remaining buckets only
    build_index(
        spark, tiny_corpus, out, num_shards=4, n_buckets=8,
        block_size=16, n_waves=4, resume=True,
    )
    idx = Index.load(spark, out)
    ck = {r["bucket"] for r in idx.checkpoints.collect()}
    assert ck == set(range(-1, 8))
    got = _pairs(search_topk(idx, "w00000 w00123", k=10))
    want = tiny_oracle.search("w00000 w00123", k=10)
    _assert_rank_and_score_identical(got, want, "resume query")


def test_index_invariant_across_parallelism(spark, tmp_path):
    """Same corpus, different parallelism → identical index content."""
    from hadoop_search_engine_spark.corpus import gen_documents
    from hadoop_search_engine_spark.operators.doc_ids import assign_doc_ids
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import Index

    def build(nparts, tag):
        docs = assign_doc_ids(
            gen_documents(spark, 150, n_partitions=nparts), num_partitions=nparts
        ).select("doc_id", "text")
        out = str(tmp_path / f"idx_{tag}")
        build_index(spark, docs, out, num_shards=3, n_buckets=4, block_size=16)
        idx = Index.load(spark, out)
        rows = idx.postings.select(
            "term_hash", "shard", "block_id", "first_doc_id",
            F.hex(F.col("doc_ids")).alias("d"), F.hex(F.col("tfs")).alias("t"),
            "n_docs", "max_tf", "min_dl",
        ).collect()
        return sorted(map(tuple, rows))

    assert build(2, "a") == build(5, "b")


def test_index_invariant_across_tokenizer_engines(spark, tmp_path):
    """Arrow (RE2+utf8proc) and JVM (java.util.regex) tokenize paths
    must produce byte-identical indexes — including on the characters
    where the regex/casing engines disagree (\\x0B, İ, final sigma)
    and on null/empty text."""
    from hadoop_search_engine_spark.corpus import gen_documents
    from hadoop_search_engine_spark.operators.doc_ids import assign_doc_ids
    from hadoop_search_engine_spark.operators.index_build import (
        build_index, read_stats,
    )
    from hadoop_search_engine_spark.operators.query_exec import Index

    base = assign_doc_ids(
        gen_documents(spark, 120, n_partitions=3), num_partitions=3
    ).select("doc_id", "text")
    edges = spark.createDataFrame(
        [
            (100001, "a\x0bb c\fd İstanbul ΟΔΟΣ ΣΟΦΙΑ"),
            (100002, None),
            (100003, "   "),
            (100004, "STRASSE ß café w00001"),
        ],
        "doc_id long, text string",
    )
    docs = base.unionByName(edges)

    def build(arrow, tag):
        out = str(tmp_path / f"idx_{tag}")
        build_index(
            spark, docs, out, num_shards=3, n_buckets=4, block_size=16,
            arrow_tokenize=arrow,
        )
        idx = Index.load(spark, out)
        postings = sorted(
            map(
                tuple,
                idx.postings.select(
                    "term_hash", "shard", "block_id", "first_doc_id",
                    F.hex("doc_ids").alias("d"), F.hex("tfs").alias("t"),
                    "n_docs", "max_tf", "min_dl",
                ).collect(),
            )
        )
        lexicon = sorted(
            map(tuple, idx.lexicon.select("term", "term_hash", "df").collect())
        )
        st = read_stats(out)
        return postings, lexicon, (st.n_docs, round(st.avgdl, 9))

    assert build(True, "arrow") == build(False, "jvm")


def test_cogroup_scale_path_matches_broadcast_path(tiny_index, tiny_oracle, monkeypatch):
    """The >20M-doc cogroup path must give identical results to the
    broadcast-dl fast path (both are tested; the threshold just picks)."""
    import hadoop_search_engine_spark.operators.query_exec as qe

    queries = ["needle7 w00000", "w00001 w00002 w00003", "w00000"]
    fast = [_pairs(search_topk(tiny_index, q, k=10)) for q in queries]
    monkeypatch.setattr(qe, "DL_BROADCAST_MAX_DOCS", 0)
    slow = [_pairs(search_topk(tiny_index, q, k=10)) for q in queries]
    assert fast == slow
    for got, q in zip(slow, queries):
        _assert_rank_and_score_identical(
            got, tiny_oracle.search(q, k=10), f"cogroup:{q}"
        )


def test_empty_docs_excluded_from_corpus_stats(spark, tmp_path):
    """Corpora containing token-less docs (empty text, punctuation-only,
    null) must yield the same n_docs/avgdl/scores as the oracle, which
    derives corpus statistics from docs with >= 1 token only."""
    import math

    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import Index
    from hadoop_search_engine_spark.oracle.bm25_oracle import BM25Oracle

    rows = [
        (0, "spark index engine query spark"),
        (1, ""),
        (2, "engine table spark scale"),
        (3, "?!.,"),          # tokenizes to nothing
        (4, None),
        (5, "query table scale engine index"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    oracle = BM25Oracle([(i, t) for i, t in rows])
    assert oracle.n_docs == 3  # only the token-bearing docs

    out = str(tmp_path / "idx_empty")
    stats = build_index(spark, docs, out, n_buckets=4, block_size=16)
    assert stats.n_docs == oracle.n_docs
    assert math.isclose(stats.avgdl, oracle.avgdl, rel_tol=1e-12)

    idx = Index.load(spark, out)
    for q in ["spark engine", "query", "table scale"]:
        got = _pairs(search_topk(idx, q, k=10))
        _assert_rank_and_score_identical(got, oracle.search(q, k=10), q)
    got = _pairs(bm25_topk_dataframe(docs, "spark engine", k=10))
    _assert_rank_and_score_identical(got, oracle.search("spark engine", k=10), "df scorer")


@pytest.mark.parametrize("algorithm", ["wand", "dense"])
def test_conjunctive_mode_matches_bruteforce(tiny_index, tiny_corpus, tiny_oracle, algorithm):
    """mode='and': only docs containing EVERY query term score, with
    the same per-doc scores as OR mode restricted to those docs."""
    for qtext in ["w00000 w00001", "w00000 w00123", "needle7 w00000"]:
        terms = qtext.split()
        # brute-force expectation from the oracle's postings
        want_docs = set.intersection(
            *[set(tiny_oracle.postings.get(t, {})) for t in terms]
        )
        or_scores = dict(tiny_oracle.search(qtext, k=10**6))
        want = sorted(
            ((d, or_scores[d]) for d in want_docs),
            key=lambda e: (-e[1], e[0]),
        )[:10]
        got = _pairs(
            search_topk(tiny_index, qtext, k=10, algorithm=algorithm, mode="and")
        )
        _assert_rank_and_score_identical(got, want, f"and:{qtext}")
        # DataFrame scorer agrees
        got_df = _pairs(bm25_topk_dataframe(tiny_corpus, qtext, k=10, mode="and"))
        _assert_rank_and_score_identical(got_df, want, f"and-df:{qtext}")


def test_conjunctive_absent_term_empty(tiny_index):
    assert search_topk(tiny_index, "w00000 zzzabsent", k=10, mode="and").count() == 0


@pytest.mark.parametrize("algorithm", ["wand", "dense"])
def test_serving_modes_identical(tiny_index, tiny_oracle, algorithm):
    """driver serving (pyarrow read + NumPy scorer, no Spark job) and
    spark serving (broadcast-dl executor scorer) must be score-identical
    to each other and the oracle."""
    for qtext in ["needle7 w00000", "w00001 w00002 w00003", "w00123", "w00000"]:
        drv = _pairs(search_topk(tiny_index, qtext, k=10,
                                 algorithm=algorithm, serving="driver"))
        spk = _pairs(search_topk(tiny_index, qtext, k=10,
                                 algorithm=algorithm, serving="spark"))
        assert drv == spk, f"{algorithm}:{qtext}"
        _assert_rank_and_score_identical(
            drv, tiny_oracle.search(qtext, k=10), f"serving:{qtext}"
        )


def test_materialize_with_snippets(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.query_exec import (
        materialize_with_snippets,
    )

    topk = search_topk(tiny_index, "needle7", k=3)
    out = materialize_with_snippets(topk, tiny_corpus, ["needle7"], width=30).collect()
    assert len(out) == 3
    for r in out:
        assert "needle7" in r["snippet"].lower()
        assert r["match_pos"] > 0
        assert len(r["snippet"]) <= 60


def test_snippet_highlight_marks_whole_words(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.query_exec import (
        materialize_with_snippets,
    )

    topk = search_topk(tiny_index, "needle7", k=3)
    out = materialize_with_snippets(
        topk, tiny_corpus, ["needle7"], width=30, mark=("<b>", "</b>")
    ).collect()
    assert len(out) == 3
    for r in out:
        assert "<b>needle7</b>" in r["snippet"].lower()
        # whole-word only: the needle never appears as a substring of
        # another token in the fixture, so every occurrence is wrapped
        assert "needle7" not in r["snippet"].lower().replace(
            "<b>needle7</b>", ""
        )


def test_suggest_terms_indexed_matches_dataframe(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.query_exec import (
        suggest_terms,
        suggest_terms_dataframe,
    )

    for prefix in ("w0000", "needle", "w", "zzz", ""):
        idx = [(r["term"], r["df"]) for r in suggest_terms(tiny_index, prefix, k=8).collect()]
        df = [(r["term"], r["df"]) for r in suggest_terms_dataframe(tiny_corpus, prefix, k=8).collect()]
        assert idx == df, prefix
    assert suggest_terms(tiny_index, "").count() == 0
    # driver-cached path answers case-insensitively normalized prefixes
    upper = [(r["term"], r["df"]) for r in suggest_terms(tiny_index, "NEEDLE", k=8).collect()]
    plain = [(r["term"], r["df"]) for r in suggest_terms(tiny_index, "needle", k=8).collect()]
    assert upper == plain and plain


def test_fuzzy_terms_indexed_matches_dataframe(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.query_exec import (
        fuzzy_terms,
        fuzzy_terms_dataframe,
    )

    for typo, edits in [("needl7", 1), ("needle", 1), ("w0000", 1), ("xq", 2)]:
        idx = [
            (r["term"], r["dist"], r["df"])
            for r in fuzzy_terms(tiny_index, typo, max_edits=edits, k=8).collect()
        ]
        df = [
            (r["term"], r["dist"], r["df"])
            for r in fuzzy_terms_dataframe(tiny_corpus, typo, max_edits=edits, k=8).collect()
        ]
        assert idx == df, typo
    hits = fuzzy_terms(tiny_index, "needl7", max_edits=1, k=3).collect()
    assert hits and hits[0]["term"] == "needle7"


def test_fuzzy_search_corrects_typos(tiny_index):
    from hadoop_search_engine_spark.operators.query_exec import (
        fuzzy_search_topk,
    )

    want = [(r["doc_id"], r["score"]) for r in search_topk(tiny_index, "needle7", k=5).collect()]
    got = [(r["doc_id"], r["score"]) for r in fuzzy_search_topk(tiny_index, "needl7", k=5).collect()]
    assert got == want and got
    # in-vocab terms are never rewritten
    same = [(r["doc_id"], r["score"]) for r in fuzzy_search_topk(tiny_index, "needle7", k=5).collect()]
    assert same == want
    # uncorrectable term: dropped under or, empty under and
    assert fuzzy_search_topk(tiny_index, "qqqqqqqqq needle7", k=5).count() > 0
    assert fuzzy_search_topk(tiny_index, "qqqqqqqqq needle7", k=5, mode="and").count() == 0


def test_collapse_topk_best_per_key_and_singletons(spark):
    import pandas as pd

    from hadoop_search_engine_spark.operators.query_exec import collapse_topk

    topk = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3, 4, 5], "score": [9.0, 8.0, 7.0, 6.0, 5.0]}
        )
    )
    # docs 1,2 share cluster "a"; 3 alone in "b"; 5 missing -> singleton
    keys = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3, 4], "cluster": ["a", "a", "b", "c"]}
        )
    )
    out = collapse_topk(topk, keys, "cluster").collect()
    assert [(r["doc_id"], r["cluster"]) for r in out] == [
        (1, "a"), (3, "b"), (4, "c"), (5, None),
    ]
    out2 = collapse_topk(topk, keys, "cluster", k=2).collect()
    assert [r["doc_id"] for r in out2] == [1, 3]


def test_index_report_counters(tiny_index, tiny_oracle):
    rep = tiny_index.report()
    assert rep["n_docs"] == tiny_oracle.n_docs
    assert rep["postings"] == sum(len(p) for p in tiny_oracle.postings.values())
    assert rep["tokens"] == sum(tiny_oracle.doc_len.values())
    assert rep["terms"] == len(tiny_oracle.postings)
    # delta+varint: far below the 8(doc)+8(tf) raw bytes per posting
    assert 0 < rep["bytes_per_posting"] < 8
    assert rep["positional"] is False


def test_unicode_corpus_oracle_parity(spark, tmp_path):
    """Non-ASCII text: tokenizer bytes, term hashing, and scores agree
    with the oracle end-to-end."""
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import Index
    from hadoop_search_engine_spark.oracle.bm25_oracle import BM25Oracle

    rows = [
        (0, "café naïve straße crème café"),
        (1, "日本語 テスト 検索 エンジン"),
        (2, "текст поиск система текст café"),
        (3, "plain ascii words only here"),
        (4, "CAFÉ Naïve MIXED case"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    oracle = BM25Oracle(rows)
    out = str(tmp_path / "uidx")
    stats = build_index(spark, docs, out, n_buckets=4, block_size=8)
    assert stats.n_docs == oracle.n_docs
    idx = Index.load(spark, out)
    for q in ["café", "CAFÉ naïve", "日本語 検索", "текст", "straße plain"]:
        got = _pairs(search_topk(idx, q, k=10))
        want = oracle.search(q, k=10)
        _assert_rank_and_score_identical(got, want, f"unicode:{q}")


def test_doc_id_headroom_guard(spark, tmp_path):
    from hadoop_search_engine_spark.operators.index_build import build_index

    docs = spark.createDataFrame(
        [(1 << 43, "overflow doc"), (1, "fine doc")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="2\\^43"):
        build_index(spark, docs, str(tmp_path / "gidx"), n_buckets=4)


def test_resume_rejects_mismatched_params(spark, tiny_corpus, tmp_path):
    from hadoop_search_engine_spark.operators.index_build import build_index

    out = str(tmp_path / "idx_mismatch")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, tiny_corpus, out, num_shards=4, n_buckets=8,
                    block_size=16, n_waves=4, fail_after_waves=1)
    with pytest.raises(ValueError, match="positions"):
        build_index(spark, tiny_corpus, out, num_shards=4, n_buckets=8,
                    block_size=16, n_waves=4, resume=True, positions=True)
    with pytest.raises(ValueError, match="n_buckets"):
        build_index(spark, tiny_corpus, out, num_shards=4, n_buckets=4,
                    block_size=16, n_waves=4, resume=True)


def test_driver_serving_rejects_oversized_index(tiny_index, monkeypatch):
    import hadoop_search_engine_spark.operators.query_exec as qe

    monkeypatch.setattr(qe, "DL_BROADCAST_MAX_DOCS", 0)
    with pytest.raises(ValueError, match="driver serving"):
        search_topk(tiny_index, "w00000", k=5, serving="driver").collect()


# ---------------------------------------------------------------------------
# Filtered search (metadata eligibility mask, global BM25 stats)
# ---------------------------------------------------------------------------


def test_filtered_search_matches_oracle(tiny_index, tiny_corpus, tiny_oracle):
    """doc_filter = every third doc; ranks AND scores must equal the
    oracle's globally-scored ranking restricted to the allowed set."""
    filt = tiny_corpus.where("doc_id % 3 = 0").select("doc_id")
    allowed = {r["doc_id"] for r in filt.collect()}
    for q in reference_queries()[:10]:
        want = tiny_oracle.search(
            q["query_text"], k=q["k"], synonyms=SYNONYMS, allowed=allowed
        )
        got = _pairs(
            search_topk(
                tiny_index, q["query_text"], k=q["k"], synonyms=SYNONYMS,
                doc_filter=filt,
            )
        )
        _assert_rank_and_score_identical(got, want, f"filtered:{q['query_text']}")


def test_filtered_search_refills_topk(tiny_index, tiny_corpus, tiny_oracle):
    """Excluding the global #1 must promote #2 — the mask is applied
    BEFORE the top-k cut, never by post-filtering k results."""
    q = "w00001 w00002"
    full = tiny_oracle.search(q, k=10)
    assert len(full) == 10
    top1 = full[0][0]
    filt = tiny_corpus.where(F.col("doc_id") != top1).select("doc_id")
    got = _pairs(search_topk(tiny_index, q, k=10, doc_filter=filt))
    assert len(got) == 10, "mask must not under-fill k"
    assert top1 not in {d for d, _ in got}
    want = tiny_oracle.search(q, k=10, allowed=set(tiny_oracle.doc_len) - {top1})
    _assert_rank_and_score_identical(got, want, f"refill:{q}")


def test_filtered_dataframe_scorer_matches_indexed(tiny_index, tiny_corpus):
    """Exhaustive 2-scan scorer and indexed cogroup scorer agree under
    the same lang-predicate filter, in both or/and modes."""
    filt = tiny_corpus.where("lang = 'en'").select("doc_id")
    for mode in ("or", "and"):
        exhaustive = _pairs(
            bm25_topk_dataframe(
                tiny_corpus, "w00001 w00002", k=10, mode=mode, doc_filter=filt
            )
        )
        indexed = _pairs(
            search_topk(tiny_index, "w00001 w00002", k=10, mode=mode,
                        doc_filter=filt)
        )
        _assert_rank_and_score_identical(indexed, exhaustive, f"df-vs-idx:{mode}")
        assert exhaustive, "fixture filter should leave matches"


def test_filtered_search_rejects_driver_serving(tiny_index, tiny_corpus):
    filt = tiny_corpus.select("doc_id")
    with pytest.raises(ValueError, match="doc_filter"):
        search_topk(tiny_index, "w00000", k=5, serving="driver",
                    doc_filter=filt)


# ---------------------------------------------------------------------------
# Matched-doc extraction + faceted counts
# ---------------------------------------------------------------------------


def test_matched_docs_indexed_vs_dataframe(tiny_index, tiny_corpus, tiny_oracle):
    from hadoop_search_engine_spark.operators.query_exec import (
        matched_docs, matched_docs_dataframe,
    )

    for q in ["w00001 w00002", "needle7", "w00000 zzzzq", "w00003 w00003"]:
        for mode in ("or", "and"):
            idx = {r["doc_id"] for r in matched_docs(tiny_index, q, mode=mode).collect()}
            df = {r["doc_id"] for r in matched_docs_dataframe(tiny_corpus, q, mode=mode).collect()}
            assert idx == df, f"{q}/{mode}: {len(idx)} vs {len(df)}"
    # oracle cross-check for the or case
    want = {d for t in ["w00001", "w00002"] for d in tiny_oracle.postings.get(t, {})}
    got = {r["doc_id"] for r in matched_docs(tiny_index, "w00001 w00002").collect()}
    assert got == want


def test_matched_docs_empty_and_absent(tiny_index):
    from hadoop_search_engine_spark.operators.query_exec import matched_docs

    assert matched_docs(tiny_index, "").count() == 0
    assert matched_docs(tiny_index, "zzzzq").count() == 0
    assert matched_docs(tiny_index, "w00000 zzzzq", mode="and").count() == 0


def test_facet_counts_matches_bruteforce(tiny_index, tiny_corpus, tiny_oracle):
    from hadoop_search_engine_spark.operators.query_exec import (
        facet_counts, matched_docs,
    )

    matched = matched_docs(tiny_index, "w00001 w00002")
    got = {
        r["lang"]: r["n_docs"]
        for r in facet_counts(matched, tiny_corpus, ["lang"]).collect()
    }
    doc_lang = {r["doc_id"]: r["lang"] for r in tiny_corpus.select("doc_id", "lang").collect()}
    want_docs = {d for t in ["w00001", "w00002"] for d in tiny_oracle.postings.get(t, {})}
    want: dict = {}
    for d in want_docs:
        want[doc_lang[d]] = want.get(doc_lang[d], 0) + 1
    assert got == want
    assert sum(got.values()) == len(want_docs)


def test_term_stats_probe(tiny_corpus, tiny_index):
    from hadoop_search_engine_spark.operators.query_exec import term_stats

    got = {r["term"]: (r["df"], r["idf"])
           for r in term_stats(tiny_index,
                               "w00000 zzzabsent W00000!").collect()}
    assert set(got) == {"w00000"}  # dedup + case fold + absent dropped
    lex = {r["term"]: r
           for r in tiny_index.lexicon.where("term = 'w00000'").collect()}
    assert got["w00000"][0] == lex["w00000"]["df"]
    assert abs(got["w00000"][1] - round(lex["w00000"]["idf"], 6)) < 1e-9
    assert term_stats(tiny_index, "???").count() == 0
