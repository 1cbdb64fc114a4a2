

# ------------------------------------------------------------ aliases


def test_alias_swap_is_atomic_pointer(spark, tiny_corpus, tmp_path):
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.index_maint import (
        drop_alias,
        load_alias,
        read_aliases,
        set_alias,
    )
    from hadoop_search_engine_spark.operators.query_exec import (
        search_topk_rows,
    )

    root = str(tmp_path / "aliases_root")
    a = str(tmp_path / "gen_a")
    b = str(tmp_path / "gen_b")
    build_index(spark, tiny_corpus.select("doc_id", "text"), a,
                num_shards=2, n_buckets=4)
    # generation B indexes HALF the corpus -> observably different
    build_index(spark,
                tiny_corpus.where("doc_id % 2 = 0").select("doc_id", "text"),
                b, num_shards=2, n_buckets=4)
    set_alias(root, "prod", a)
    ix = load_alias(spark, root, "prod")
    before = search_topk_rows(ix, "w00000", k=5)
    assert any(d % 2 == 1 for d, _ in before)
    # flip; the OLD Index object keeps serving generation A
    set_alias(root, "prod", b)
    assert search_topk_rows(ix, "w00000", k=5) == before
    ix2 = load_alias(spark, root, "prod")
    after = search_topk_rows(ix2, "w00000", k=5)
    assert all(d % 2 == 0 for d, _ in after)
    assert read_aliases(root)["prod"].endswith("gen_b")
    drop_alias(root, "prod")
    assert read_aliases(root) == {}
    import pytest as _pytest

    with _pytest.raises(KeyError):
        load_alias(spark, root, "prod")
    with _pytest.raises(ValueError, match="not a built index"):
        set_alias(root, "prod", str(tmp_path / "nope"))


def test_index_usage_top_terms(tiny_index):
    """Per-term disk usage: shares sum to <= 1, ordered by bytes desc,
    df matches the lexicon, and the full listing's share total is 1."""
    from hadoop_search_engine_spark.operators.index_maint import index_usage

    rows = index_usage(tiny_index, top=10).collect()
    assert 0 < len(rows) <= 10
    byts = [r["bytes"] for r in rows]
    assert byts == sorted(byts, reverse=True)
    lex = {r["term"]: r["df"] for r in tiny_index.lexicon.collect()}
    for r in rows:
        assert lex[r["term"]] == r["df"]
        assert 0 < r["bytes_share"] <= 1
    everything = index_usage(tiny_index, top=10**6).collect()
    assert abs(sum(r["bytes_share"] for r in everything) - 1.0) < 1e-3
