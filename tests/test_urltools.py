from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators.urltools import (
    blocklist_filter,
    cap_per_domain,
    domain_stats,
    normalize_url,
    registrable_domain,
    sql_normalize_url_duckdb,
    sql_registrable_domain_duckdb,
    url_dedup,
    with_url_columns,
)

TRICKY_URLS = [
    "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
    "https://example.com:443/a/b",
    "https://example.com:8443/a/b",
    "http://user:pw@Example.com/a",
    "https://news.CO.uk/path//",
    "http://example.com",
    "http://example.com/?",
    "http://example.com/?#",
    "http://example.com/?fbclid=abc",
    "http://example.com/?z=1&a=2&a=1",
    "http://example.com/a?gclid=1&utm_medium=m&keep=1",
    "http://sub.a.blog.co.uk/x#y",
    "ftp://Files.example.org:21/pub/",
    "  not a url  ",
    "relative/path?x=1",
    "http://example.com/a///",
    "http://example.com/%7Euser/?UTM_source=keepme",
    "https://xn--bcher-kva.example/a?m=ü",
    "http://a.b/?=1&x=&y",
    "http://example.com:/a",
]


def _spark_norm(spark, urls, strip_www=False):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [
        r["n"]
        for r in df.select(
            normalize_url(F.col("url"), strip_www=strip_www).alias("n")
        ).collect()
    ]


def _duck_norm(urls, strip_www=False):
    con = duckdb.connect()
    expr = sql_normalize_url_duckdb("url", strip_www=strip_www)
    con.execute("CREATE TABLE u (i INT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)", list(enumerate(urls)))
    return [
        r[0]
        for r in con.execute(
            f"SELECT {expr} FROM u ORDER BY i"
        ).fetchall()
    ]


def test_normalize_golden_vectors(spark):
    got = _spark_norm(spark, TRICKY_URLS)
    expect = {
        "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag":
            "http://www.example.com/a/b?a=1&b=2",
        "https://example.com:443/a/b": "https://example.com/a/b",
        "https://example.com:8443/a/b": "https://example.com:8443/a/b",
        "http://user:pw@Example.com/a": "http://example.com/a",
        "https://news.CO.uk/path//": "https://news.co.uk/path",
        "http://example.com": "http://example.com/",
        "http://example.com/?": "http://example.com/",
        "http://example.com/?#": "http://example.com/",
        "http://example.com/?fbclid=abc": "http://example.com/",
        "http://example.com/?z=1&a=2&a=1":
            "http://example.com/?a=1&a=2&z=1",
        "http://example.com/a?gclid=1&utm_medium=m&keep=1":
            "http://example.com/a?keep=1",
        "  not a url  ": "not a url",
        "relative/path?x=1": "relative/path?x=1",
        "http://example.com/a///": "http://example.com/a",
        # only scheme+host lowercase; params are case-sensitive, so
        # UTM_source is NOT utm_* and survives as-is
        "http://example.com/%7Euser/?UTM_source=keepme":
            "http://example.com/%7Euser?UTM_source=keepme",
    }
    by_input = dict(zip(TRICKY_URLS, got))
    for k, v in expect.items():
        assert by_input[k] == v, (k, by_input[k])


def test_normalize_spark_duckdb_parity(spark):
    for strip in (False, True):
        assert _spark_norm(spark, TRICKY_URLS, strip) == _duck_norm(
            TRICKY_URLS, strip
        )


def test_normalize_strip_www_only_once_and_only_prefix(spark):
    urls = ["http://www.www.example.com/a", "http://notwww.example.com/a"]
    got = _spark_norm(spark, urls, strip_www=True)
    assert got == [
        "http://www.example.com/a",
        "http://notwww.example.com/a",
    ]


DOMAIN_CASES = [
    ("example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    ("news.co.uk", "news.co.uk"),
    ("a.news.co.uk", "news.co.uk"),
    ("deep.a.news.co.uk", "news.co.uk"),
    ("localhost", "localhost"),
    ("com", "com"),
    ("x.gov.uk", "x.gov.uk"),
    ("sub.x.gov.uk", "x.gov.uk"),
    ("a.com.br", "a.com.br"),
    ("b.a.com.br", "a.com.br"),
]


def test_registrable_domain_cases_and_parity(spark):
    hosts = [h for h, _ in DOMAIN_CASES]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    got = [
        r["d"]
        for r in df.select(
            registrable_domain(F.col("host")).alias("d")
        ).collect()
    ]
    assert got == [d for _, d in DOMAIN_CASES]
    con = duckdb.connect()
    con.execute("CREATE TABLE h (i INT, host VARCHAR)")
    con.executemany("INSERT INTO h VALUES (?, ?)", list(enumerate(hosts)))
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {sql_registrable_domain_duckdb('host')} FROM h ORDER BY i"
        ).fetchall()
    ]
    assert duck == got


def _crawl_frame(spark, n=120):
    rows = []
    hosts = ["a.example.com", "WWW.b.co.uk", "c.org", "big.site.com"]
    for i in range(n):
        host = hosts[i % len(hosts)]
        # every third row is a re-fetch of page (i % 10) with tracking noise
        page = (i % 10) if i % 3 == 0 else i
        noise = "?utm_source=x" if i % 2 == 0 else ""
        rows.append((i, f"http://{host}/p/{page}{noise}", 100 + i))
    return spark.createDataFrame(rows, ["doc_id", "url", "n_chars"])


def test_url_dedup_lowest_id_wins_and_keys_unique(spark):
    docs = _crawl_frame(spark)
    out = url_dedup(docs).collect()
    keys = [r["url_norm"] for r in out]
    assert len(keys) == len(set(keys))
    # winner per key is the minimum doc_id of that key's group
    full = docs.withColumn(
        "url_norm", normalize_url(F.col("url"), strip_www=True)
    ).collect()
    groups: dict[str, list[int]] = {}
    for r in full:
        groups.setdefault(r["url_norm"], []).append(r["doc_id"])
    expect = {k: min(v) for k, v in groups.items()}
    assert {r["url_norm"]: r["doc_id"] for r in out} == expect


def test_url_dedup_is_partitioning_invariant(spark):
    docs = _crawl_frame(spark)
    a = sorted(r["doc_id"] for r in url_dedup(docs).collect())
    b = sorted(
        r["doc_id"] for r in url_dedup(docs.repartition(7)).collect()
    )
    assert a == b


def test_domain_stats_shares_sum_to_one(spark):
    docs = _crawl_frame(spark)
    out = domain_stats(docs).collect()
    assert abs(sum(r["doc_share"] for r in out) - 1.0) < 1e-4
    doms = {r["domain"] for r in out}
    assert doms == {"example.com", "b.co.uk", "c.org", "site.com"}
    assert sum(r["n_docs"] for r in out) == docs.count()


def test_cap_per_domain_respects_cap_and_is_deterministic(spark):
    docs = _crawl_frame(spark)
    out = cap_per_domain(docs, 5)
    counts = (
        with_url_columns(out)
        .groupBy("domain")
        .count()
        .collect()
    )
    assert all(r["count"] <= 5 for r in counts)
    again = sorted(r["doc_id"] for r in cap_per_domain(docs.repartition(5), 5).collect())
    assert sorted(r["doc_id"] for r in out.collect()) == again


def test_cap_per_domain_skew_path_identical_to_plain(spark):
    docs = _crawl_frame(spark, n=200)
    for n in (1, 3, 17):
        plain = sorted(
            r["doc_id"] for r in cap_per_domain(docs, n).collect()
        )
        skew = sorted(
            r["doc_id"]
            for r in cap_per_domain(docs, n, skew_buckets=8).collect()
        )
        assert plain == skew, n


def test_cap_per_domain_validates_args(spark):
    docs = _crawl_frame(spark, n=8)
    with pytest.raises(ValueError):
        cap_per_domain(docs, 0)
    with pytest.raises(ValueError):
        cap_per_domain(docs, 2, skew_buckets=3)


def test_blocklist_filter_drops_whole_domain(spark):
    docs = _crawl_frame(spark)
    blocked = spark.createDataFrame([("example.com",)], ["domain"])
    out = blocklist_filter(docs, blocked)
    doms = {
        r["domain"] for r in with_url_columns(out).select("domain").collect()
    }
    assert "example.com" not in doms
    assert out.count() == docs.count() - docs.count() // 4 * 1


def test_with_url_columns_adds_three_keys(spark):
    docs = _crawl_frame(spark, n=8)
    out = with_url_columns(docs)
    assert {"url_norm", "host", "domain"} <= set(out.columns)
    r = out.where(F.col("doc_id") == 1).collect()[0]
    assert r["host"] == "www.b.co.uk".replace("www.", "")
    assert r["domain"] == "b.co.uk"


def test_curate_cli_url_stages(spark, tiny_corpus, tmp_path):
    """End-to-end: the curate CLI's URL stages (dedup + domain cap)
    run before the text pipeline and write a lineage report."""
    import json

    from jobs.curate import main as curate_main

    inp = str(tmp_path / "docs")
    out = str(tmp_path / "curated")
    tiny_corpus.write.parquet(inp)
    blocked = str(tmp_path / "blocked")
    spark.createDataFrame(
        [("no-such-domain.example",)], ["domain"]
    ).write.parquet(blocked)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        curate_main([
            "--input", inp, "--output", out,
            "--url-dedup", "--blocklist", blocked,
            "--cap-per-domain", "100",
            "--min-tokens", "1", "--min-quality", "0.0",
            "--langs", "en,es,und",
        ])
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["docs_out"] >= 1
    got = spark.read.parquet(out)
    assert got.count() == report["docs_out"]


def test_url_pattern_filter_defaults_and_parity(spark):
    import duckdb

    from hadoop_search_engine_spark.operators.urltools import (
        url_pattern_filter,
        sql_url_pattern_predicate_duckdb,
    )

    urls = [
        (0, "http://a.com/article/1"),
        (1, "http://a.com/?s=spark+query"),
        (2, "http://a.com/tags/python/"),
        (3, "http://a.com/Login"),
        (4, "http://a.com/login-tips"),      # not the login endpoint
        (5, "http://a.com/feed/"),
        (6, "http://a.com/style.css?v=3"),
        (7, "http://a.com/calendar/2026/08"),
        (8, "http://a.com/blog/css-tricks"),  # .css not at path end
    ]
    docs = spark.createDataFrame(urls, ["doc_id", "url"])
    kept = sorted(r["doc_id"] for r in url_pattern_filter(docs).collect())
    assert kept == [0, 4, 8]
    con = duckdb.connect()
    con.execute("CREATE TABLE u (doc_id INT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)", urls)
    duck = sorted(
        r[0] for r in con.execute(
            "SELECT doc_id FROM u WHERE "
            + sql_url_pattern_predicate_duckdb()
        ).fetchall()
    )
    assert duck == kept


def test_extract_links_and_pagerank_loop(spark):
    from hadoop_search_engine_spark.operators.graph import pagerank
    from hadoop_search_engine_spark.operators.urltools import (
        extract_links,
        link_graph_ids,
    )

    def page(url, links):
        body = " ".join(f'<a href="{u}">x</a>' for u in links)
        return f"<html><body>{body}</body></html>".encode()

    a, b, c = ("https://a.ex/p", "https://b.ex/p", "https://c.ex/p")
    docs = spark.createDataFrame(
        [
            (0, a, page(a, [b, c, "mailto:x@y", "/relative",
                            b + "#frag", "https://a.ex/p"])),
            (1, b, page(b, [c])),
            (2, c, page(c, [])),
        ],
        "doc_id long, url string, html binary",
    )
    edges = extract_links(docs)
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == {(a, b), (a, c), (b, c)}  # frag cut -> dup of (a,b);
    # self-link, mailto, relative all dropped

    id_edges = link_graph_ids(edges, docs)
    assert {(r["src"], r["dst"]) for r in id_edges.collect()} == {
        (0, 1), (0, 2), (1, 2),
    }
    ranks = pagerank(id_edges, n_iters=5)
    r = {row["node"] if "node" in row.__fields__ else row[0]: row[-1]
         for row in ranks.collect()}
    # c is linked by both others: highest rank; a by nobody: lowest
    vals = sorted(r.items(), key=lambda kv: -kv[1])
    assert vals[0][0] == 2 and vals[-1][0] == 0


def test_graph_cli(spark, tmp_path, capsys):
    import json

    from pyspark.sql import functions as F

    from jobs.graph import main as graph_main

    n = 20
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://g.ex/p/"), F.col("id").cast("string"))
        .alias("url"),
        F.encode(
            F.concat(
                F.lit('<a href="https://g.ex/p/0">hub</a>'
                      '<a href="https://g.ex/p/'),
                ((F.col("id") + 1) % n).cast("string"),
                F.lit('">n</a>'),
            ),
            "UTF-8",
        ).alias("html"),
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "ranks.parquet")
    graph_main(["--documents", src, "--output", out, "--iters", "4"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["n_docs"] == n
    assert res["top10"][0][0] == 0  # the hub everyone links
    ranks = spark.read.parquet(out)
    assert ranks.columns == ["doc_id", "rank_units"]
    assert ranks.count() == n
