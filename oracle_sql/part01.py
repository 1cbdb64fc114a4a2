"""Oracle SQL definitions, part 01 (mechanically split from the
former __spark_entry__.oracle_sql body; source lines 4813-5589
of the pre-split file). Board entries defined here:

ann_cosine_topk ann_ivf ann_ivfpq ann_lsh ann_pq blob_range
bm25_topk bm25_topk_and bm25_topk_indexed boolean_search
boolean_sim_topk bpe_token_count broadcast_join_agg
case_insensitive_lookup cjk_bigrams collapsed_search corpus_stats
cosine_dup_pairs curated_docs date_histogram distinct_pairs
doc_stats dsl_runtime_filter dsl_script_score dup_clusters
event_window_agg exact_dedup exact_dup_pairs explode_tokens
extract_links facet_counts filtered_search fingerprint fold_tokens
fuzzy_terms ingest_pipeline inverted_index lang_id lexicon
lm_dirichlet_topk lm_dirichlet_topk_driver ltr_rerank
media_features_decoded minhash_lsh multimodal_metadata ngram_jaccard
ngram_jaccard_capped null_empty_guard or_union_docs orderby_limit
quality_score scan_project_filter semdedup semi_join_orderby simhash
snippets suggest_terms term_frequencies tfidf_classic_topk
token_count top_ngrams tpch_q1 type_cast union_by_name warc_ingest
window_topk_per_group zipf_fit
"""

# flake8: noqa: E501


def add(out, g):
    ANN_K = g.get("ANN_K")
    BM25_B = g.get("BM25_B")
    BM25_K1 = g.get("BM25_K1")
    FLAGSHIP_TERMS = g.get("FLAGSHIP_TERMS")
    _INGEST_PIPE = g.get("_INGEST_PIPE")
    _TF_CTE = g.get("_TF_CTE")
    _TOKS = g.get("_TOKS")
    _dd_count_in = g.get("_dd_count_in")
    _dd_ivf_sql = g.get("_dd_ivf_sql")
    _dd_ivfpq_sql = g.get("_dd_ivfpq_sql")
    _dd_lsh_bucket = g.get("_dd_lsh_bucket")
    _dd_minhash_pairs_subquery = g.get("_dd_minhash_pairs_subquery")
    _dd_minhash_sql = g.get("_dd_minhash_sql")
    _dd_pq_sql = g.get("_dd_pq_sql")
    _dd_simhash_cte = g.get("_dd_simhash_cte")
    _fingerprint_sql = g.get("_fingerprint_sql")
    sql_idf = g.get("sql_idf")
    sql_score = g.get("sql_score")
    sql_tokens_duckdb = g.get("sql_tokens_duckdb")

    from hadoop_search_engine_spark.operators.text_analysis import (
        EN_STOPWORDS,
        ES_STOPWORDS,
    )

    from hadoop_search_engine_spark.functions.analyzer import (
        sql_analyze_duckdb as _sql_analyze,
    )
    from hadoop_search_engine_spark.operators.ingest import (
        sql_pipeline_duckdb as _sql_pipeline,
    )

    fold_toks = _sql_analyze(
        sql_tokens_duckdb("translate(text, 'aeiou', 'áéíöü')"), fold=True
    )
    terms_in = ", ".join(f"'{t}'" for t in FLAGSHIP_TERMS)
    snip_least = ", ".join(
        f"nullif(position('{t}' IN lo), 0)" for t in FLAGSHIP_TERMS
    )
    snip_alt = "|".join(FLAGSHIP_TERMS)
    idf = sql_idf("c.n", "d.df")
    score = sql_score("tf.tf", "dl.doc_len", idf, "c.avgdl", BM25_K1, BM25_B)

    en_cnt = _dd_count_in("toks", EN_STOPWORDS)
    es_cnt = _dd_count_in("toks", ES_STOPWORDS)
    stop_cnt = _dd_count_in("toks", EN_STOPWORDS + ES_STOPWORDS)

    out = {
        "explode_tokens": f"SELECT doc_id, unnest({_TOKS}) AS term FROM documents",
        "term_frequencies": f"WITH {_TF_CTE} SELECT term, doc_id, tf FROM tf",
        "doc_stats": f"WITH {_TF_CTE} SELECT doc_id, sum(tf)::bigint AS doc_len FROM tf GROUP BY doc_id",
        "corpus_stats": f"""
            WITH {_TF_CTE}, dl AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY doc_id)
            SELECT count(*) AS n_docs, round(avg(doc_len), 6) AS avgdl FROM dl
        """,
        "inverted_index": f"""
            WITH {_TF_CTE}
            SELECT term, count(*) AS df,
                   string_agg(doc_id::varchar, ',' ORDER BY doc_id) AS postings
            FROM tf GROUP BY term
        """,
        "lexicon": f"""
            WITH {_TF_CTE}, n AS (SELECT count(*) AS n FROM documents)
            SELECT term, count(*) AS df,
                   round(ln(1.0 + ((SELECT n FROM n) - count(*) + 0.5) / (count(*) + 0.5)), 6) AS idf
            FROM tf GROUP BY term
        """,
        "bm25_topk": f"""
            WITH {_TF_CTE},
            dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
            c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
            d AS (SELECT term, count(*)::double AS df FROM tf WHERE term IN ({terms_in}) GROUP BY term),
            scored AS (
              SELECT tf.doc_id, sum({score}) AS score
              FROM tf
              JOIN d ON tf.term = d.term
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN c
              GROUP BY tf.doc_id
            )
            SELECT doc_id, round(score, 4) AS score
            FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
        """,
        # boolean flagship: spark AND (query OR merge) NOT vector —
        # eligibility via per-leaf presence flags, score over the
        # positive terms only (same BM25 sum as bm25_topk)
        "boolean_search": f"""
            WITH {_TF_CTE},
            dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
            c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
            d AS (SELECT term, count(*)::double AS df FROM tf
                  WHERE term IN ('merge', 'query', 'spark') GROUP BY term),
            pres AS (
              SELECT doc_id,
                     bool_or(term = 'spark')  AS has_spark,
                     bool_or(term = 'query')  AS has_query,
                     bool_or(term = 'merge')  AS has_merge,
                     bool_or(term = 'vector') AS has_vector
              FROM tf GROUP BY doc_id
            ),
            scored AS (
              SELECT tf.doc_id, sum({score}) AS score
              FROM tf
              JOIN d ON tf.term = d.term
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN c
              GROUP BY tf.doc_id
            )
            SELECT s.doc_id, round(s.score, 4) AS score
            FROM scored s JOIN pres p ON s.doc_id = p.doc_id
            WHERE p.has_spark AND (p.has_query OR p.has_merge)
              AND NOT p.has_vector
            ORDER BY score DESC, s.doc_id ASC LIMIT 20
        """,
        "collapsed_search": f"""
            WITH {_TF_CTE},
            dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
            c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
            d AS (SELECT term, count(*)::double AS df FROM tf WHERE term IN ({terms_in}) GROUP BY term),
            scored AS (
              SELECT tf.doc_id, sum({score}) AS score
              FROM tf
              JOIN d ON tf.term = d.term
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN c
              GROUP BY tf.doc_id
            ),
            top AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id ASC LIMIT 50),
            keyed AS (
              SELECT t.doc_id, dd.lang, t.score,
                     row_number() OVER (
                       PARTITION BY dd.lang
                       ORDER BY t.score DESC, t.doc_id ASC
                     ) AS rn
              FROM top t JOIN documents dd ON t.doc_id = dd.doc_id
            )
            SELECT doc_id, lang, round(score, 4) AS score
            FROM keyed WHERE rn = 1
            ORDER BY score DESC, doc_id ASC LIMIT 20
        """,
        "filtered_search": f"""
            WITH {_TF_CTE},
            dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
            c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
            d AS (SELECT term, count(*)::double AS df FROM tf WHERE term IN ({terms_in}) GROUP BY term),
            scored AS (
              SELECT tf.doc_id, sum({score}) AS score
              FROM tf
              JOIN d ON tf.term = d.term
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN c
              GROUP BY tf.doc_id
            )
            SELECT doc_id, round(score, 4) AS score
            FROM scored
            WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
            ORDER BY score DESC, doc_id ASC LIMIT 20
        """,
        "bm25_topk_and": f"""
            WITH {_TF_CTE},
            dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
            c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
            d AS (SELECT term, count(*)::double AS df FROM tf WHERE term IN ({terms_in}) GROUP BY term),
            scored AS (
              SELECT tf.doc_id, sum({score}) AS score
              FROM tf
              JOIN d ON tf.term = d.term
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN c
              GROUP BY tf.doc_id
              HAVING count(DISTINCT tf.term) = {len(FLAGSHIP_TERMS)}
            )
            SELECT doc_id, round(score, 4) AS score
            FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
        """,
        "or_union_docs": f"""
            WITH {_TF_CTE}
            SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})
        """,
        "suggest_terms": f"""
            WITH {_TF_CTE}
            SELECT term, count(*)::bigint AS df FROM tf
            WHERE term LIKE 's%'
            GROUP BY term ORDER BY df DESC, term ASC LIMIT 10
        """,
        "fuzzy_terms": f"""
            WITH {_TF_CTE},
            v AS (SELECT term, count(*)::bigint AS df FROM tf GROUP BY term)
            SELECT term, levenshtein(term, 'scann')::int AS dist, df
            FROM v WHERE levenshtein(term, 'scann') <= 1
            ORDER BY dist ASC, df DESC, term ASC LIMIT 5
        """,
        "facet_counts": f"""
            WITH {_TF_CTE},
            m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in}))
            SELECT d.lang, count(*)::bigint AS n_docs
            FROM documents d JOIN m ON d.doc_id = m.doc_id
            GROUP BY d.lang
        """,
        "snippets": f"""
            WITH {_TF_CTE},
            m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
            d AS (SELECT dd.doc_id, dd.text, lower(dd.text) AS lo
                  FROM documents dd JOIN m ON dd.doc_id = m.doc_id),
            p AS (SELECT doc_id, text, least({snip_least}) AS fp FROM d)
            SELECT doc_id,
                   coalesce(fp, 0) AS match_pos,
                   regexp_replace(
                       substr(text, greatest(coalesce(fp, 1) - 40, 1), 80),
                       '\\b({snip_alt})\\b', '[\\1]', 'gi'
                   ) AS snippet
            FROM p
        """,
        "case_insensitive_lookup": f"""
            WITH {_TF_CTE}
            SELECT term, count(*) AS df, sum(tf)::bigint AS total_tf
            FROM tf WHERE term = lower('SPARK') GROUP BY term
        """,
        "scan_project_filter": """
            SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
            WHERE l_shipdate < '1996-01-01' AND l_quantity > 45
        """,
        "null_empty_guard": """
            SELECT lang, count(*) AS n FROM documents
            WHERE text IS NOT NULL AND text != '' GROUP BY lang
        """,
        "type_cast": """
            SELECT c_custkey, c_custkey::varchar || '-' || c_mktsegment AS entity
            FROM customer
        """,
        "distinct_pairs": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        "union_by_name": """
            WITH u AS (
              SELECT c_name AS entity, 'customer' AS kind FROM customer
              UNION ALL
              SELECT s_name, 'supplier' FROM supplier
              UNION ALL
              SELECT n_name, 'nation' FROM nation
            )
            SELECT kind, count(*) AS n FROM u GROUP BY kind
        """,
        "semi_join_orderby": """
            SELECT o_orderkey, o_orderdate::varchar AS o_date, o_totalprice
            FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
            ORDER BY o_date DESC, o_orderkey ASC LIMIT 50
        """,
        "broadcast_join_agg": """
            SELECT p_brand, count(*) AS n,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "orderby_limit": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "window_topk_per_group": """
            SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
              SELECT c_nationkey, c_custkey, c_acctbal,
                     row_number() OVER (PARTITION BY c_nationkey
                                        ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
              FROM customer
            ) WHERE rn <= 3
        """,
        "exact_dedup": """
            SELECT min(doc_id) AS doc_id, count(*) AS dup_count
            FROM (SELECT doc_id, md5(text) AS digest FROM documents)
            GROUP BY digest
        """,
        "ngram_jaccard": f"""
            WITH tok AS (
              SELECT doc_id, {_TOKS} AS toks FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     array_to_string(toks[i : i + 2], ' ') AS shingle
              FROM tok, unnest(range(1, len(toks) - 1)) AS t(i)
              WHERE len(toks) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
              FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id
            )
            SELECT a, b,
                   round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE inter / (sa.sz + sb.sz - inter) >= 0.12
        """,
        "ngram_jaccard_capped": f"""
            WITH tok AS (
              SELECT doc_id, {_TOKS} AS toks FROM documents
            ),
            sh0 AS (
              SELECT DISTINCT doc_id,
                     array_to_string(toks[i : i + 2], ' ') AS shingle
              FROM tok, unnest(range(1, len(toks) - 1)) AS t(i)
              WHERE len(toks) >= 3
            ),
            shdf AS (
              SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 20
            ),
            sh AS (SELECT sh0.* FROM sh0 JOIN shdf USING (shingle)),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
              FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id
            )
            SELECT a, b,
                   round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE inter / (sa.sz + sb.sz - inter) >= 0.1
        """,
        "dup_clusters": f"""
            WITH RECURSIVE tok AS (
              SELECT doc_id, {_TOKS} AS toks FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     array_to_string(toks[i : i + 2], ' ') AS shingle
              FROM tok, unnest(range(1, len(toks) - 1)) AS t(i)
              WHERE len(toks) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
              FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id
            ),
            pairs AS (
              SELECT a, b FROM inter
              JOIN sizes sa ON sa.doc_id = a
              JOIN sizes sb ON sb.doc_id = b
              WHERE inter / (sa.sz + sb.sz - inter) >= 0.12
            ),
            edges AS (
              SELECT a AS u, b AS v FROM pairs
              UNION
              SELECT b AS u, a AS v FROM pairs
            ),
            reach(u, v) AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
            )
            SELECT u AS doc_id, least(u, min(v)) AS cluster_id
            FROM reach GROUP BY u
        """,
        "ann_cosine_topk": f"""
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::double[], qv::double[]), 6) AS cosine
            FROM embeddings, q
            ORDER BY cosine DESC, vec_id ASC LIMIT {ANN_K}
        """,
        "cosine_dup_pairs": """
            SELECT x.vec_id AS a, y.vec_id AS b,
                   round(list_cosine_similarity(x.embedding::double[], y.embedding::double[]), 6) AS cosine
            FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
            WHERE x.vec_id < 200 AND y.vec_id < 200
              AND list_cosine_similarity(x.embedding::double[], y.embedding::double[]) >= 0.8
        """,
        "semdedup": """
            WITH src AS (SELECT vec_id, embedding::double[] AS embedding
                         FROM embeddings WHERE vec_id < 200),
            plant AS (
              SELECT vec_id - 1000 AS vec_id,
                     list_transform(embedding, x -> x * 2.0) AS embedding
              FROM src WHERE vec_id IN (3, 7, 11)
            ),
            e AS (SELECT * FROM src UNION ALL SELECT * FROM plant),
            dropped AS (
              SELECT DISTINCT y.vec_id
              FROM e x JOIN e y ON x.vec_id < y.vec_id
              WHERE round(list_cosine_similarity(x.embedding, y.embedding), 6)
                    >= 0.999
            )
            SELECT vec_id FROM e
            WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
            ORDER BY vec_id
        """,
        "ann_lsh": f"""
            WITH b AS (
              SELECT vec_id, embedding,
                     {_dd_lsh_bucket("embedding")} AS bucket
              FROM embeddings
            ),
            qb AS (SELECT bucket AS qbucket, embedding AS qv FROM b WHERE vec_id = 0)
            SELECT b.vec_id,
                   round(list_cosine_similarity(b.embedding::double[], qb.qv::double[]), 6) AS cosine
            FROM b, qb
            WHERE bit_count(xor(b.bucket::bigint, qb.qbucket::bigint)) <= 2
            ORDER BY cosine DESC, b.vec_id ASC LIMIT {ANN_K}
        """,
        "exact_dup_pairs": """
            WITH keyed AS (SELECT doc_id, md5(text) AS digest FROM documents),
            winners AS (SELECT digest, min(doc_id) AS keep_id FROM keyed GROUP BY digest)
            SELECT w.keep_id, k.doc_id AS dup_id
            FROM keyed k JOIN winners w ON k.digest = w.digest
            WHERE k.doc_id != w.keep_id
        """,
        "bpe_token_count": f"""
            SELECT doc_id,
                   coalesce(list_sum(list_transform({_TOKS},
                       t -> greatest(cast(ceil(length(t) / 4.0) AS int), 1))), 0)::bigint
                   AS n_subwords
            FROM documents
        """,
        "token_count": f"SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents",
        "lang_id": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
            SELECT doc_id,
                   CASE WHEN {en_cnt} = 0 AND {es_cnt} = 0 THEN 'und'
                        WHEN {en_cnt} >= {es_cnt} THEN 'en'
                        ELSE 'es' END AS lang_pred
            FROM t
        """,
        "quality_score": f"""
            WITH t AS (
              SELECT doc_id, text, {_TOKS} AS toks,
                     length(text) AS n_chars,
                     length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct
              FROM documents
            )
            SELECT doc_id,
                   round((
                     least(len(toks) / 100.0, 1.0)
                     + CASE WHEN n_chars > 0
                            THEN 1.0 - least(n_punct * 5.0 / n_chars, 1.0)
                            ELSE 0.0 END
                     + CASE WHEN len(toks) > 0
                            THEN least({stop_cnt} * 10.0 / len(toks), 1.0)
                            ELSE 0.0 END
                     + CASE WHEN len(toks) > 0
                            THEN len(list_distinct(toks)) / len(toks)
                            ELSE 0.0 END
                   ) / 4.0, 6) AS quality
            FROM t
        """,
        "minhash_lsh": _dd_minhash_sql(_TOKS),
        "fingerprint": _fingerprint_sql(),
        "simhash": f"""
            WITH {_dd_simhash_cte(_TOKS)}
            SELECT x.doc_id AS a, y.doc_id AS b,
                   bit_count(xor(x.simhash, y.simhash))::int AS hamming
            FROM simsig x JOIN simsig y ON x.doc_id < y.doc_id
            WHERE bit_count(xor(x.simhash, y.simhash)) <= 8
        """,
        "multimodal_metadata": """
            SELECT doc_id, octet_length(text::blob) AS n_bytes,
                   'application/octet-stream' AS media_type
            FROM documents
        """,
        # replay of the deterministic pixel/sample formulas; matching
        # the Spark side certifies the real PNG/WAV encode->decode
        # round trip (exact for integer-valued means: 256 values sum
        # exactly in both engines)
        "media_features_decoded": """
            WITH vals AS (
              SELECT d.doc_id,
                     CASE WHEN d.doc_id % 2 = 0
                          THEN (d.doc_id * 31 + 7 * g.i) % 256
                          ELSE ((d.doc_id * 131 + 17 * g.i) % 65536)
                               - 32768 END AS v
              FROM documents d
              CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS i) g
            )
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'image/png'
                        ELSE 'audio/wav' END AS media_type,
                   count(*)::bigint AS n_vals,
                   round(avg(v), 6) AS v_mean,
                   round(stddev_pop(v), 6) AS v_std,
                   min(v)::bigint AS v_min,
                   max(v)::bigint AS v_max
            FROM vals GROUP BY doc_id
        """,
        "blob_range": """
            -- this DuckDB build has no BLOB substring; the testdata
            -- text is ASCII-only (verified octet_length == length), so
            -- character substring == byte substring here
            SELECT doc_id,
                   md5(substring(text, 11, 100)) AS chunk_md5,
                   octet_length(substring(text, 11, 100)::blob)::int AS chunk_len,
                   octet_length(text::blob)::int AS total_len
            FROM documents
        """,
        "ltr_rerank": f"""
            WITH {_TF_CTE},
            dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
            c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
            d AS (SELECT term, count(*)::double AS df FROM tf WHERE term IN ({terms_in}) GROUP BY term),
            scored AS (
              SELECT tf.doc_id, round(sum({score}), 6) AS bm25
              FROM tf
              JOIN d ON tf.term = d.term
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN c
              GROUP BY tf.doc_id
            ),
            feats AS (
              SELECT 'q1' AS query_id, s.doc_id,
                     round(1.0 / (1.0 + exp(-(0.1
                       + 1.2 * ((s.bm25 - 2.0) / 1.5)
                       + (-0.4) * ((doc.n_chars - 300.0) / 120.0)))), 6)
                       AS ltr_score
              FROM scored s JOIN documents doc ON doc.doc_id = s.doc_id
            )
            SELECT query_id, doc_id, ltr_score,
                   CAST(row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY ltr_score DESC, doc_id ASC) AS INTEGER) AS rank
            FROM feats
            QUALIFY rank <= 20
        """,
        "ingest_pipeline": (
            _sql_pipeline(
                _INGEST_PIPE, ["doc_id", "text", "lang", "source", "n_chars"]
            )
            + " ORDER BY doc_id"
        ),
        "dsl_script_score": f"""
            WITH {_TF_CTE},
            dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
            c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
            d AS (SELECT term, count(*)::double AS df FROM tf WHERE term IN ({terms_in}) GROUP BY term),
            scored AS (
              SELECT tf.doc_id, sum({score}) AS score
              FROM tf
              JOIN d ON tf.term = d.term
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN c
              GROUP BY tf.doc_id
            )
            SELECT s.doc_id,
                   round(s.score * doc.n_chars / 1000.0, 4) AS score
            FROM scored s JOIN documents doc ON doc.doc_id = s.doc_id
            ORDER BY s.score * doc.n_chars / 1000.0 DESC, s.doc_id ASC
            LIMIT 20
        """,
        "dsl_runtime_filter": f"""
            WITH {_TF_CTE},
            dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
            c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
            d AS (SELECT term, count(*)::double AS df FROM tf WHERE term IN ({terms_in}) GROUP BY term),
            scored AS (
              SELECT tf.doc_id, sum({score}) AS score
              FROM tf
              JOIN d ON tf.term = d.term
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN c
              GROUP BY tf.doc_id
            )
            SELECT doc_id, round(score, 4) AS score
            FROM scored
            WHERE doc_id IN (SELECT doc_id FROM documents
                             WHERE n_chars / 100.0 >= 3.0)
            ORDER BY score DESC, doc_id ASC LIMIT 20
        """,
        "extract_links": """
            WITH n AS (SELECT count(*) AS n FROM documents),
            pages AS (
              SELECT 'https://site.example/page/' || CAST(doc_id AS VARCHAR) AS src,
                     '<html><body><a href="https://site.example/page/'
                       || CAST((doc_id + 1) % n.n AS VARCHAR) || '">n</a>'
                       || '<a href="https://site.example/page/'
                       || CAST((doc_id + 2) % n.n AS VARCHAR) || '#frag">n2</a>'
                       || '<a href="mailto:x@y">m</a>'
                       || '<a href="/rel">r</a></body></html>' AS html
              FROM documents, n
            ),
            links AS (
              SELECT src, unnest(regexp_extract_all(html, 'href="([^"#]+)', 1)) AS dst
              FROM pages
            )
            SELECT DISTINCT src, dst
            FROM links
            WHERE (dst LIKE 'http://%' OR dst LIKE 'https://%') AND dst <> src
            ORDER BY src, dst
        """,
        "top_ngrams": f"""
            WITH t AS (SELECT {_TOKS} AS toks FROM documents),
            g AS (
              SELECT array_to_string(list_slice(toks, i, i + 1), ' ') AS gram
              FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t)
            )
            SELECT gram, count(*) AS n_occurrences
            FROM g GROUP BY gram
            ORDER BY n_occurrences DESC, gram
            LIMIT 50
        """,
        "zipf_fit": f"""
            WITH c AS (
              SELECT term, count(*) AS cnt
              FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
              GROUP BY term
            ),
            r AS (
              SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, term ASC) AS DOUBLE)) AS lx,
                     ln(CAST(cnt AS DOUBLE)) AS ly
              FROM c
            )
            SELECT round(regr_slope(ly, lx), 6) AS slope,
                   round(regr_intercept(ly, lx), 6) AS intercept,
                   round(regr_r2(ly, lx), 6) AS r2,
                   count(*) AS n_terms
            FROM r
        """,
        "fold_tokens": f"""
            SELECT doc_id,
                   unnest({fold_toks}) AS term
            FROM documents
        """,
        "cjk_bigrams": """
            WITH h AS (
              SELECT doc_id,
                     substr(translate(regexp_replace(text, '[^a-z]', '', 'g'),
                                      'abcdefghijklmnopqrstuvwxyz',
                                      '一二三四五六七八九十百千万億兆京垓春夏秋冬山川田月'),
                            1, 12) AS s
              FROM documents
            ),
            e AS (
              SELECT doc_id, s, unnest(range(1, length(s))) AS i
              FROM h WHERE length(s) >= 2
            )
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, substr(s, i, 2) AS bigram
            FROM e
        """,
        "warc_ingest": """
            SELECT 'https://site.example/page/' || CAST(doc_id AS VARCHAR) AS url,
                   md5('<html><body><p>' || text || '</p></body></html>') AS html_md5,
                   CAST(200 AS BIGINT) AS http_status,
                   'text/html' AS mime
            FROM documents
            ORDER BY url
        """,
        "event_window_agg": """
            SELECT epoch(date_trunc('hour', ts))::bigint AS win_start, event_type,
                   count(*) AS n, round(sum(value), 2) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "date_histogram": """
            WITH b AS (
              SELECT date_trunc('week', ts) AS bucket, count(*) AS n_docs
              FROM events WHERE ts IS NOT NULL GROUP BY 1
            ),
            span AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM b),
            grid AS (
              SELECT unnest(generate_series(lo, hi, INTERVAL 7 DAY)) AS bucket
              FROM span WHERE lo IS NOT NULL
            )
            SELECT epoch(g.bucket)::bigint AS bucket_ts,
                   coalesce(b.n_docs, 0)::bigint AS n_docs
            FROM grid g LEFT JOIN b USING (bucket)
        """,
        "ann_ivf": _dd_ivf_sql(n_centroids=8, n_iters=2, n_probe=4, k=ANN_K),
        "ann_pq": _dd_pq_sql(m=8, nbits=3, n_iters=2, k=ANN_K, dim=64),
        "ann_ivfpq": _dd_ivfpq_sql(n_centroids=8, ivf_iters=2, m=8, nbits=3,
                                   pq_iters=2, n_probe=4, k=ANN_K, dim=64),
        # rows-only (non-SQL-expressible): media_features (stubbed
        # decode) — plumbing shape is pytest-verified instead
    }
    # the composed curation pipeline (annotate -> filter -> exact dedup
    # -> minhash near-dedup, operators/curate.py): every stage already
    # has an exact SQL replay, so the end-to-end result does too
    from hadoop_search_engine_spark.functions.hashes import sql_murmur3_u32_duckdb

    mm_w = sql_murmur3_u32_duckdb("_w")
    fp_core = (
        f"coalesce(list_reduce(list_prepend(0::bigint, "
        f"list_transform(toks, _w -> {mm_w})), "
        f"(_acc, _h) -> (_acc * 31 + _h) % {(1 << 56) - 5}), 0)::bigint"
    )
    lang_core = (
        f"CASE WHEN {en_cnt} = 0 AND {es_cnt} = 0 THEN 'und' "
        f"WHEN {en_cnt} >= {es_cnt} THEN 'en' ELSE 'es' END"
    )
    quality_core = f"""round((
        least(len(toks) / 100.0, 1.0)
        + CASE WHEN length(text) > 0
               THEN 1.0 - least((length(text)
                    - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                    * 5.0 / length(text), 1.0)
               ELSE 0.0 END
        + CASE WHEN len(toks) > 0
               THEN least({stop_cnt} * 10.0 / len(toks), 1.0)
               ELSE 0.0 END
        + CASE WHEN len(toks) > 0
               THEN len(list_distinct(toks)) / len(toks)
               ELSE 0.0 END
      ) / 4.0, 6)"""
    out["curated_docs"] = f"""
        WITH toks0 AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
        ann AS (
          SELECT doc_id, text, toks,
                 len(toks) AS n_tokens,
                 {lang_core} AS lang_pred,
                 {quality_core} AS quality,
                 {fp_core} AS fingerprint
          FROM toks0
        ),
        s1 AS (
          SELECT * FROM ann
          WHERE n_tokens >= 5 AND n_tokens <= 100000
            AND quality >= 0.3 AND lang_pred IN ('en', 'es')
        ),
        w AS (
          SELECT min(doc_id) AS doc_id
          FROM (SELECT doc_id, md5(text) AS dg FROM s1) GROUP BY dg
        ),
        s2 AS (SELECT s1.* FROM s1 JOIN w USING (doc_id)),
        drops AS (
          SELECT DISTINCT b AS doc_id
          FROM {_dd_minhash_pairs_subquery("s2", 0.5)} p
        )
        SELECT doc_id, n_tokens, lang_pred, quality, fingerprint
        FROM s2 ANTI JOIN drops USING (doc_id)
    """
    # the indexed serving paths answer the SAME queries as the
    # exhaustive scorers — the oracle certifies the production engine
    # (compressed postings + WAND/dense/driver serving), not just the
    # DataFrame baseline
    out["bm25_topk_indexed"] = out["bm25_topk"]
    # pluggable similarities (operators/ranking.py) — each formula
    # replayed from raw tokens; round(,4) absorbs summation-order ulps
    out["lm_dirichlet_topk"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        tot AS (SELECT sum(doc_len) AS t FROM dl),
        d AS (SELECT term, sum(tf)::double AS ctf FROM tf
              WHERE term IN ({terms_in}) GROUP BY term),
        scored AS (
          SELECT tf.doc_id,
                 sum(greatest(0.0,
                     ln(1.0 + tf.tf / (2000.0 * (d.ctf / tot.t)))
                     + ln(2000.0 / (dl.doc_len + 2000.0)))) AS score
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN tot
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    out["lm_dirichlet_topk_driver"] = out["lm_dirichlet_topk"]
    out["tfidf_classic_topk"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN ({terms_in}) GROUP BY term),
        scored AS (
          SELECT tf.doc_id,
                 sum(pow(1.0 + ln(c.n / (d.df + 1.0)), 2)
                     * sqrt(tf.tf) / sqrt(dl.doc_len)) AS score
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    out["boolean_sim_topk"] = f"""
        WITH {_TF_CTE},
        scored AS (
          SELECT doc_id, count(*)::double AS score
          FROM tf WHERE term IN ({terms_in}) GROUP BY doc_id
        )
        SELECT doc_id, round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    # time-routed search: replay the month routing (periods with any
    # doc in range), global stats over the selected periods, per-doc
    # range eligibility — naive TIMESTAMP arithmetic, tz-free
    _tpi_toks = sql_tokens_duckdb("sel.text")
    _tpi_idf = sql_idf("c.n", "d.df")

    # export this part's locals for later parts (exact closure
    # semantics of the original single-function implementation)
    g.update({k: v for k, v in locals().items()
              if k not in ('out', 'g') and not k.startswith('__')})
    return out
