"""Oracle SQL definitions, part 04 (mechanically split from the
former __spark_entry__.oracle_sql body; source lines 7238-8039
of the pre-split file). Board entries defined here:

adjacency_matrix bm25_topk_pruned boosted_search chunk_docs
classifier_scores classifier_weights decay_search explain_score
fuzzy_search_indexed hybrid_search missing_agg more_like_this
multi_match_cross multifield_search pack_manifest pack_spans
pack_text paginated_search percentile_ranks pinned_search
prefix_search_indexed rank_feature_search ranking_metrics
regexp_search_indexed rescore_search simple_qs snippet_fragments
sorted_search tfidf_top_terms url_pattern_keep
wildcard_search_indexed
"""

# flake8: noqa: E501


def add(out, g):
    BM25_B = g.get("BM25_B")
    BM25_K1 = g.get("BM25_K1")
    FLAGSHIP_TERMS = g.get("FLAGSHIP_TERMS")
    _CLS_ITERS = g.get("_CLS_ITERS")
    _TF_CTE = g.get("_TF_CTE")
    _TOKS = g.get("_TOKS")
    _cls_iter = g.get("_cls_iter")
    _cls_nf = g.get("_cls_nf")
    _math = g.get("_math")
    _mm_sql = g.get("_mm_sql")
    _sig = g.get("_sig")
    i = g.get("i")
    score = g.get("score")
    sql_idf = g.get("sql_idf")
    sql_score = g.get("sql_score")
    t = g.get("t")
    terms_in = g.get("terms_in")

    _cls_cte = f"""
        WITH t AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
        tok AS (
          SELECT doc_id, unnest(t) AS w,
                 unnest(range(1, len(t) + 1)) AS pos, t
          FROM t
        ),
        gram AS (
          SELECT doc_id, w AS g FROM tok
          UNION ALL
          SELECT doc_id, t[pos - 1] || ' ' || w AS g FROM tok WHERE pos > 1
        ),
        gf AS (
          SELECT g, ({_mm_sql("g")}) % {_cls_nf} AS feature
          FROM (SELECT DISTINCT g FROM gram)
        ),
        cfeat AS (
          SELECT DISTINCT gram.doc_id, gf.feature
          FROM gram JOIN gf USING (g)
          UNION ALL
          SELECT doc_id, {_cls_nf} AS feature FROM documents
        ),
        clbl AS (
          SELECT doc_id,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents
        ),
        cn AS (SELECT count(*)::DOUBLE AS n FROM documents),
        w0 AS (SELECT {_cls_nf}::BIGINT AS feature, 0::BIGINT AS wq
               WHERE FALSE),
        {",".join(_cls_iter(i + 1) for i in range(_CLS_ITERS))}
    """
    out["classifier_weights"] = _cls_cte + f"""
        SELECT feature, wq::VARCHAR AS wq FROM w{_CLS_ITERS}
    """
    out["classifier_scores"] = _cls_cte + f"""
        , ms AS (
          SELECT f.doc_id, sum(coalesce(w.wq, 0))::BIGINT AS mm
          FROM cfeat f LEFT JOIN w{_CLS_ITERS} w USING (feature)
          GROUP BY f.doc_id
        )
        SELECT doc_id, mm::VARCHAR AS logit_micro,
               round({_sig}, 6) AS prob
        FROM ms m
    """
    # prefix/wildcard: expansion = lexicon terms matching the pattern,
    # capped by (df desc, term asc) — then the standard BM25 sum over
    # the expanded term set
    def _expansion_bm25(like: str, cap: int) -> str:
        return f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        exp AS (
          SELECT term FROM (
            SELECT term, count(*) AS df FROM tf
            WHERE term LIKE '{like}' GROUP BY term)
          ORDER BY df DESC, term ASC LIMIT {cap}
        ),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN (SELECT term FROM exp) GROUP BY term),
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
        """

    # pruned index: tf filtered to the kept-df band, doc lengths
    # CARRIED from the full corpus, n/avgdl over surviving docs
    out["bm25_topk_pruned"] = f"""
        WITH {_TF_CTE},
        kept AS (
          SELECT term FROM (SELECT term, count(*) AS df FROM tf GROUP BY term)
          WHERE df <= floor(0.79 * (SELECT count(*) FROM documents))
        ),
        ptf AS (SELECT tf.* FROM tf JOIN kept ON tf.term = kept.term),
        dl0 AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        pdocs AS (SELECT DISTINCT doc_id FROM ptf),
        dl AS (SELECT dl0.doc_id, dl0.doc_len FROM dl0 JOIN pdocs
               ON dl0.doc_id = pdocs.doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM ptf
              WHERE term IN ({terms_in}) GROUP BY term),
        scored AS (
          SELECT tf.doc_id, sum({score}) AS score
          FROM ptf tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    # fuzzy search: correct the OOV term in SQL (same (dist, -df,
    # term) candidate order), then the standard BM25 over
    # {'spark', corrected}
    out["fuzzy_search_indexed"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        corr AS (
          SELECT term FROM (
            SELECT term, count(DISTINCT doc_id) AS df,
                   levenshtein(term, 'qery') AS dist
            FROM tf GROUP BY term)
          WHERE dist <= 1
          ORDER BY dist ASC, df DESC, term ASC LIMIT 1
        ),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term = 'spark' OR term IN (SELECT term FROM corr)
              GROUP BY term),
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
    """
    # boosted: BM25 + 0.5 * (n_chars / 1000) over the matched docs
    out["boosted_search"] = f"""
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
               round(s.score + 0.5 * (doc.n_chars / 1000.0), 4) AS score
        FROM scored s JOIN documents doc ON s.doc_id = doc.doc_id
        ORDER BY score DESC, s.doc_id ASC LIMIT 20
    """
    import math as _math

    _two_sigma2 = 2.0 * (-(800.0 * 800.0) / (2.0 * _math.log(0.5)))
    out["decay_search"] = f"""
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
        dist AS (
          SELECT s.doc_id, s.score,
                 greatest(abs(doc.n_chars::double - 1000.0) - 0.0, 0.0) AS dd
          FROM scored s JOIN documents doc ON s.doc_id = doc.doc_id
        )
        SELECT doc_id,
               round(score * exp(-(dd * dd) / {_two_sigma2!r}), 4) AS score
        FROM dist
        ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    # multi-field: each field's BM25 over its OWN token stream /
    # statistics, weighted union + per-doc sum, top-20
    from hadoop_search_engine_spark.functions.tokenizer import (
        sql_tokens_duckdb as _sqltok,
    )

    _stoks = _sqltok("source")
    out["multifield_search"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN ('spark', 'src1') GROUP BY term),
        t_scored AS (
          SELECT tf.doc_id, 1.0 * sum({score}) AS score
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          GROUP BY tf.doc_id
        ),
        stoks AS (SELECT doc_id, unnest({_stoks}) AS term FROM documents),
        stf AS (SELECT term, doc_id, count(*) AS tf
                FROM stoks GROUP BY term, doc_id),
        sdl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM stf GROUP BY doc_id),
        sc AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM sdl),
        sd AS (SELECT term, count(*)::double AS df FROM stf
               WHERE term IN ('spark', 'src1') GROUP BY term),
        s_scored AS (
          SELECT stf.doc_id,
                 2.0 * sum(
                   ln(1.0 + (sc.n - sd.df + 0.5) / (sd.df + 0.5))
                   * (stf.tf * ({BM25_K1} + 1.0))
                   / (stf.tf + {BM25_K1} * (1.0 - {BM25_B}
                      + {BM25_B} * sdl.doc_len / sc.avgdl))
                 ) AS score
          FROM stf
          JOIN sd ON stf.term = sd.term
          JOIN sdl ON stf.doc_id = sdl.doc_id
          CROSS JOIN sc
          GROUP BY stf.doc_id
        ),
        u AS (SELECT * FROM t_scored UNION ALL SELECT * FROM s_scored)
        SELECT doc_id, round(sum(score), 4) AS score
        FROM u GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    # rank_feature: BM25 (4dp) + boost * saturation(n_chars) (6dp)
    out["rank_feature_search"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN ({terms_in}) GROUP BY term),
        scored AS (
          SELECT tf.doc_id, round(sum({score}), 4) AS relevance
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          GROUP BY tf.doc_id
        ),
        feat AS (
          SELECT doc_id,
                 CASE WHEN n_chars > 0 THEN
                   round(n_chars::double / (n_chars::double + 800.0), 6)
                 ELSE 0.0 END AS feature_score
          FROM documents
        )
        SELECT s.doc_id,
               round(s.relevance + 1.2 * coalesce(f.feature_score, 0.0),
                     6) AS score,
               s.relevance, coalesce(f.feature_score, 0.0) AS feature_score
        FROM scored s LEFT JOIN feat f ON s.doc_id = f.doc_id
        ORDER BY score DESC, s.doc_id ASC LIMIT 20
    """
    # simple_query_string negation form: (spark OR query) NOT vector
    out["simple_qs"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN ('query', 'spark') GROUP BY term),
        pres AS (
          SELECT doc_id,
                 bool_or(term = 'spark')  AS has_spark,
                 bool_or(term = 'query')  AS has_query,
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
        WHERE (p.has_spark OR p.has_query) AND NOT p.has_vector
        ORDER BY score DESC, s.doc_id ASC LIMIT 20
    """
    # missing / percentile_ranks / adjacency_matrix aggs
    out["missing_agg"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in}))
        SELECT sum(CASE WHEN (CASE WHEN doc.doc_id % 3 = 0
                              THEN doc.lang END) IS NULL
                        THEN 1 ELSE 0 END)::bigint AS n_missing
        FROM m JOIN documents doc ON m.doc_id = doc.doc_id
    """
    out["percentile_ranks"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        hits AS (
          SELECT doc.n_chars::double AS x
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
        )
        SELECT 500.0 AS value,
               round((count(*) FILTER (WHERE x <= 500.0)) * 100.0
                     / count(x), 6) AS percent
        FROM hits
        UNION ALL
        SELECT 1500.0,
               round((count(*) FILTER (WHERE x <= 1500.0)) * 100.0
                     / count(x), 6)
        FROM hits
    """
    out["adjacency_matrix"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        hits AS (
          SELECT doc.lang, doc.n_chars
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
        )
        SELECT 'en' AS key,
               (count(*) FILTER (WHERE lang = 'en'))::bigint AS n_docs
        FROM hits
        UNION ALL SELECT 'long',
               (count(*) FILTER (WHERE n_chars >= 1500))::bigint FROM hits
        UNION ALL SELECT 'short',
               (count(*) FILTER (WHERE n_chars < 500))::bigint FROM hits
        UNION ALL SELECT 'en&long',
               (count(*) FILTER (WHERE lang = 'en' AND n_chars >= 1500))::bigint
        FROM hits
        UNION ALL SELECT 'en&short',
               (count(*) FILTER (WHERE lang = 'en' AND n_chars < 500))::bigint
        FROM hits
        UNION ALL SELECT 'long&short',
               (count(*) FILTER (WHERE n_chars >= 1500 AND n_chars < 500))::bigint
        FROM hits
    """
    # multi-fragment highlight: top-20 BM25 + per-term first-occurrence
    # windows (distinct starts, document order, cap 3)
    out["snippet_fragments"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN ({terms_in}) GROUP BY term),
        scored AS (
          SELECT tf.doc_id, sum({score}) AS score
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          GROUP BY tf.doc_id
        ),
        top AS (SELECT doc_id, round(score, 4) AS score
                FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20),
        fr AS (
          SELECT top.doc_id, top.score,
                 list_filter([nullif(strpos(lower(doc.text), 'spark'), 0), nullif(strpos(lower(doc.text), 'query'), 0), nullif(strpos(lower(doc.text), 'table'), 0)], x -> x IS NOT NULL) AS ps,
                 doc.text AS txt
          FROM top JOIN documents doc ON top.doc_id = doc.doc_id
        )
        SELECT doc_id, score,
               len(ps)::int AS n_matched_terms,
               array_to_string(
                 list_transform(
                   list_sort(list_distinct(ps))[1:3],
                   p -> substr(txt, greatest(p - 30, 1), 60)
                 ), ' | ') AS fragments
        FROM fr
    """
    # URL-pattern blocklist: derived endpoint cycle + the same regexes
    from hadoop_search_engine_spark.operators.urltools import (
        sql_url_pattern_predicate_duckdb,
    )

    _pat_url = (
        "('https://' || source || '.com' || "
        "CASE doc_id % 5 WHEN 0 THEN '/tags/py/' WHEN 1 THEN '/?s=find' "
        "WHEN 2 THEN '/login' "
        "WHEN 3 THEN '/article/' || doc_id::varchar "
        "ELSE '/feed/' END)"
    )
    out["url_pattern_keep"] = f"""
        WITH u AS (SELECT doc_id, {_pat_url} AS url FROM documents)
        SELECT doc_id, url FROM u
        WHERE {sql_url_pattern_predicate_duckdb(url_expr="url")}
    """
    # cross_fields: per-(field, term) contributions, max per (doc,
    # term) at 6dp, DECIMAL sum (order-independent), top-20
    out["multi_match_cross"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN ('spark', 'src1') GROUP BY term),
        tsc AS (
          SELECT tf.doc_id, tf.term, 1.0 * ({score}) AS s
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
        ),
        stoks AS (SELECT doc_id, unnest({_stoks}) AS term FROM documents),
        stf AS (SELECT term, doc_id, count(*) AS tf
                FROM stoks GROUP BY term, doc_id),
        sdl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM stf GROUP BY doc_id),
        sc AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM sdl),
        sd AS (SELECT term, count(*)::double AS df FROM stf
               WHERE term IN ('spark', 'src1') GROUP BY term),
        ssc AS (
          SELECT stf.doc_id, stf.term,
                 2.0 * (
                   ln(1.0 + (sc.n - sd.df + 0.5) / (sd.df + 0.5))
                   * (stf.tf * ({BM25_K1} + 1.0))
                   / (stf.tf + {BM25_K1} * (1.0 - {BM25_B}
                      + {BM25_B} * sdl.doc_len / sc.avgdl))
                 ) AS s
          FROM stf
          JOIN sd ON stf.term = sd.term
          JOIN sdl ON stf.doc_id = sdl.doc_id
          CROSS JOIN sc
        ),
        u AS (SELECT * FROM tsc UNION ALL SELECT * FROM ssc),
        per_term AS (
          SELECT doc_id, term, round(max(s), 6) AS s
          FROM u GROUP BY doc_id, term
        )
        SELECT doc_id,
               round((sum(s::decimal(28,10)))::double, 6) AS score
        FROM per_term GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    # ranking metrics: replay the 3-query run (BM25 row_number per
    # query), the deterministic qrels, and the TREC formulas in SQL
    def _run_branch(t: str) -> str:
        return f"""
          SELECT 'q_{t}' AS query_id, doc_id,
                 row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
          FROM (
            SELECT tf.doc_id, sum({score}) AS score
            FROM tf
            JOIN (SELECT term, count(*)::double AS df FROM tf
                  WHERE term = '{t}' GROUP BY term) d ON tf.term = d.term
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN c
            GROUP BY tf.doc_id
          ) QUALIFY rank <= 10
        """

    def _qrel_branch(t: str) -> str:
        return f"""
          SELECT 'q_{t}' AS query_id, doc_id,
                 (1 + doc_id % 2)::int AS rel
          FROM (SELECT DISTINCT doc_id FROM tf WHERE term = '{t}')
        """

    _runs = " UNION ALL ".join(_run_branch(t) for t in FLAGSHIP_TERMS)
    _qrels = " UNION ALL ".join(_qrel_branch(t) for t in FLAGSHIP_TERMS)
    out["ranking_metrics"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        runs AS ({_runs}),
        qrels AS ({_qrels}),
        hits AS (
          SELECT r.query_id, r.rank,
                 (pow(2.0, q.rel) - 1) / log2(r.rank + 1.0) AS gain,
                 1.0 / r.rank AS rr
          FROM runs r JOIN qrels q
            ON r.query_id = q.query_id AND r.doc_id = q.doc_id
          WHERE q.rel > 0
        ),
        perq AS (
          SELECT query_id, count(*) AS n_rel_ret, sum(gain) AS dcg,
                 max(rr) AS mrr
          FROM hits GROUP BY query_id
        ),
        ideal AS (
          SELECT query_id,
                 sum((pow(2.0, rel) - 1) / log2(irank + 1.0)) AS idcg
          FROM (
            SELECT query_id, rel, doc_id,
                   row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY rel DESC, doc_id ASC) AS irank
            FROM qrels WHERE rel > 0
          ) WHERE irank <= 10 GROUP BY query_id
        ),
        nrel AS (
          SELECT query_id, count(*) AS n_rel FROM qrels
          WHERE rel > 0 GROUP BY query_id
        )
        SELECT n.query_id,
               n.n_rel::bigint AS n_rel,
               coalesce(p.n_rel_ret, 0)::bigint AS n_rel_ret,
               round(coalesce(p.dcg / i.idcg, 0), 6) AS ndcg,
               round(coalesce(p.mrr, 0), 6) AS mrr,
               round(coalesce(p.n_rel_ret, 0) / 10.0, 6) AS p_at_k,
               round(coalesce(p.n_rel_ret, 0)::double / n.n_rel, 6) AS r_at_k
        FROM nrel n
        JOIN ideal i ON n.query_id = i.query_id
        LEFT JOIN perq p ON n.query_id = p.query_id
    """
    # per-doc tf*idf top-3: same idf formula as the lexicon row, rank
    # by rounded weight desc then term asc
    out["tfidf_top_terms"] = f"""
        WITH {_TF_CTE},
        n AS (SELECT count(*) AS n FROM documents),
        d AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        wt AS (
          SELECT tf.doc_id, tf.term, tf.tf,
                 round(tf.tf * ln(1.0 + ((SELECT n FROM n) - d.df + 0.5)
                                  / (d.df + 0.5)), 6) AS weight
          FROM tf JOIN d ON tf.term = d.term
        ),
        r AS (
          SELECT doc_id, term, tf, weight,
                 row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY weight DESC, term ASC) AS rank
          FROM wt
        )
        SELECT doc_id, term, tf::bigint AS tf, weight, rank::int AS rank
        FROM r WHERE rank <= 3
    """
    # cursor page 2 == OFFSET 20 of the full ranking
    out["paginated_search"] = f"""
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
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20 OFFSET 20
    """
    out["prefix_search_indexed"] = _expansion_bm25("s%", 4)
    out["wildcard_search_indexed"] = _expansion_bm25("s_a%", 10)
    # regexp query: same expansion+score shape, anchored RE2 match
    out["regexp_search_indexed"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        exp AS (
          SELECT term FROM (
            SELECT term, count(*) AS df FROM tf
            WHERE regexp_matches(term, '^(?:s(park|can|ort))$') GROUP BY term)
          ORDER BY df DESC, term ASC LIMIT 10
        ),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN (SELECT term FROM exp) GROUP BY term),
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
    """
    # ES pinned query: pins first (1e9-base artificial scores, listed
    # order), nonexistent id dropped by the documents join, organic
    # BM25 minus the pins fills the rest
    out["pinned_search"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN ({terms_in}) GROUP BY term),
        s AS (
          SELECT tf.doc_id, sum({score}) AS score
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          GROUP BY tf.doc_id
        ),
        pins AS (SELECT * FROM (VALUES (17, 0), (5, 1),
                                (1000000000000, 2)) t(doc_id, r)),
        live_pins AS (
          SELECT p.doc_id, p.r FROM pins p
          JOIN documents doc ON p.doc_id = doc.doc_id
        )
        SELECT doc_id, round(score, 4) AS score FROM (
          SELECT doc_id, 1000000000.0 - r AS score FROM live_pins
          UNION ALL
          SELECT doc_id, score FROM s
          WHERE doc_id NOT IN (SELECT doc_id FROM pins)
        )
        ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    # field-sorted search: distinct matched docs ordered by the field
    out["sorted_search"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in}))
        SELECT m.doc_id, doc.n_chars
        FROM m JOIN documents doc ON m.doc_id = doc.doc_id
        ORDER BY doc.n_chars DESC, m.doc_id ASC LIMIT 20
    """
    # hybrid RRF: lexical branch = the bm25 scored CTE's top-30 (same
    # exact-score selection search_topk uses), re-ranked at 4 dp with
    # doc_id tie-break (rank_branch's contract); vector branch =
    # cosine_topk's rounded-cosine top-30; fused by 1/(60+rank)
    out["hybrid_search"] = f"""
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
        lexsel AS (SELECT doc_id, score FROM scored
                   ORDER BY score DESC, doc_id ASC LIMIT 30),
        lex AS (SELECT doc_id, row_number() OVER (
                    ORDER BY round(score, 4) DESC, doc_id ASC) AS r
                FROM lexsel),
        vecsel AS (
          SELECT vec_id AS doc_id,
                 round(list_cosine_similarity(
                     embedding::double[], qv::double[]), 6) AS cz
          FROM embeddings,
               (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
          ORDER BY cz DESC, doc_id ASC LIMIT 30
        ),
        vec AS (SELECT doc_id, row_number() OVER (
                    ORDER BY cz DESC, doc_id ASC) AS r
                FROM vecsel),
        u AS (
          SELECT doc_id, r, 'lex' AS br FROM lex
          UNION ALL
          SELECT doc_id, r, 'vec' AS br FROM vec
        )
        SELECT doc_id,
               round(sum(1.0 / (60 + r)), 6) AS rrf,
               coalesce(max(CASE WHEN br = 'lex' THEN r END), 0)::int AS lex_rank,
               coalesce(max(CASE WHEN br = 'vec' THEN r END), 0)::int AS vec_rank
        FROM u GROUP BY doc_id
        ORDER BY rrf DESC, doc_id ASC LIMIT 15
    """
    # ES rescore: BM25 top-40 window re-ranked by 1*bm25 + 2*cosine
    out["rescore_search"] = f"""
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
        win AS (SELECT doc_id, round(score, 4) AS bm25 FROM scored
                ORDER BY score DESC, doc_id ASC LIMIT 40),
        sec AS (
          SELECT w.doc_id, w.bm25,
                 coalesce(round(list_cosine_similarity(
                     e.embedding::double[], q.qv::double[]), 6),
                     0.0) AS secondary
          FROM win w
          LEFT JOIN embeddings e ON e.vec_id = w.doc_id
          CROSS JOIN (SELECT embedding AS qv FROM embeddings
                      WHERE vec_id = 0) q
        )
        SELECT doc_id, round(1.0 * bm25 + 2.0 * secondary, 6) AS score,
               bm25, secondary
        FROM sec ORDER BY score DESC, doc_id ASC LIMIT 15
    """
    # MoreLikeThis: doc 0's top-3 tf*idf terms -> OR search, source
    # excluded; the term selection replays in SQL (tf from the token
    # CTE, idf from the corpus formula, ties by term ascending)
    out["more_like_this"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        dfall AS (SELECT term, count(*)::double AS df FROM tf GROUP BY term),
        sel AS (
          SELECT s.term
          FROM tf s JOIN dfall ON s.term = dfall.term CROSS JOIN c
          WHERE s.doc_id = 0
          ORDER BY s.tf * ln(1.0 + (c.n - dfall.df + 0.5) / (dfall.df + 0.5))
                   DESC, s.term ASC
          LIMIT 3
        ),
        d AS (SELECT term, df FROM dfall
              WHERE term IN (SELECT term FROM sel)),
        scored AS (
          SELECT tf.doc_id, sum({score}) AS score
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          WHERE tf.doc_id <> 0
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
    """
    # explain: per-term BM25 breakdown for the flagship query's top-1
    # doc — every output column recomputed in SQL
    _x_idf = sql_idf("c.n", "d.df")
    _x_contrib = sql_score("tf.tf", "dl.doc_len", _x_idf, "c.avgdl",
                           BM25_K1, BM25_B)
    out["explain_score"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN ({terms_in}) GROUP BY term),
        scored AS (
          SELECT tf.doc_id, sum({score}) AS score
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          GROUP BY tf.doc_id
        ),
        best AS (SELECT doc_id FROM scored
                 ORDER BY score DESC, doc_id ASC LIMIT 1)
        SELECT tf.term, tf.tf::bigint AS tf, d.df::bigint AS df,
               round({_x_idf}, 6) AS idf,
               round({_x_contrib}, 6) AS contribution
        FROM tf
        JOIN d ON tf.term = d.term
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN c
        WHERE tf.doc_id IN (SELECT doc_id FROM best)
        ORDER BY tf.term ASC
    """
    # training-sequence assembly: chunking (32-token windows, overlap
    # 8 -> step 24) and concat-and-split packing (seq_len 128 per lang
    # group) — pure integer arithmetic, replayed verbatim
    out["chunk_docs"] = f"""
        WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        t AS (SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) > 0)
        SELECT doc_id, i AS chunk_id,
               len(toks[(i*24 + 1)::int : (i*24 + 32)::int]) AS n_tokens,
               array_to_string(
                 toks[(i*24 + 1)::int : (i*24 + 32)::int], ' ') AS chunk_text
        FROM t, unnest(range(0, greatest((n - 8 + 23) // 24, 1))) AS u(i)
    """
    _pack_st = f"""
        tok AS (SELECT lang, doc_id, {_TOKS} AS toks FROM documents),
        st AS (
          SELECT lang, doc_id, toks, len(toks)::bigint AS n,
                 coalesce(sum(len(toks)) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0)::bigint AS g
          FROM tok WHERE len(toks) > 0
        ),
        sp AS (
          SELECT lang, doc_id, toks, n, g,
                 unnest(range(g // 128, (g + n - 1) // 128 + 1)) AS bin_id
          FROM st
        )"""
    out["pack_spans"] = f"""
        WITH {_pack_st}
        SELECT lang, doc_id, bin_id,
               greatest(g - bin_id * 128, 0) AS bin_pos,
               greatest(bin_id * 128 - g, 0) AS tok_start,
               least((bin_id + 1) * 128 - g, n) AS tok_end
        FROM sp
    """
    out["pack_manifest"] = f"""
        WITH {_pack_st},
        spans AS (
          SELECT lang, doc_id, bin_id,
                 greatest(g - bin_id * 128, 0) AS bin_pos,
                 least((bin_id + 1) * 128 - g, n)
                   - greatest(bin_id * 128 - g, 0) AS n_tok
          FROM sp
        )
        SELECT lang, bin_id, sum(n_tok)::bigint AS n_tokens,
               array_to_string(list(doc_id ORDER BY bin_pos), ',')
                 AS doc_ids_csv,
               array_to_string(list(bin_pos ORDER BY bin_pos), ',')
                 AS doc_starts_csv
        FROM spans GROUP BY lang, bin_id
    """
    out["pack_text"] = f"""
        WITH {_pack_st},
        pieces AS (
          SELECT lang, bin_id,
                 greatest(g - bin_id * 128, 0) AS bin_pos,
                 toks[(greatest(bin_id * 128 - g, 0) + 1)::int
                      : (least((bin_id + 1) * 128 - g, n))::int] AS piece
          FROM sp
        ),
        bins AS (
          SELECT lang, bin_id,
                 flatten(list(piece ORDER BY bin_pos)) AS toks
          FROM pieces GROUP BY lang, bin_id
        )
        SELECT lang, bin_id, len(toks) AS n_tokens,
               array_to_string(toks, ' ') AS text
        FROM bins
    """

    # export this part's locals for later parts (exact closure
    # semantics of the original single-function implementation)
    g.update({k: v for k, v in locals().items()
              if k not in ('out', 'g') and not k.startswith('__')})
    return out
