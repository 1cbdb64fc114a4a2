"""Oracle SQL definitions, part 05 (mechanically split from the
former __spark_entry__.oracle_sql body; source lines 8042-8492
of the pre-split file). Board entries defined here:

bm25_topk_impact cap_per_domain collocations composite_page domain_stats
dsl_bool_structured_filtered dsl_boosting dsl_constant_score
dsl_dis_max dsl_ids dsl_match_all dsl_mlt dsl_range_query en es
extended_stats filters_agg function_score_random mix_corpus
mmr_rerank span_dedup_rewrite span_dedup_stats terms_metrics
token_budget url_dedup url_normalize
"""

# flake8: noqa: E501


def add(out, g):
    _DERIVED_URL_SQL = g.get("_DERIVED_URL_SQL")
    _SPAN_APPENDIX = g.get("_SPAN_APPENDIX")
    _TF_CTE = g.get("_TF_CTE")
    _TOKS = g.get("_TOKS")
    score = g.get("score")
    sql_murmur3_u32_duckdb = g.get("sql_murmur3_u32_duckdb")
    sql_tokens_duckdb = g.get("sql_tokens_duckdb")
    terms_in = g.get("terms_in")

    out["collocations"] = f"""
        WITH tok AS (SELECT {_TOKS} AS toks FROM documents),
        bg AS (
          SELECT toks[i] AS term_a, toks[i + 1] AS term_b
          FROM tok, unnest(range(1, len(toks))) AS u(i)
        ),
        ap AS (SELECT term_a, term_b, count(*) AS pair_count
               FROM bg GROUP BY 1, 2),
        ntot AS (SELECT sum(pair_count)::double AS n FROM ap),
        uc AS (SELECT term, count(*) AS cnt
               FROM (SELECT unnest(toks) AS term FROM tok) GROUP BY term),
        tt AS (SELECT sum(cnt)::double AS t FROM uc)
        SELECT p.term_a, p.term_b, p.pair_count,
               a.cnt AS count_a, b.cnt AS count_b,
               round(ln((p.pair_count::double / n.n)
                        / ((a.cnt::double / t.t) * (b.cnt::double / t.t))),
                     6) AS pmi
        FROM ap p
        JOIN uc a ON p.term_a = a.term
        JOIN uc b ON p.term_b = b.term
        CROSS JOIN ntot n CROSS JOIN tt t
        WHERE p.pair_count >= 5
    """
    # DSL constant-score leaves: live docs in _doc order / id probe
    out["dsl_match_all"] = """
        SELECT doc_id, 2.0 AS score FROM documents
        ORDER BY doc_id ASC LIMIT 25
    """
    out["dsl_ids"] = """
        SELECT doc_id, 1.0 AS score FROM documents
        WHERE doc_id IN (3, 7, 11, 999999999)
        ORDER BY doc_id ASC LIMIT 10
    """
    # training-recipe epoch mixing: stratum CASE + epoch grid + the
    # bit-exact murmur3(id:epoch) fractional-epoch bucket
    from hadoop_search_engine_spark.operators.curate import (
        sql_mix_epochs_duckdb,
    )

    _mix_wq, _mix_pred = sql_mix_epochs_duckdb(
        {"en": 1.5, "es": 0.4}, strata_col="lang", default_weight=1.0
    )
    out["mix_corpus"] = f"""
        SELECT doc_id, lang, epoch FROM (
          SELECT doc_id, lang,
                 unnest(range(0, {_mix_wq} // 10000 + 1)) AS epoch
          FROM documents
        ) WHERE {_mix_pred}
    """
    # MMR diversification: the greedy loop itself runs as a recursive
    # CTE — state is the picked list; each step re-derives every
    # candidate's max-cosine-to-picked from the pair matrix and takes
    # the argmax (mmr desc, doc_id asc), exactly hybrid.mmr_rerank's
    # contract (bm25@4dp, rel/cos/score@6dp, maxsim floored at 0)
    out["mmr_rerank"] = f"""
        WITH RECURSIVE {_TF_CTE},
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
        top AS (SELECT doc_id, round(score, 4) AS bm25
                FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20),
        rel AS (SELECT doc_id, bm25,
                       round(bm25 / (SELECT max(bm25) FROM top), 6) AS rel
                FROM top),
        vec AS (SELECT e.vec_id AS doc_id, e.embedding::DOUBLE[] AS v
                FROM embeddings e
                WHERE e.vec_id IN (SELECT doc_id FROM top)),
        pr AS (
          SELECT a.doc_id AS da, b.doc_id AS db,
                 round(list_dot_product(a.v, b.v) /
                       ((CASE WHEN sqrt(list_dot_product(a.v, a.v)) = 0
                              THEN 1 ELSE sqrt(list_dot_product(a.v, a.v)) END)
                        * (CASE WHEN sqrt(list_dot_product(b.v, b.v)) = 0
                               THEN 1 ELSE sqrt(list_dot_product(b.v, b.v)) END)),
                       6) AS cos
          FROM vec a, vec b
        ),
        sel AS (
          (SELECT 1 AS mmr_rank, cand.doc_id,
                  round(0.7 * cand.rel, 6) AS mmr_score,
                  cand.bm25, [cand.doc_id] AS picked
           FROM rel cand
           ORDER BY round(0.7 * cand.rel, 6) DESC, cand.doc_id ASC LIMIT 1)
          UNION ALL
          SELECT s.mmr_rank + 1, pick.doc_id, pick.m, pick.bm25,
                 list_append(s.picked, pick.doc_id)
          FROM sel s,
               LATERAL (
                 SELECT cand.doc_id, cand.bm25,
                        round(0.7 * cand.rel - 0.3 *
                              greatest(coalesce(
                                (SELECT max(p.cos) FROM pr p
                                 WHERE p.da = cand.doc_id
                                   AND list_contains(s.picked, p.db)), 0), 0),
                              6) AS m
                 FROM rel cand
                 WHERE NOT list_contains(s.picked, cand.doc_id)
                 ORDER BY m DESC, cand.doc_id ASC LIMIT 1
               ) pick
          WHERE s.mmr_rank < 10
        )
        SELECT doc_id, mmr_rank, mmr_score, bm25 FROM sel
    """
    # function_score random_score: murmur(doc_id:"rs:7") / 2^32
    from hadoop_search_engine_spark.functions.hashes import (
        sql_murmur3_u32_duckdb as _sql_mm3,
    )

    _h1r = _sql_mm3("(doc_id)::varchar")
    _hr = _sql_mm3("'rs:7'", seed=_h1r)
    out["function_score_random"] = f"""
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
        fac AS (
          SELECT doc_id,
                 round(({_hr}) / 4294967296.0, 6) AS factor
          FROM documents
        )
        SELECT s.doc_id,
               round(s.relevance * f.factor, 6) AS score,
               s.relevance, f.factor
        FROM scored s JOIN fac f ON s.doc_id = f.doc_id
        ORDER BY score DESC, s.doc_id ASC LIMIT 10
    """
    out["dsl_mlt"] = out["more_like_this"]
    # range QUERY: constant-score metadata range, _doc order
    out["dsl_range_query"] = """
        SELECT doc_id, 2.0 AS score FROM documents
        WHERE n_chars >= 500 AND n_chars < 1500
        ORDER BY doc_id LIMIT 40
    """
    # structured bool + metadata filter: boolean eligibility flags,
    # score over the positive terms, n_chars range gate, top-k
    out["dsl_bool_structured_filtered"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN ('merge', 'query', 'spark') GROUP BY term),
        pres AS (
          SELECT doc_id,
                 bool_or(term = 'spark')  AS has_spark,
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
        FROM scored s
        JOIN pres p ON s.doc_id = p.doc_id
        JOIN documents doc ON s.doc_id = doc.doc_id
        WHERE p.has_spark AND NOT p.has_vector AND doc.n_chars >= 300
        ORDER BY score DESC, s.doc_id ASC LIMIT 20
    """
    # token-budget cut: murmur order replay + exclusive window sum
    _h1b = _sql_mm3("(doc_id)::varchar")
    _hb = _sql_mm3("'budget'", seed=_h1b)
    out["token_budget"] = f"""
        WITH n AS (
          SELECT doc_id, len({_TOKS})::bigint AS n_tokens, {_hb} AS h
          FROM documents
        ),
        c AS (
          SELECT doc_id, n_tokens,
                 coalesce(sum(n_tokens) OVER (
                   ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS g
          FROM n
        )
        SELECT doc_id, n_tokens FROM c WHERE g + n_tokens <= 20000
    """
    # exact duplicate-span dedup: derived boilerplate appendix, gram
    # enumeration via parallel unnest + list_slice, keep-first winner
    # via a (doc_id, pos) rank window over each gram's occurrences
    _span_toks = sql_tokens_duckdb(f"text || '{_SPAN_APPENDIX}'")
    _span_base = f"""
        t AS (SELECT doc_id, {_span_toks} AS toks FROM documents),
        occ AS (
          SELECT doc_id, unnest(range(len(toks) - 5)) AS pos, toks
          FROM t WHERE len(toks) >= 6
        ),
        g AS (
          SELECT doc_id, pos,
                 array_to_string(list_slice(toks, pos + 1, pos + 6), ' ')
                   AS gram
          FROM occ
        ),
        r AS (
          SELECT doc_id, pos,
                 count(*) OVER (PARTITION BY gram) AS df,
                 row_number() OVER (
                   PARTITION BY gram ORDER BY doc_id, pos
                 ) AS rk
          FROM g
        )
    """
    out["span_dedup_stats"] = f"""
        WITH {_span_base},
        per AS (
          SELECT doc_id, count(*) AS n_grams,
                 sum(CASE WHEN df > 1 AND rk > 1 THEN 1 ELSE 0 END)
                   AS n_dup
          FROM r GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(per.n_grams, 0)::bigint AS n_grams,
               coalesce(per.n_dup, 0)::bigint AS n_dup_grams,
               CASE WHEN coalesce(per.n_grams, 0) > 0
                    THEN round(per.n_dup / per.n_grams::double, 6)
                    ELSE 0.0 END AS dup_ratio
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """
    out["span_dedup_rewrite"] = f"""
        WITH {_span_base},
        dup AS (SELECT doc_id, pos FROM r WHERE df > 1 AND rk > 1),
        cov AS (
          SELECT DISTINCT doc_id, pos + unnest(range(6)) AS p FROM dup
        ),
        posed AS (
          SELECT doc_id, unnest(toks) AS tok,
                 unnest(range(len(toks))) AS p
          FROM t
        )
        SELECT posed.doc_id,
               string_agg(tok, ' ' ORDER BY p) AS text
        FROM posed
        WHERE NOT EXISTS (
          SELECT 1 FROM cov
          WHERE cov.doc_id = posed.doc_id AND cov.p = posed.p
        )
        GROUP BY posed.doc_id
    """
    # ES composite agg: all (lang, 500-wide n_chars bucket) buckets of
    # the hit set in composite-key order; keyset page 2 of size 4 ==
    # rank rows 5..8 (strict key ordering)
    out["composite_page"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        b AS (
          SELECT doc.lang,
                 floor(doc.n_chars::double / 500.0) * 500.0 AS len_bucket,
                 count(*) AS n_docs
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
          WHERE doc.lang IS NOT NULL AND doc.n_chars IS NOT NULL
          GROUP BY 1, 2
        ),
        r AS (
          SELECT lang, len_bucket, n_docs,
                 row_number() OVER (ORDER BY lang ASC, len_bucket ASC) AS rk
          FROM b
        )
        SELECT lang, len_bucket, n_docs FROM r
        WHERE rk BETWEEN 5 AND 8
    """
    # ES terms agg + metric sub-aggs: one GROUP BY pass per bucket
    out["terms_metrics"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in}))
        SELECT doc.lang, count(*)::bigint AS n_docs,
               round(avg(doc.n_chars::double), 6) AS avg_len,
               sum(doc.n_chars::double) AS sum_len,
               max(doc.n_chars::double) AS max_len,
               count(DISTINCT doc.source)::bigint AS n_sources
        FROM m JOIN documents doc ON m.doc_id = doc.doc_id
        GROUP BY doc.lang
    """
    # ES extended_stats: ES's naive formulas from (n, sum, sumsq)
    out["extended_stats"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        base AS (
          SELECT count(doc.n_chars)::bigint AS n_docs,
                 min(doc.n_chars::double) AS min,
                 max(doc.n_chars::double) AS max,
                 sum(doc.n_chars::double) AS sum,
                 sum(doc.n_chars::double * doc.n_chars::double)
                   AS sum_of_squares
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
        )
        SELECT n_docs, min, max, sum, sum_of_squares,
               round(sum / n_docs, 6) AS avg,
               round(sum_of_squares / n_docs
                     - (sum / n_docs) * (sum / n_docs), 6) AS variance,
               round(CASE WHEN n_docs > 1 THEN
                       (sum_of_squares - sum * sum / n_docs) / (n_docs - 1)
                     END, 6) AS variance_sampling,
               round(sqrt(sum_of_squares / n_docs
                          - (sum / n_docs) * (sum / n_docs)), 6)
                 AS std_deviation,
               round(sqrt(CASE WHEN n_docs > 1 THEN
                       (sum_of_squares - sum * sum / n_docs) / (n_docs - 1)
                     END), 6) AS std_deviation_sampling,
               round(sum / n_docs + 2.0 * sqrt(sum_of_squares / n_docs
                     - (sum / n_docs) * (sum / n_docs)), 6) AS std_upper,
               round(sum / n_docs - 2.0 * sqrt(sum_of_squares / n_docs
                     - (sum / n_docs) * (sum / n_docs)), 6) AS std_lower
        FROM base
    """
    # ES filters agg: independent named predicate counts, one pass
    out["filters_agg"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        hits AS (
          SELECT doc.lang, doc.n_chars
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
        )
        SELECT 'en' AS filter_label,
               (count(*) FILTER (WHERE lang = 'en'))::bigint AS n_docs
        FROM hits
        UNION ALL
        SELECT 'long', (count(*) FILTER (WHERE n_chars >= 1500))::bigint
        FROM hits
        UNION ALL
        SELECT 'short', (count(*) FILTER (WHERE n_chars < 500))::bigint
        FROM hits
    """
    # ES dis_max: per-branch full BM25 match sets, best_fields combine
    out["dsl_dis_max"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d1 AS (SELECT term, count(*)::double AS df FROM tf
               WHERE term IN ('query', 'spark') GROUP BY term),
        s1 AS (SELECT tf.doc_id, sum({score.replace("d.df", "d1.df")}) AS score
               FROM tf JOIN d1 ON tf.term = d1.term
               JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN c
               GROUP BY tf.doc_id),
        d2 AS (SELECT term, count(*)::double AS df FROM tf
               WHERE term = 'table' GROUP BY term),
        s2 AS (SELECT tf.doc_id, sum({score.replace("d.df", "d2.df")}) AS score
               FROM tf JOIN d2 ON tf.term = d2.term
               JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN c
               GROUP BY tf.doc_id),
        u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2),
        comb AS (
          SELECT doc_id,
                 max(score) + 0.3 * (sum(score) - max(score)) AS score
          FROM u GROUP BY doc_id
        )
        SELECT doc_id, round(score, 4) AS score
        FROM comb ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    # ES boosting: positive BM25, ×0.4 where the negative term matches
    out["dsl_boosting"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN ('query', 'spark') GROUP BY term),
        pos AS (SELECT tf.doc_id, sum({score}) AS score
                FROM tf JOIN d ON tf.term = d.term
                JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN c
                GROUP BY tf.doc_id),
        neg AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'table'),
        demoted AS (
          SELECT p.doc_id,
                 CASE WHEN n.doc_id IS NOT NULL THEN p.score * 0.4
                      ELSE p.score END AS score
          FROM pos p LEFT JOIN neg n ON p.doc_id = n.doc_id
        )
        SELECT doc_id, round(score, 4) AS score
        FROM demoted ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    # ES constant_score: the matched set at a fixed boost, _doc order
    out["dsl_constant_score"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf
              WHERE term IN ('query', 'spark'))
        SELECT doc_id, 2.5 AS score FROM m ORDER BY doc_id LIMIT 30
    """
    # URL curation: the derived noisy URL + each operator's exact
    # replay (functions restricted to the shared Java-regex ∩ RE2 +
    # list-builtin dialect, see operators/urltools.py)
    from hadoop_search_engine_spark.functions.hashes import (
        sql_murmur3_u32_duckdb,
    )
    from hadoop_search_engine_spark.operators.urltools import (
        sql_normalize_url_duckdb,
        sql_registrable_domain_duckdb,
        sql_url_parts_duckdb,
    )

    out["url_normalize"] = f"""
        SELECT doc_id,
               {sql_normalize_url_duckdb(_DERIVED_URL_SQL)} AS url_norm
        FROM documents
    """
    out["url_dedup"] = f"""
        WITH u AS (
          SELECT doc_id,
                 {sql_normalize_url_duckdb(_DERIVED_URL_SQL,
                                           strip_www=True)} AS url_norm
          FROM documents
        )
        SELECT url_norm, min(doc_id) AS doc_id FROM u GROUP BY url_norm
    """
    _host_sql = (
        f"regexp_replace(lower({sql_url_parts_duckdb(_DERIVED_URL_SQL)['host']}), "
        "'^www\\.', '')"
    )
    _dom_sql = sql_registrable_domain_duckdb(_host_sql)
    out["domain_stats"] = f"""
        WITH d AS (SELECT {_dom_sql} AS domain, n_chars FROM documents),
        t AS (SELECT count(*)::double AS n_total FROM d)
        SELECT domain, count(*)::bigint AS n_docs,
               sum(n_chars)::bigint AS total_size,
               round(count(*) / (SELECT n_total FROM t), 6) AS doc_share
        FROM d GROUP BY domain
    """
    _h1 = sql_murmur3_u32_duckdb("(doc_id)::varchar")
    _hcap = sql_murmur3_u32_duckdb("'domaincap'", seed=_h1)
    out["cap_per_domain"] = f"""
        WITH d AS (
          SELECT doc_id, {_dom_sql} AS dom, {_hcap} AS h FROM documents
        ),
        r AS (
          SELECT doc_id,
                 row_number() OVER (
                   PARTITION BY dom ORDER BY h ASC, doc_id ASC
                 ) AS rk
          FROM d
        )
        SELECT doc_id FROM r WHERE rk <= 3
    """

    # round 5: impact-ordered champion-list serving must equal the
    # exhaustive corpus-scan ranking bit-for-bit — same oracle as the
    # flagship (the whole point of the proof-or-fallback design)
    out["bm25_topk_impact"] = out["bm25_topk"]

    # export this part's locals for later parts (exact closure
    # semantics of the original single-function implementation)
    g.update({k: v for k, v in locals().items()
              if k not in ('out', 'g') and not k.startswith('__')})
    return out
