"""Oracle SQL definitions, part 02 (mechanically split from the
former __spark_entry__.oracle_sql body; source lines 5590-6398
of the pre-split file). Board entries defined here:

bm25_topk_batch bm25_topk_batch_50 bm25_topk_batch_driver
bm25_topk_indexed_and bm25_topk_indexed_driver bm25_topk_resharded
bm25_topk_rows bm25_topk_tuned boolean_search_indexed
boolean_search_indexed_driver bucket_script cardinality_facet
cohort_retention collapse_inner_hits collapsed_search_indexed
combined_fields date_range_agg dsl_bool dsl_collapsed dsl_filtered
dsl_function_score dsl_knn dsl_match dsl_range_agg
facet_counts_indexed federated_batch federated_search
filtered_search_indexed function_score_fvf function_score_gauss
fuzzy_terms_indexed histogram_facets interleave_runs json_props_agg
match_scores_all max_bucket msm_search multi_match_best_fields
multi_match_most_fields multi_terms_agg or_union_indexed
percentiles_facet percolate percolate_stream pipeline_aggs
range_facets rare_terms rollup_range rollup_refresh search_count
significant_terms snippets_indexed stats_facet suggest_terms_indexed
term_boosted_search term_stats terms_agg_sized terms_filtered
terms_order_metric time_range_search top_hits_facet top_metrics
weighted_avg_metric
"""

# flake8: noqa: E501


def add(out, g):
    BATCH_QUERIES = g.get("BATCH_QUERIES")
    BATCH_QUERIES_50 = g.get("BATCH_QUERIES_50")
    BM25_B = g.get("BM25_B")
    BM25_K1 = g.get("BM25_K1")
    FLAGSHIP_TERMS = g.get("FLAGSHIP_TERMS")
    MF_BOOSTS = g.get("MF_BOOSTS")
    TPI_HI_US = g.get("TPI_HI_US")
    TPI_LO_US = g.get("TPI_LO_US")
    _TF_CTE = g.get("_TF_CTE")
    _TOKS = g.get("_TOKS")
    _tpi_idf = g.get("_tpi_idf")
    _tpi_toks = g.get("_tpi_toks")
    idf = g.get("idf")
    queries = g.get("queries")
    score = g.get("score")
    sql_idf = g.get("sql_idf")
    sql_score = g.get("sql_score")
    sql_tokens_duckdb = g.get("sql_tokens_duckdb")
    t = g.get("t")
    terms_in = g.get("terms_in")

    _tpi_score = sql_score("tf.tf", "dl.doc_len", _tpi_idf, "c.avgdl",
                           BM25_K1, BM25_B)
    out["time_range_search"] = f"""
        WITH base AS (
          SELECT doc_id, text,
                 TIMESTAMP '2026-01-01 00:00:00'
                   + ((doc_id % 120) * INTERVAL 1 DAY) AS ts
          FROM documents
        ),
        inr AS (
          SELECT doc_id, strftime(date_trunc('month', ts), '%Y-%m') AS period
          FROM base
          WHERE epoch_us(ts) >= {TPI_LO_US} AND epoch_us(ts) < {TPI_HI_US}
        ),
        sel AS (
          SELECT b.doc_id, b.text FROM base b
          WHERE strftime(date_trunc('month', b.ts), '%Y-%m')
                IN (SELECT DISTINCT period FROM inr)
        ),
        toks AS (SELECT doc_id, unnest({_tpi_toks}) AS term FROM sel),
        tf AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id),
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN ({terms_in}) GROUP BY term),
        scored AS (
          SELECT tf.doc_id, sum({_tpi_score}) AS score
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          GROUP BY tf.doc_id
        )
        SELECT i.period, s.doc_id, round(s.score, 4) AS score
        FROM scored s JOIN inr i ON s.doc_id = i.doc_id
        ORDER BY score DESC, period ASC, s.doc_id ASC LIMIT 20
    """
    # full scored match set: the bm25 SQL without its LIMIT
    out["match_scores_all"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf WHERE term IN ({terms_in}) GROUP BY term)
        SELECT tf.doc_id, round(sum({score}), 4) AS score
        FROM tf
        JOIN d ON tf.term = d.term
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN c
        GROUP BY tf.doc_id
    """

    # multi_match: per-field BM25 from the field's OWN statistics
    # (df/dl/avgdl over the field corpus), then the ES combine
    def _mf_ctes(p: str, field_sql: str) -> str:
        ftoks = sql_tokens_duckdb(field_sql)
        fidf = sql_idf("c.n", "d.df")
        fscore = sql_score("tf.tf", "dl.doc_len", fidf, "c.avgdl",
                           BM25_K1, BM25_B)
        return f"""
        {p}_toks AS (SELECT doc_id, unnest({ftoks}) AS term FROM documents),
        {p}_tf AS (SELECT term, doc_id, count(*) AS tf FROM {p}_toks GROUP BY term, doc_id),
        {p}_dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM {p}_tf GROUP BY doc_id),
        {p}_c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM {p}_dl),
        {p}_d AS (SELECT term, count(*)::double AS df FROM {p}_tf
                  WHERE term IN ({terms_in}) GROUP BY term),
        {p}_scored AS (
          SELECT tf.doc_id, sum({fscore}) AS s
          FROM {p}_tf tf
          JOIN {p}_d d ON tf.term = d.term
          JOIN {p}_dl dl ON tf.doc_id = dl.doc_id
          CROSS JOIN {p}_c c
          GROUP BY tf.doc_id
        )"""

    _title_sql = "array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')"
    _body_sql = (
        "array_to_string(list_slice(string_split(text, ' '), 9, 100000000), ' ')"
    )
    _mf_union = f"""
        u AS (
          SELECT doc_id, {MF_BOOSTS['title']} * s AS s FROM t_scored
          UNION ALL
          SELECT doc_id, {MF_BOOSTS['body']} * s AS s FROM b_scored
        )"""
    _cf_score = sql_score("tfc.tfc", "dl.dlc", sql_idf("c.n", "d.df"),
                          "c.avgdlc", BM25_K1, BM25_B)
    out["combined_fields"] = f"""
        WITH base AS (
          SELECT doc_id, {_title_sql} AS title, {_body_sql} AS body
          FROM documents
        ),
        long AS (
          SELECT doc_id, unnest({sql_tokens_duckdb('title')}) AS term,
                 {MF_BOOSTS['title']} AS w FROM base
          UNION ALL
          SELECT doc_id, unnest({sql_tokens_duckdb('body')}) AS term,
                 {MF_BOOSTS['body']} AS w FROM base
        ),
        dl AS (SELECT doc_id, sum(w) AS dlc FROM long GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(dlc) AS avgdlc FROM dl),
        ql AS (SELECT * FROM long WHERE term IN ({terms_in})),
        tfc AS (SELECT doc_id, term, sum(w) AS tfc
                FROM ql GROUP BY doc_id, term),
        d AS (SELECT term, count(DISTINCT doc_id)::double AS df
              FROM ql GROUP BY term),
        s AS (
          SELECT tfc.doc_id, sum({_cf_score}) AS score
          FROM tfc
          JOIN d ON tfc.term = d.term
          JOIN dl ON tfc.doc_id = dl.doc_id
          CROSS JOIN c
          GROUP BY tfc.doc_id
        )
        SELECT doc_id, round(score, 4) AS score
        FROM s ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    out["multi_match_most_fields"] = f"""
        WITH {_mf_ctes('t', _title_sql)}, {_mf_ctes('b', _body_sql)}, {_mf_union}
        SELECT doc_id, round(sum(s), 4) AS score
        FROM u GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    out["multi_match_best_fields"] = f"""
        WITH {_mf_ctes('t', _title_sql)}, {_mf_ctes('b', _body_sql)}, {_mf_union}
        SELECT doc_id,
               round(max(s) + 0.3 * (sum(s) - max(s)), 4) AS score
        FROM u GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC LIMIT 20
    """

    # function_score: relevance rounded at 4 dp, factor at 6 dp, then
    # the combine — the engine's exact determinism contract
    import math as _math

    _two_sigma_sq = -(150.0 * 150.0) / _math.log(0.5)
    _fs_rel = f"""
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf WHERE term IN ({terms_in}) GROUP BY term),
        rel AS (
          SELECT tf.doc_id, round(sum({score}), 4) AS r
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          GROUP BY tf.doc_id
        )"""
    out["function_score_gauss"] = f"""
        WITH {_TF_CTE}, {_fs_rel},
        fac AS (
          SELECT doc_id,
                 round(exp(-(pow(greatest(abs(n_chars::double - 300.0), 0.0), 2))
                           / {_two_sigma_sq!r}), 6) AS f
          FROM documents
        )
        SELECT rel.doc_id, round(rel.r * fac.f, 6) AS score
        FROM rel JOIN fac ON rel.doc_id = fac.doc_id
        ORDER BY score DESC, rel.doc_id ASC LIMIT 20
    """
    out["function_score_fvf"] = f"""
        WITH {_TF_CTE}, {_fs_rel},
        fac AS (
          SELECT doc_id, round(ln(1.0 + n_chars::double * 0.01), 6) AS f
          FROM documents
        )
        SELECT rel.doc_id, round(rel.r + fac.f, 6) AS score
        FROM rel JOIN fac ON rel.doc_id = fac.doc_id
        ORDER BY score DESC, rel.doc_id ASC LIMIT 20
    """
    # DSL layer: each entry runs the SAME oracle as the path it
    # compiles to — the layer adds no scoring code
    out["dsl_match"] = out["bm25_topk"]
    out["dsl_bool"] = out["boolean_search"]
    out["dsl_filtered"] = out["filtered_search"]
    out["dsl_function_score"] = out["function_score_gauss"]
    out["dsl_collapsed"] = out["collapsed_search"]
    out["dsl_knn"] = out["ann_cosine_topk"]
    out["bm25_topk_resharded"] = out["bm25_topk"]
    out["bm25_topk_indexed_driver"] = out["bm25_topk"]
    out["boolean_search_indexed"] = out["boolean_search"]
    out["boolean_search_indexed_driver"] = out["boolean_search"]
    out["bm25_topk_rows"] = out["bm25_topk"]
    out["bm25_topk_indexed_and"] = out["bm25_topk_and"]
    out["filtered_search_indexed"] = out["filtered_search"]
    # query-time (k1, b) tuning: same pipeline, tuned score constants
    score_tuned = sql_score("tf.tf", "dl.doc_len", idf, "c.avgdl", 0.9, 0.25)
    out["bm25_topk_tuned"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf WHERE term IN ({terms_in}) GROUP BY term),
        scored AS (
          SELECT tf.doc_id, sum({score_tuned}) AS score
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    # per-term query boosts: the boost multiplies the term's idf (the
    # same fold the Spark front end applies), everything else is the
    # standard BM25 replay
    boosted_idf = (
        f"({idf}) * (CASE d.term WHEN 'spark' THEN 2.0 "
        f"WHEN 'table' THEN 0.5 ELSE 1.0 END)"
    )
    score_term_boosted = sql_score(
        "tf.tf", "dl.doc_len", boosted_idf, "c.avgdl", BM25_K1, BM25_B
    )
    # minimum_should_match: the standard disjunctive replay, scoring
    # group gated on >= 2 distinct matched query terms
    out["msm_search"] = f"""
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
          HAVING count(DISTINCT tf.term) >= 2
        )
        SELECT doc_id, round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    out["term_boosted_search"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf WHERE term IN ({terms_in}) GROUP BY term),
        scored AS (
          SELECT tf.doc_id, sum({score_term_boosted}) AS score
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    # batch serving: per-query BM25 replay unioned under query_id; the
    # tf/dl/corpus-stats CTEs are shared, each query gets its own df
    # CTE (aliased d so the shared score fragment binds) and top-20
    def _batch_sql(queries: dict, k: int) -> str:
        parts, ctes = [], []
        for qid, qtext in sorted(queries.items()):
            q_terms = sorted(set(qtext.split()))
            q_in = ", ".join(f"'{t}'" for t in q_terms)
            ctes.append(f"""
                d_{qid} AS (
                  SELECT term, count(*)::double AS df FROM tf
                  WHERE term IN ({q_in}) GROUP BY term
                ),
                s_{qid} AS (
                  SELECT tf.doc_id, sum({score}) AS score
                  FROM tf
                  JOIN d_{qid} d ON tf.term = d.term
                  JOIN dl ON tf.doc_id = dl.doc_id
                  CROSS JOIN c
                  GROUP BY tf.doc_id
                ),
                t_{qid} AS (
                  SELECT '{qid}' AS query_id, doc_id, score
                  FROM s_{qid} ORDER BY score DESC, doc_id ASC LIMIT {k}
                )""")
            parts.append(f"SELECT * FROM t_{qid}")
        return f"""
            WITH {_TF_CTE},
            dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
            c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
            {", ".join(ctes)}
            SELECT query_id, doc_id, round(score, 4) AS score
            FROM ({" UNION ALL ".join(parts)})
        """

    out["bm25_topk_batch"] = _batch_sql(BATCH_QUERIES, 20)
    out["bm25_topk_batch_driver"] = out["bm25_topk_batch"]
    out["bm25_topk_batch_50"] = _batch_sql(BATCH_QUERIES_50, 10)
    # round 5: the hybrid champion batch is bit-identical to the dense
    # batch by construction — same 50-query oracle certifies it
    out["bm25_topk_batch_impact"] = out["bm25_topk_batch_50"]
    # slot-balanced interleaving of the default vs tuned batch runs:
    # replay both rankings, then the even/odd slot algebra
    il_score_tuned = sql_score("tf.tf", "dl.doc_len", idf, "c.avgdl",
                               0.9, 0.25)
    il_ctes, ra_parts, rb_parts = [], [], []
    for qid, qtext in sorted(BATCH_QUERIES.items()):
        q_in = ", ".join(f"'{t}'" for t in sorted(set(qtext.split())))
        il_ctes.append(f"""
            ild_{qid} AS (
              SELECT term, count(*)::double AS df FROM tf
              WHERE term IN ({q_in}) GROUP BY term
            ),
            ilsa_{qid} AS (
              SELECT tf.doc_id, sum({score}) AS score
              FROM tf JOIN ild_{qid} d ON tf.term = d.term
              JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN c
              GROUP BY tf.doc_id
            ),
            ilsb_{qid} AS (
              SELECT tf.doc_id, sum({il_score_tuned}) AS score
              FROM tf JOIN ild_{qid} d ON tf.term = d.term
              JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN c
              GROUP BY tf.doc_id
            ),
            ilra_{qid} AS (
              SELECT '{qid}' AS query_id, doc_id,
                     row_number() OVER (ORDER BY score DESC, doc_id)
                       AS rank
              FROM ilsa_{qid} QUALIFY rank <= 10
            ),
            ilrb_{qid} AS (
              SELECT '{qid}' AS query_id, doc_id,
                     row_number() OVER (ORDER BY score DESC, doc_id)
                       AS rank
              FROM ilsb_{qid} QUALIFY rank <= 10
            )""")
        ra_parts.append(f"SELECT * FROM ilra_{qid}")
        rb_parts.append(f"SELECT * FROM ilrb_{qid}")
    out["interleave_runs"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        {", ".join(il_ctes)},
        runa AS ({" UNION ALL ".join(ra_parts)}),
        runb AS ({" UNION ALL ".join(rb_parts)}),
        sa AS (SELECT query_id, doc_id,
                      2 * (rank - 1)::bigint AS slot_a FROM runa),
        sb AS (SELECT query_id, doc_id,
                      (2 * (rank - 1) + 1)::bigint AS slot_b FROM runb),
        merged AS (
          SELECT coalesce(sa.query_id, sb.query_id) AS query_id,
                 coalesce(sa.doc_id, sb.doc_id) AS doc_id,
                 least(coalesce(slot_a, 4611686018427387904),
                       coalesce(slot_b, 4611686018427387904)) AS slot,
                 CASE WHEN coalesce(slot_a, 4611686018427387904)
                        < coalesce(slot_b, 4611686018427387904)
                      THEN 'a' ELSE 'b' END AS team
          FROM sa FULL JOIN sb
            ON sa.query_id = sb.query_id AND sa.doc_id = sb.doc_id
        )
        SELECT query_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY slot)::int AS rank,
               doc_id, team
        FROM merged QUALIFY rank <= 10
    """
    # federation is invisible: global stats make the segmented result
    # equal the union-corpus query, so the same oracles apply
    out["federated_search"] = out["bm25_topk"]
    out["federated_batch"] = out["bm25_topk_batch"]
    out["facet_counts_indexed"] = out["facet_counts"]
    # semi-structured props: JSON field extraction + per-type rollup
    out["json_props_agg"] = """
        WITH e AS (
          SELECT event_type,
                 json_extract_string(props, '$.k')::bigint AS k
          FROM events
        )
        SELECT event_type, count(*)::bigint AS n_events,
               sum(k)::bigint AS sum_k, min(k) AS min_k, max(k) AS max_k
        FROM e WHERE k IS NOT NULL AND k >= 10
        GROUP BY event_type
    """
    # ES terms-agg page: top-3 buckets by (count desc, key asc)
    out["terms_agg_sized"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in}))
        SELECT doc.lang, count(*)::bigint AS n_docs
        FROM m JOIN documents doc ON m.doc_id = doc.doc_id
        GROUP BY doc.lang
        ORDER BY n_docs DESC, lang ASC LIMIT 3
    """
    # ES histogram agg: floor bucketing + interior gap fill
    out["histogram_facets"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        h AS (
          SELECT floor(doc.n_chars::double / 200.0) * 200.0 AS bucket,
                 count(*) AS n_docs
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
          WHERE doc.n_chars IS NOT NULL
          GROUP BY 1
        ),
        span AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM h),
        grid AS (
          SELECT (step * 200.0) AS bucket
          FROM span,
               unnest(range((lo / 200.0)::bigint, (hi / 200.0)::bigint + 1))
                 AS t(step)
          WHERE lo IS NOT NULL
        )
        SELECT g.bucket, coalesce(h.n_docs, 0)::bigint AS n_docs
        FROM grid g LEFT JOIN h ON g.bucket = h.bucket
    """
    # ES range agg: independent (possibly overlapping) [from, to) counts
    out["range_facets"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        hits AS (
          SELECT doc.n_chars::double AS x
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
        )
        SELECT 'short' AS range_label,
               (count(*) FILTER (WHERE x IS NOT NULL AND x < 500))::bigint AS n_docs
        FROM hits
        UNION ALL
        SELECT 'mid', (count(*) FILTER (WHERE x >= 400 AND x < 1500))::bigint FROM hits
        UNION ALL
        SELECT 'long', (count(*) FILTER (WHERE x >= 1500))::bigint FROM hits
        UNION ALL
        SELECT 'none', (count(*) FILTER (WHERE x >= 1000000000))::bigint FROM hits
    """
    # ES range agg via the DSL: same counts, ES auto-key labels
    out["dsl_range_agg"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        hits AS (
          SELECT doc.n_chars::double AS x
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
        )
        SELECT '*-500.0' AS range_label,
               (count(*) FILTER (WHERE x IS NOT NULL AND x < 500))::bigint AS n_docs
        FROM hits
        UNION ALL
        SELECT '400.0-1500.0', (count(*) FILTER (WHERE x >= 400 AND x < 1500))::bigint FROM hits
        UNION ALL
        SELECT 'long', (count(*) FILTER (WHERE x >= 1500))::bigint FROM hits
    """
    # ES terms agg ordered by a metric sub-agg, size 3
    out["terms_order_metric"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        h AS (
          SELECT doc.lang, count(*)::bigint AS n_docs,
                 round(avg(doc.n_chars::double), 6) AS avg_len
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
          GROUP BY doc.lang
        )
        SELECT lang, n_docs, avg_len FROM h
        ORDER BY avg_len DESC, lang ASC LIMIT 3
    """
    # ES terms agg include/exclude: anchored regex + value list
    out["terms_filtered"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in}))
        SELECT doc.lang, count(*)::bigint AS n_docs
        FROM m JOIN documents doc ON m.doc_id = doc.doc_id
        WHERE regexp_matches(doc.lang, '^(?:e.|de|fr)$')
          AND doc.lang != 'fr'
        GROUP BY doc.lang
    """
    # ES top_metrics agg: fields read off the 3 longest matched docs
    out["top_metrics"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in}))
        SELECT doc.n_chars AS sort_value, doc.lang, doc.source
        FROM m JOIN documents doc ON m.doc_id = doc.doc_id
        ORDER BY doc.n_chars DESC NULLS LAST, doc.doc_id ASC LIMIT 3
    """
    # continuous-aggregate rollup: the range query answered from the
    # materialized table must equal the raw one-shot aggregation
    out["rollup_range"] = """
        SELECT date_trunc('hour', ts) AS bucket, event_type,
               count(*)::bigint AS n_events,
               sum(floor(value)) AS v_sum,
               max(floor(value)) AS v_max
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
          AND ts < TIMESTAMP '2024-01-20 00:00:00'
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    # incremental refresh path: full span, same raw-recompute oracle
    out["rollup_refresh"] = """
        SELECT date_trunc('hour', ts) AS bucket, event_type,
               count(*)::bigint AS n_events,
               sum(floor(value)) AS v_sum,
               max(floor(value)) AS v_max
        FROM events WHERE ts IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    # ES parent pipeline aggs: cumulative_sum + derivative as window
    # functions over the daily-bucket frame
    out["pipeline_aggs"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        h AS (
          SELECT date_trunc('day', make_timestamp(doc.doc_id * 3600 * 1000000))::timestamp
                   AS bucket,
                 count(*)::bigint AS n_docs,
                 sum(doc.n_chars::double) AS total
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
          GROUP BY 1
        )
        SELECT bucket, n_docs, total,
               round(sum(total) OVER (ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                 AS cum,
               coalesce(round(n_docs::double - lag(n_docs::double)
                 OVER (ORDER BY bucket), 6), 0.0) AS growth
        FROM h ORDER BY bucket
    """
    # ES bucket_script + bucket_selector: computed ratio + HAVING
    out["bucket_script"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        h AS (
          SELECT date_trunc('day', make_timestamp(doc.doc_id * 3600 * 1000000))::timestamp
                   AS bucket,
                 count(*)::bigint AS n_docs,
                 sum(doc.n_chars::double) AS total
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
          GROUP BY 1
        )
        SELECT bucket, n_docs, total,
               round(total / n_docs::double, 6) AS mean_len
        FROM h WHERE n_docs::double >= 5 ORDER BY bucket
    """
    # ES max_bucket sibling pipeline agg: extreme value + tied keys
    out["max_bucket"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        h AS (
          SELECT date_trunc('day', make_timestamp(doc.doc_id * 3600 * 1000000))::timestamp
                   AS bucket,
                 sum(doc.n_chars::double) AS total
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
          GROUP BY 1
        ),
        ext AS (SELECT max(total) AS value FROM h)
        SELECT ext.value,
               array_to_string(list_sort(list(
                 strftime(h.bucket, '%Y-%m-%d %H:%M:%S'))), ',') AS keys
        FROM h JOIN ext ON h.total = ext.value
        GROUP BY ext.value
    """
    # ES rare_terms agg: the long tail (<= 2 matched docs per value)
    out["rare_terms"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        h AS (
          SELECT doc.n_chars::varchar AS key, count(*)::bigint AS n_docs
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
          WHERE doc.n_chars IS NOT NULL
          GROUP BY 1
        )
        SELECT key, n_docs FROM h WHERE n_docs <= 2
        ORDER BY n_docs ASC, key ASC
    """
    # ES date_range agg over click events ([from, to), open sides,
    # overlapping 'all' window counted independently)
    out["date_range_agg"] = """
        WITH hits AS (SELECT ts FROM events WHERE event_type = 'click')
        SELECT 'w1' AS range_label,
               (count(*) FILTER (WHERE ts IS NOT NULL
                 AND ts < TIMESTAMP '2024-01-08 00:00:00'))::bigint AS n_docs
        FROM hits
        UNION ALL
        SELECT 'w2', (count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
                 AND ts < TIMESTAMP '2024-01-15 00:00:00'))::bigint FROM hits
        UNION ALL
        SELECT 'rest', (count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'))::bigint FROM hits
        UNION ALL
        SELECT 'all', (count(*) FILTER (WHERE ts IS NOT NULL))::bigint FROM hits
    """
    # ES multi_terms agg: composite (lang, source) buckets, top-8
    out["multi_terms_agg"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        h AS (
          SELECT doc.lang, doc.source, count(*)::bigint AS n_docs
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
          WHERE doc.lang IS NOT NULL AND doc.source IS NOT NULL
          GROUP BY 1, 2
        )
        SELECT lang, source, n_docs FROM h
        ORDER BY n_docs DESC, lang ASC, source ASC LIMIT 8
    """
    # ES weighted_avg metric: sum(v*w)/sum(w), null pairs skipped
    out["weighted_avg_metric"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        h AS (
          SELECT doc.n_chars::double AS x,
                 ((doc.doc_id % 7) + 1)::double AS w
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
        )
        SELECT round(sum(x * w) / sum(w), 6) AS value
        FROM h WHERE x IS NOT NULL AND w IS NOT NULL
    """
    # ES stats agg over the hit set
    out["stats_facet"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        hits AS (
          SELECT doc.n_chars::double AS x
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
        )
        SELECT count(x) AS n_docs, min(x) AS min, max(x) AS max,
               round(avg(x), 6) AS avg, sum(x) AS sum
        FROM hits
    """
    # term stats: df from the token CTE, the engine's idf formula
    out["term_stats"] = f"""
        WITH {_TF_CTE},
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN ({terms_in}) GROUP BY term)
        SELECT term, df::bigint AS df,
               round({sql_idf("c.n", "d.df")}, 6) AS idf
        FROM d, c
    """
    # ES percentiles agg: quantile_cont = Spark percentile (both
    # linear interpolation over the sorted hit values)
    out["percentiles_facet"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in})),
        hits AS (
          SELECT doc.n_chars::double AS x
          FROM m JOIN documents doc ON m.doc_id = doc.doc_id
        )
    """ + "\nUNION ALL\n".join(
        f"SELECT {p} AS percent,"
        f" round(quantile_cont(x, {p / 100.0}), 6) AS value FROM hits"
        for p in (25.0, 50.0, 75.0, 95.0, 99.0)
    )
    out["cardinality_facet"] = f"""
        WITH {_TF_CTE},
        m AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms_in}))
        SELECT count(DISTINCT doc.source)::bigint AS cardinality
        FROM m JOIN documents doc ON m.doc_id = doc.doc_id
    """
    # ES terms + top_hits: 2 best hits per source over the full
    # scored match set
    out["top_hits_facet"] = f"""
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
        h AS (
          SELECT doc.source, s.doc_id, round(s.score, 4) AS score
          FROM scored s JOIN documents doc ON s.doc_id = doc.doc_id
        ),
        r AS (
          SELECT source, doc_id, score,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY score DESC, doc_id ASC)
                   AS hit_rank
          FROM h
        )
        SELECT source, hit_rank::int AS hit_rank, doc_id, score
        FROM r WHERE hit_rank <= 2
    """
    out["snippets_indexed"] = out["snippets"]
    out["collapsed_search_indexed"] = out["collapsed_search"]
    # collapse inner_hits: page keys from the collapsed top-5, each
    # group expanded to its top-3 from the FULL scored set
    out["collapse_inner_hits"] = f"""
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
        top AS (SELECT doc_id, score FROM scored
                ORDER BY score DESC, doc_id ASC LIMIT 50),
        keyed AS (
          SELECT t.doc_id, dd.lang, t.score,
                 row_number() OVER (
                   PARTITION BY dd.lang
                   ORDER BY t.score DESC, t.doc_id ASC
                 ) AS rn
          FROM top t JOIN documents dd ON t.doc_id = dd.doc_id
        ),
        page AS (
          SELECT lang FROM (
            SELECT lang, score, doc_id FROM keyed WHERE rn = 1
            ORDER BY score DESC, doc_id ASC LIMIT 5)
        ),
        members AS (
          SELECT dd.doc_id, dd.lang
          FROM documents dd JOIN page USING (lang)
        ),
        expanded AS (
          SELECT m.lang, s.doc_id, s.score,
                 row_number() OVER (
                   PARTITION BY m.lang
                   ORDER BY s.score DESC, s.doc_id ASC
                 ) AS rank
          FROM scored s JOIN members m ON s.doc_id = m.doc_id
        )
        SELECT lang, rank::int AS rank, doc_id,
               round(score, 4) AS score
        FROM expanded WHERE rank <= 3 ORDER BY lang, rank
    """
    out["suggest_terms_indexed"] = out["suggest_terms"]
    out["fuzzy_terms_indexed"] = out["fuzzy_terms"]
    # the reference's OR-union first-seen ranking (query-order term
    # position, then doc_id) replayed as a window function
    pos_case = " ".join(
        f"WHEN '{t}' THEN {i}" for i, t in enumerate(FLAGSHIP_TERMS)
    )
    term_case = " ".join(
        f"WHEN {i} THEN '{t}'" for i, t in enumerate(FLAGSHIP_TERMS)
    )
    out["or_union_indexed"] = f"""
        WITH {_TF_CTE},
        m AS (
          SELECT doc_id,
                 min(CASE term {pos_case} END) AS term_pos
          FROM tf WHERE term IN ({terms_in}) GROUP BY doc_id
        )
        SELECT (row_number() OVER (ORDER BY term_pos, doc_id) - 1)::int
                 AS rank,
               doc_id,
               CASE term_pos {term_case} END AS matched_term
        FROM m
    """
    # percolation: distinct-token join against the compiled query-term
    # rows, per-(doc, query) distinct-match count gated by the query's
    # requirement (n_required is constant per query, so min() reads it)
    perc_rows = ", ".join(
        [f"('any', '{t}', 1)" for t in ["spark", "query"]]
        + [f"('all', '{t}', 3)" for t in FLAGSHIP_TERMS]
        + [f"('m2', '{t}', 2)" for t in FLAGSHIP_TERMS]
    )
    out["percolate"] = f"""
        WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
        dt AS (SELECT DISTINCT doc_id, term FROM toks),
        q AS (SELECT * FROM (VALUES {perc_rows})
              AS t(query_id, term, n_required))
        SELECT d.doc_id, q.query_id,
               count(DISTINCT d.term)::bigint AS n_matched
        FROM dt d JOIN q ON d.term = q.term
        GROUP BY d.doc_id, q.query_id
        HAVING count(DISTINCT d.term) >= min(q.n_required)
    """
    # the streaming replay unions per-micro-batch percolations of a
    # doc-id-parity split; percolation is per-doc, so the oracle is
    # the identical one-shot join
    out["percolate_stream"] = out["percolate"]
    out["search_count"] = f"""
        WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
        SELECT count(DISTINCT doc_id)::bigint AS n_hits
        FROM toks WHERE term IN ({terms_in})
    """
    # significant terms: fg/bg DOCUMENT frequencies over distinct
    # (doc, term) pairs, JLH = (fg% - bg%) * fg% / bg% in the same
    # left-to-right double arithmetic as the Spark column expression
    out["significant_terms"] = f"""
        WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
        dt AS (SELECT DISTINCT doc_id, term FROM toks),
        fg AS (SELECT DISTINCT doc_id FROM dt WHERE term IN ({terms_in})),
        nfg AS (SELECT count(*)::double AS n_fg FROM fg),
        nbg AS (SELECT count(*)::double AS n_bg FROM documents),
        fgc AS (SELECT term, count(*)::bigint AS fg_df
                FROM dt JOIN fg USING (doc_id) GROUP BY term),
        bgc AS (SELECT term, count(*)::bigint AS bg_df FROM dt GROUP BY term)
        SELECT f.term, f.fg_df, b.bg_df,
               round(((f.fg_df / n_fg) - (b.bg_df / n_bg))
                     * (f.fg_df / n_fg) / (b.bg_df / n_bg), 6) AS score
        FROM fgc f JOIN bgc b USING (term), nfg, nbg
        WHERE f.fg_df >= 2 AND f.term NOT IN ({terms_in})
        ORDER BY score DESC, term ASC LIMIT 20
    """
    # weekly cohort retention: epoch-week offsets, exact integers
    out["cohort_retention"] = """
        WITH f AS (
          SELECT user_id,
                 date_trunc('week', min(ts))::timestamp AS cohort
          FROM events GROUP BY user_id
        ),
        a AS (
          SELECT DISTINCT e.user_id, f.cohort,
                 (date_diff('day', f.cohort::date,
                            date_trunc('week', e.ts)::date) // 7)::int
                   AS period_n
          FROM events e JOIN f USING (user_id)
        ),
        act AS (SELECT cohort, period_n,
                       count(DISTINCT user_id)::bigint AS n_active
                FROM a GROUP BY cohort, period_n),
        sz AS (SELECT cohort, count(*)::bigint AS s FROM f
               GROUP BY cohort)
        SELECT act.cohort, act.period_n, act.n_active,
               round(act.n_active / sz.s::double, 6) AS retention
        FROM act JOIN sz USING (cohort)
        ORDER BY cohort, period_n
    """

    # export this part's locals for later parts (exact closure
    # semantics of the original single-function implementation)
    g.update({k: v for k, v in locals().items()
              if k not in ('out', 'g') and not k.startswith('__')})
    return out
