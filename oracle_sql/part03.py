"""Oracle SQL definitions, part 03 (mechanically split from the
former __spark_entry__.oracle_sql body; source lines 6401-7237
of the pre-split file). Board entries defined here:

analyzed_tokens ann_int8 bm25_topk_analyzed
bm25_topk_analyzed_driver bucket_anomalies contamination
corpus_mix_report decontaminated doc_term_vectors dsir_selected
dsir_weights en event_transitions funnel_counts line_dedup_drop_all
line_dedup_keep_first lm_perplexity lm_ppl_filtered
lm_suggest_phrase near_search_indexed near_search_indexed_spark
pagerank phrase_prefix_search phrase_search_analyzed
phrase_search_indexed phrase_search_indexed_spark pii_census
pii_redact proximity_search_indexed proximity_search_indexed_spark
repetition_filtered repetition_stats session_stats
significant_terms_bg span_first_search stratified_sample
stream_sessions train_val_split zh
"""

# flake8: noqa: E501


def add(out, g):
    ANN_K = g.get("ANN_K")
    _CLS_NF = g.get("_CLS_NF")
    _TF_CTE = g.get("_TF_CTE")
    _TOKS = g.get("_TOKS")
    _analyzed_cte = g.get("_analyzed_cte")
    i = g.get("i")
    score = g.get("score")
    sql_murmur3_u32_duckdb = g.get("sql_murmur3_u32_duckdb")
    stop_cnt = g.get("stop_cnt")
    terms_in = g.get("terms_in")

    out["funnel_counts"] = """
        WITH fs AS (
          SELECT user_id, event_type, min(ts) AS ft FROM events
          WHERE event_type IN ('view', 'click', 'purchase')
          GROUP BY user_id, event_type
        ),
        w AS (
          SELECT user_id,
                 min(ft) FILTER (WHERE event_type = 'view') AS s0,
                 min(ft) FILTER (WHERE event_type = 'click') AS s1,
                 min(ft) FILTER (WHERE event_type = 'purchase') AS s2
          FROM fs GROUP BY user_id
        )
        SELECT 0 AS step_idx, 'view' AS step,
               (count(*) FILTER (WHERE s0 IS NOT NULL))::bigint
                 AS n_users FROM w
        UNION ALL
        SELECT 1, 'click',
               (count(*) FILTER (WHERE s0 IS NOT NULL
                 AND s1 IS NOT NULL AND s1 >= s0))::bigint FROM w
        UNION ALL
        SELECT 2, 'purchase',
               (count(*) FILTER (WHERE s0 IS NOT NULL
                 AND s1 IS NOT NULL AND s1 >= s0
                 AND s2 IS NOT NULL
                 AND s2 >= greatest(s0, s1)))::bigint FROM w
    """
    # trailing z-score anomaly flags over the daily click timeline
    out["bucket_anomalies"] = """
        WITH h AS (
          SELECT date_trunc('day', ts)::timestamp AS bucket,
                 count(*)::bigint AS n
          FROM events WHERE event_type = 'click' GROUP BY 1
        )
        SELECT bucket, n,
               round(coalesce(avg(n::double) OVER trail, 0.0), 6)
                 AS trail_mean,
               round(coalesce(stddev_pop(n::double) OVER trail, 0.0), 6)
                 AS trail_std,
               (count(*) OVER trail >= 2
                AND coalesce(stddev_pop(n::double) OVER trail, 0.0) > 0
                AND abs(n::double - avg(n::double) OVER trail)
                    > 2.0 * stddev_pop(n::double) OVER trail)
                 AS is_anomaly
        FROM h
        WINDOW trail AS (ORDER BY bucket
                         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        ORDER BY bucket
    """
    # background_filter variant: bg df and n_bg from the lang='en'
    # subset only; terms outside it drop out (inner join)
    out["significant_terms_bg"] = f"""
        WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
        dt AS (SELECT DISTINCT doc_id, term FROM toks),
        fg AS (SELECT DISTINCT doc_id FROM dt WHERE term IN ({terms_in})),
        bgd AS (SELECT doc_id FROM documents WHERE lang = 'en'),
        nfg AS (SELECT count(*)::double AS n_fg FROM fg),
        nbg AS (SELECT count(*)::double AS n_bg FROM bgd),
        fgc AS (SELECT term, count(*)::bigint AS fg_df
                FROM dt JOIN fg USING (doc_id) GROUP BY term),
        bgc AS (SELECT term, count(*)::bigint AS bg_df
                FROM dt JOIN bgd USING (doc_id) GROUP BY term)
        SELECT f.term, f.fg_df, b.bg_df,
               round(((f.fg_df / n_fg) - (b.bg_df / n_bg))
                     * (f.fg_df / n_fg) / (b.bg_df / n_bg), 6) AS score
        FROM fgc f JOIN bgc b USING (term), nfg, nbg
        WHERE f.fg_df >= 2 AND f.term NOT IN ({terms_in})
        ORDER BY score DESC, term ASC LIMIT 15
    """
    # exact-phrase BM25: the phrase is doc 0's first two tokens,
    # derived in-SQL (ph CTE) exactly as q_phrase_indexed derives it
    # driver-side; adjacency = a token-array window filter
    out["phrase_search_indexed"] = f"""
        WITH {_TF_CTE},
        t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        ph AS (SELECT toks[1] AS a, toks[2] AS b FROM t WHERE doc_id = 0),
        m AS (
          SELECT t.doc_id FROM t, ph
          WHERE len(list_filter(range(1, len(toks)),
                                i -> toks[i] = a AND toks[i+1] = b)) > 0
        ),
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        pterms AS (SELECT a AS term FROM ph UNION SELECT b FROM ph),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN (SELECT term FROM pterms) GROUP BY term),
        scored AS (
          SELECT tf.doc_id, sum({score}) AS score
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          WHERE tf.doc_id IN (SELECT doc_id FROM m)
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    out["phrase_search_indexed_spark"] = out["phrase_search_indexed"]
    # span_first: same phrase window filter + the end bound (the
    # 1-based adjacency index i equals the 0-based position of the
    # phrase's LAST token, so "span ends within first 8" is i < 8)
    out["span_first_search"] = f"""
        WITH {_TF_CTE},
        t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        ph AS (SELECT toks[1] AS a, toks[2] AS b FROM t WHERE doc_id = 0),
        m AS (
          SELECT t.doc_id FROM t, ph
          WHERE len(list_filter(range(1, len(toks)),
                                i -> toks[i] = a AND toks[i+1] = b
                                     AND i < 8)) > 0
        ),
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        pterms AS (SELECT a AS term FROM ph UNION SELECT b FROM ph),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN (SELECT term FROM pterms) GROUP BY term),
        scored AS (
          SELECT tf.doc_id, sum({score}) AS score
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          WHERE tf.doc_id IN (SELECT doc_id FROM m)
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
    """

    # per-doc term vectors: parallel unnest zips (term, 0-based pos)
    out["doc_term_vectors"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents
                   WHERE doc_id IN (0, 1, 2, 3, 4)),
        occ AS (SELECT doc_id, unnest(toks) AS term,
                       unnest(range(len(toks))) AS pos FROM t)
        SELECT doc_id, term, count(*)::bigint AS tf,
               string_agg(pos::varchar, ',' ORDER BY pos) AS positions
        FROM occ GROUP BY doc_id, term
    """

    # phrase-prefix (match_phrase_prefix): fixed term a = doc 0's
    # first token, prefix p = first 3 chars of its second token;
    # expansions = top-50 prefix terms by (df desc, term asc) — the
    # SAME cap order suggest_terms uses; match = a followed by ANY
    # expansion; score = partials of {a} UNION (expansions the doc
    # contains)
    out["phrase_prefix_search"] = f"""
        WITH {_TF_CTE},
        t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        ph AS (SELECT toks[1] AS a, substr(toks[2], 1, 3) AS p
               FROM t WHERE doc_id = 0),
        exps AS (
          SELECT term FROM (
            SELECT tf.term, count(*) AS df FROM tf, ph
            WHERE starts_with(tf.term, p) GROUP BY tf.term
            ORDER BY df DESC, term ASC LIMIT 50
          )
        ),
        el AS (SELECT list(term) AS el FROM exps),
        m AS (
          SELECT t.doc_id FROM t, ph, el
          WHERE len(list_filter(range(1, len(toks)),
                i -> toks[i] = a AND list_contains(el.el, toks[i+1]))) > 0
        ),
        sterms AS (SELECT a AS term FROM ph UNION SELECT term FROM exps),
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN (SELECT term FROM sterms) GROUP BY term),
        scored AS (
          SELECT tf.doc_id, sum({score}) AS score
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          WHERE tf.doc_id IN (SELECT doc_id FROM m)
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
    """

    # --- analysis chain (stopwords + S-stem) ---------------------------
    from hadoop_search_engine_spark.functions.analyzer import (
        ENGLISH_STOPWORDS as _STOPS,
    )
    from hadoop_search_engine_spark.functions.analyzer import (
        sql_s_stem_duckdb as _dd_stem,
    )

    _atoks, _atf_cte = _analyzed_cte()
    out["analyzed_tokens"] = (
        f"SELECT doc_id, unnest({_atoks}) AS term FROM documents"
    )
    # the raw ANALYZED_QUERY analyzes to exactly the flagship terms
    # (stopwords dropped, queries->query, tables->table); corpus tf/df
    # recomputed over analyzed tokens
    out["bm25_topk_analyzed"] = f"""
        WITH {_atf_cte},
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
    """
    out["bm25_topk_analyzed_driver"] = out["bm25_topk_analyzed"]
    # analyzed phrase: doc 0's first adjacent ANALYZED pair that is a
    # fixed point of the analyzer (not a stopword, stem-stable) — the
    # same pair q_phrase_search_analyzed picks in Python
    _stops_in = ", ".join(f"'{w}'" for w in sorted(set(_STOPS)))
    _fx = (
        lambda x: f"({x} NOT IN ({_stops_in}) AND ({_dd_stem(x)}) = {x})"
    )
    out["phrase_search_analyzed"] = f"""
        WITH {_atf_cte},
        t AS (SELECT doc_id, {_atoks} AS toks FROM documents),
        ph AS (
          SELECT toks[i] AS a, toks[i + 1] AS b FROM (
            SELECT toks,
                   list_filter(range(1, len(toks)),
                               i -> {_fx('toks[i]')} AND {_fx('toks[i+1]')})[1] AS i
            FROM t WHERE doc_id = 0
          )
        ),
        m AS (
          SELECT t.doc_id FROM t, ph
          WHERE len(list_filter(range(1, len(toks)),
                                i -> toks[i] = a AND toks[i+1] = b)) > 0
        ),
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        pterms AS (SELECT a AS term FROM ph UNION SELECT b FROM ph),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN (SELECT term FROM pterms) GROUP BY term),
        scored AS (
          SELECT tf.doc_id, sum({score}) AS score
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          WHERE tf.doc_id IN (SELECT doc_id FROM m)
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    # ordered proximity (slop=2): doc 0's 1st and 3rd tokens; a doc
    # matches iff token b follows token a within 1..3 positions. The
    # window is a position self-join over the parallel-unnested token
    # array; scoring is the standard BM25 sum over the two terms.
    out["proximity_search_indexed"] = f"""
        WITH {_TF_CTE},
        t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        ph AS (SELECT toks[1] AS a, toks[3] AS b FROM t WHERE doc_id = 0),
        tpos AS (
          SELECT doc_id, unnest(toks) AS term,
                 unnest(range(1, len(toks) + 1)) AS pos
          FROM t
        ),
        m AS (
          SELECT DISTINCT p1.doc_id
          FROM tpos p1, tpos p2, ph
          WHERE p1.doc_id = p2.doc_id
            AND p1.term = ph.a AND p2.term = ph.b
            AND p2.pos - p1.pos BETWEEN 1 AND 3
        ),
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        pterms AS (SELECT a AS term FROM ph UNION SELECT b FROM ph),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN (SELECT term FROM pterms) GROUP BY term),
        scored AS (
          SELECT tf.doc_id, sum({score}) AS score
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          WHERE tf.doc_id IN (SELECT doc_id FROM m)
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    out["proximity_search_indexed_spark"] = out["proximity_search_indexed"]
    # unordered proximity (window=4): a doc matches iff some window
    # starting AT an occurrence of either term contains both terms —
    # the slid-left-to-an-occurrence normal form of "both terms within
    # any 4-token window, either order"
    out["near_search_indexed"] = f"""
        WITH {_TF_CTE},
        t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        ph AS (SELECT toks[1] AS a, toks[3] AS b FROM t WHERE doc_id = 0),
        tpos AS (
          SELECT doc_id, unnest(toks) AS term,
                 unnest(range(1, len(toks) + 1)) AS pos
          FROM t
        ),
        m AS (
          SELECT DISTINCT s.doc_id
          FROM tpos s, ph
          WHERE s.term IN (ph.a, ph.b)
            AND EXISTS (SELECT 1 FROM tpos o WHERE o.doc_id = s.doc_id
                        AND o.term = ph.a
                        AND o.pos BETWEEN s.pos AND s.pos + 3)
            AND EXISTS (SELECT 1 FROM tpos o WHERE o.doc_id = s.doc_id
                        AND o.term = ph.b
                        AND o.pos BETWEEN s.pos AND s.pos + 3)
        ),
        dl AS (SELECT doc_id, sum(tf)::double AS doc_len FROM tf GROUP BY doc_id),
        c AS (SELECT count(*)::double AS n, avg(doc_len) AS avgdl FROM dl),
        pterms AS (SELECT a AS term FROM ph UNION SELECT b FROM ph),
        d AS (SELECT term, count(*)::double AS df FROM tf
              WHERE term IN (SELECT term FROM pterms) GROUP BY term),
        scored AS (
          SELECT tf.doc_id, sum({score}) AS score
          FROM tf
          JOIN d ON tf.term = d.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN c
          WHERE tf.doc_id IN (SELECT doc_id FROM m)
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
    """
    out["near_search_indexed_spark"] = out["near_search_indexed"]
    # deterministic split: the murmur3 bucket CASE replayed in SQL
    from hadoop_search_engine_spark.operators.curate import (
        sql_split_duckdb,
    )

    out["train_val_split"] = (
        f"SELECT doc_id, {sql_split_duckdb()} AS split FROM documents"
    )
    # deterministic stratified sampling: the same murmur3 bucket, a
    # per-stratum CASE threshold as a WHERE predicate
    from hadoop_search_engine_spark.operators.curate import (
        sql_sample_predicate_duckdb,
    )

    out["stratified_sample"] = (
        "SELECT doc_id, lang FROM documents WHERE "
        + sql_sample_predicate_duckdb(
            {"en": 0.2, "zh": 1.0}, strata_col="lang", default_rate=0.5
        )
    )
    # decontamination: the deterministic split replayed, 4-gram
    # shingles, eval-set overlap per train doc
    _decon_cte = f"""
        WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        sp AS (SELECT doc_id, {sql_split_duckdb()} AS split FROM documents),
        sh AS (
          SELECT DISTINCT doc_id,
                 array_to_string(toks[i : i + 3], ' ') AS shingle
          FROM tok, unnest(range(1, len(toks) - 2)) AS t(i)
          WHERE len(toks) >= 4
        ),
        ev AS (SELECT DISTINCT shingle FROM sh JOIN sp USING (doc_id)
               WHERE split = 'test'),
        tr AS (SELECT sh.* FROM sh JOIN sp USING (doc_id)
               WHERE split <> 'test'),
        sizes AS (SELECT doc_id, count(*) AS n_shingles FROM tr
                  GROUP BY doc_id),
        ov AS (SELECT doc_id, count(*) AS overlap FROM tr
               JOIN ev USING (shingle) GROUP BY doc_id)
    """
    out["contamination"] = _decon_cte + """
        SELECT doc_id, n_shingles, overlap,
               round(overlap / n_shingles, 6) AS rate
        FROM ov JOIN sizes USING (doc_id) WHERE overlap >= 1
    """
    out["decontaminated"] = _decon_cte + """
        SELECT doc_id FROM sp
        WHERE split <> 'test'
          AND doc_id NOT IN (SELECT doc_id FROM ov WHERE overlap >= 1)
    """
    # repeated-line (boilerplate) removal over the synthetic
    # header-lines shape: source/lang lines repeat corpus-wide, the
    # body line is unique
    def _line_dedup_sql(keep_pred: str) -> str:
        return f"""
        WITH ls AS (
          SELECT doc_id,
                 string_split(source || chr(10) || lang || chr(10) || text,
                              chr(10)) AS l
          FROM documents
        ),
        lines AS (
          SELECT doc_id, unnest(l) AS line,
                 unnest(range(0, len(l))) AS pos
          FROM ls
        ),
        stats AS (SELECT line, count(*) AS df FROM lines GROUP BY line),
        ranked AS (
          SELECT doc_id, pos, line,
                 row_number() OVER (PARTITION BY line
                                    ORDER BY doc_id, pos) AS rn
          FROM lines
        ),
        kept AS (
          SELECT r.doc_id, r.pos, r.line
          FROM ranked r JOIN stats USING (line)
          WHERE {keep_pred}
        )
        SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        FROM kept GROUP BY doc_id
        """

    out["line_dedup_drop_all"] = _line_dedup_sql("df <= 3")
    out["line_dedup_keep_first"] = _line_dedup_sql("df <= 3 OR rn = 1")
    # PII redaction / census over the planted-PII text shape
    from hadoop_search_engine_spark.operators.text_analysis import (
        PII_PATTERNS,
        sql_redact_duckdb,
    )

    _pii_text = (
        "text || ' ' || source || '@mail.' || lang"
        " || ' from 10.0.' || (doc_id % 200)::varchar || '.7'"
        " || ' call +1 555-01' || lpad((doc_id % 90)::varchar, 2, '0')"
    )
    out["pii_redact"] = (
        f"SELECT doc_id, {sql_redact_duckdb(_pii_text)} AS text "
        "FROM documents"
    )
    # ::bigint on every sum: DuckDB sums render as HUGEINT/DECIMAL and the
    # driver's value normalization hash-mismatches vs Spark BIGINT otherwise
    # (same bug class as the round-1 doc_stats red row).
    _pii_aggs = ["count(*)::bigint AS n_docs"]
    for _kind, (_pat, _r) in PII_PATTERNS.items():
        _c = f"len(regexp_extract_all({_pii_text}, '{_pat}'))"
        _pii_aggs.append(f"sum({_c})::bigint AS {_kind}_matches")
        _pii_aggs.append(
            f"sum(CASE WHEN {_c} > 0 THEN 1 ELSE 0 END)::bigint"
            f" AS {_kind}_docs"
        )
    out["pii_census"] = (
        "SELECT " + ", ".join(_pii_aggs) + " FROM documents"
    )
    # int8 ANN: quantization + integer dots replayed exactly
    out["ann_int8"] = f"""
        WITH base AS (
          SELECT vec_id, embedding::double[] AS v,
                 list_max(list_transform(embedding::double[],
                                         x -> abs(x))) AS m
          FROM embeddings
        ),
        qt AS (
          SELECT vec_id,
                 CASE WHEN m > 0
                      THEN list_transform(v, x -> floor(x / (m / 127.0)
                                                        + 0.5))
                      ELSE list_transform(v, x -> 0.0) END AS q
          FROM base
        ),
        qq AS (SELECT q FROM qt WHERE vec_id = 0)
        SELECT t.vec_id,
               CASE WHEN list_dot_product(t.q, t.q) > 0
                    THEN round(list_dot_product(t.q, qq.q)
                               / (sqrt(list_dot_product(t.q, t.q))
                                  * sqrt(list_dot_product(qq.q, qq.q))),
                               6)
                    ELSE 0.0 END AS cosine
        FROM qt t, qq
        ORDER BY cosine DESC, t.vec_id ASC LIMIT {ANN_K}
    """
    # pagerank: the fixed-point update unrolled 4 iterations over the
    # same hash-derived edges
    from hadoop_search_engine_spark.functions.hashes import (
        sql_murmur3_u32_duckdb,
    )
    from hadoop_search_engine_spark.operators.graph import (
        sql_pagerank_duckdb,
    )

    _pr_h1 = sql_murmur3_u32_duckdb("(doc_id)::varchar")
    _pr_edges = " UNION ALL ".join(
        f"SELECT doc_id AS src, "
        f"({sql_murmur3_u32_duckdb(chr(39) + f'link{j}' + chr(39), seed=_pr_h1)})"
        f" % (SELECT count(*) FROM documents) AS dst FROM documents"
        for j in range(3)
    )
    out["pagerank"] = sql_pagerank_duckdb(_pr_edges, n_iters=3)
    # sessionization: the same lag/cumsum windows at exact unix micros
    _sess_cte = """
        WITH o AS (
          SELECT user_id, event_id, event_type, value,
                 epoch_us(ts) AS us
          FROM events
        ),
        lagd AS (
          SELECT *, lag(us) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS prev
          FROM o
        ),
        marked AS (
          SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
                         THEN 1 ELSE 0 END AS ns
          FROM lagd
        ),
        sess AS (
          SELECT *, (sum(ns) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id
                                   ROWS UNBOUNDED PRECEDING) - 1)::int
                      AS session_idx
          FROM marked
        )
    """
    out["session_stats"] = _sess_cte + """
        SELECT user_id, session_idx, count(*) AS n_events,
               min(us)::varchar AS start_us, max(us)::varchar AS end_us,
               round(sum(value), 6) AS value_sum,
               round((max(us) - min(us)) / 1e6, 6) AS duration_sec
        FROM sess GROUP BY user_id, session_idx
    """
    # streaming sessionization: closed sessions only = every batch
    # session except each user's last (still open at end of stream)
    out["stream_sessions"] = _sess_cte + """
        , stats AS (
          SELECT user_id, session_idx, count(*) AS n_events,
                 min(us)::varchar AS start_us, max(us)::varchar AS end_us,
                 round(sum(value), 6) AS value_sum
          FROM sess GROUP BY user_id, session_idx
        )
        SELECT user_id, session_idx, n_events, start_us, end_us,
               value_sum
        FROM (SELECT *, max(session_idx) OVER (PARTITION BY user_id)
                        AS mx FROM stats)
        WHERE session_idx < mx
    """
    out["event_transitions"] = _sess_cte + """
        , tr AS (
          SELECT CASE WHEN ns = 1 THEN NULL
                      ELSE lag(event_type) OVER (PARTITION BY user_id
                                                 ORDER BY us, event_id)
                 END AS prev_type,
                 event_type AS next_type
          FROM sess
        )
        SELECT prev_type, next_type, count(*) AS n
        FROM tr WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    """
    # within-doc repetition: bigram occurrence vs distinct counts
    _rep_cte = f"""
        WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (
          SELECT doc_id, array_to_string(toks[i : i + 1], ' ') AS gram
          FROM tok, unnest(range(1, len(toks))) AS t(i)
          WHERE len(toks) >= 2
        ),
        st AS (SELECT doc_id, count(*) AS n_ngrams,
                      count(DISTINCT gram) AS n_distinct
               FROM g GROUP BY doc_id),
        rep AS (
          SELECT d.doc_id,
                 coalesce(st.n_ngrams, 0)::int AS n_ngrams,
                 coalesce(st.n_distinct, 0)::int AS n_distinct,
                 CASE WHEN st.n_ngrams > 0
                      THEN round(1 - st.n_distinct::double / st.n_ngrams, 6)
                      ELSE 0.0 END AS dup_ratio
          FROM documents d LEFT JOIN st USING (doc_id)
        )
    """
    out["repetition_stats"] = _rep_cte + """
        SELECT doc_id, n_ngrams, n_distinct, dup_ratio FROM rep
    """
    out["repetition_filtered"] = _rep_cte + """
        SELECT doc_id FROM rep WHERE dup_ratio <= 0.2
    """
    # Stupid-Backoff bigram LM (operators/lm.py): unigram/bigram counts
    # from one tokenize, per-token log-probs QUANTIZED to int64
    # micro-nats before summation (order-free, engine-exact — the
    # fixed-point-PageRank trick), ppl from the exact sum. First token
    # scores add-one unigram; seen bigram c(vw)/c(v); else 0.4 * p_uni.
    from hadoop_search_engine_spark.operators.lm import EDIT_LLQ, LLQ_SCALE

    _lm_cte = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        uni AS (
          SELECT term, count(*)::BIGINT AS c
          FROM (SELECT unnest(t) AS term FROM t) GROUP BY term
        ),
        tot AS (SELECT sum(c)::BIGINT AS n, count(*)::BIGINT AS v FROM uni),
        tok AS (
          SELECT doc_id, unnest(t) AS w,
                 unnest(range(1, len(t) + 1)) AS pos, t
          FROM t
        ),
        tok2 AS (
          SELECT doc_id, w, pos,
                 CASE WHEN pos > 1 THEN t[pos - 1] END AS w_prev
          FROM tok
        ),
        big AS (
          SELECT w_prev, w, count(*)::BIGINT AS c
          FROM tok2 WHERE pos > 1 GROUP BY w_prev, w
        )
    """
    _lm_perdoc = f"""
        , costed AS (
          SELECT tok2.doc_id,
                 CAST(round(CASE
                   WHEN pos = 1 THEN
                     ln((coalesce(uw.c, 0) + 1) / (tot.n + tot.v + 1))
                   WHEN coalesce(bg.c, 0) > 0 AND coalesce(up.c, 0) > 0 THEN
                     ln(bg.c / up.c)
                   ELSE
                     ln(0.4 * ((coalesce(uw.c, 0) + 1) / (tot.n + tot.v + 1)))
                 END * {LLQ_SCALE}) AS BIGINT) AS llq
          FROM tok2
          LEFT JOIN uni uw ON uw.term = tok2.w
          LEFT JOIN uni up ON up.term = tok2.w_prev
          LEFT JOIN big bg ON bg.w_prev = tok2.w_prev AND bg.w = tok2.w
          CROSS JOIN tot
        ),
        perdoc AS (
          SELECT doc_id, sum(llq)::BIGINT AS sum_llq,
                 count(*)::BIGINT AS n_tokens
          FROM costed GROUP BY doc_id
        ),
        ppl AS (
          SELECT d.doc_id,
                 coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
                 coalesce(p.sum_llq, 0)::BIGINT AS sum_llq,
                 CASE WHEN coalesce(p.n_tokens, 0) > 0
                      THEN exp(-(p.sum_llq / {LLQ_SCALE}.0) / p.n_tokens)
                      ELSE 0.0 END AS ppl
          FROM documents d LEFT JOIN perdoc p USING (doc_id)
        )
    """
    out["lm_perplexity"] = _lm_cte + _lm_perdoc + """
        SELECT doc_id, n_tokens, sum_llq::VARCHAR AS sum_llq, ppl FROM ppl
    """
    out["lm_ppl_filtered"] = _lm_cte + _lm_perdoc + """
        SELECT doc_id FROM ppl WHERE n_tokens = 0 OR ppl <= 30.5
    """
    # phrase suggester: doc 0's first two tokens each + 'x', per-token
    # candidates = vocab within 1 edit capped 5 by (dist, c desc, term),
    # every lattice path enumerated and scored with the same quantized
    # LM + per-edit ln(0.1) channel penalty the Spark Viterbi uses
    out["lm_suggest_phrase"] = _lm_cte + f"""
        , qt AS (SELECT t[1] || 'x' AS q0, t[2] || 'x' AS q1
                 FROM t WHERE doc_id = 0),
        c0 AS (
          SELECT term, c, levenshtein(term, (SELECT q0 FROM qt)) AS dist
          FROM uni WHERE levenshtein(term, (SELECT q0 FROM qt)) <= 1
          ORDER BY dist ASC, c DESC, term ASC LIMIT 5
        ),
        c1 AS (
          SELECT term, c, levenshtein(term, (SELECT q1 FROM qt)) AS dist
          FROM uni WHERE levenshtein(term, (SELECT q1 FROM qt)) <= 1
          ORDER BY dist ASC, c DESC, term ASC LIMIT 5
        ),
        paths AS (
          SELECT c0.term || ' ' || c1.term AS suggestion,
                 (CAST(round(ln((c0.c + 1) / (tot.n + tot.v + 1))
                             * {LLQ_SCALE}) AS BIGINT)
                  + c0.dist * ({EDIT_LLQ})
                  + CASE WHEN coalesce(bg.c, 0) > 0 THEN
                      CAST(round(ln(bg.c / c0.c) * {LLQ_SCALE}) AS BIGINT)
                    ELSE
                      CAST(round(ln(0.4 * ((c1.c + 1) / (tot.n + tot.v + 1)))
                                 * {LLQ_SCALE}) AS BIGINT)
                    END
                  + c1.dist * ({EDIT_LLQ})) AS score_q
          FROM c0 CROSS JOIN c1 CROSS JOIN tot
          LEFT JOIN big bg ON bg.w_prev = c0.term AND bg.w = c1.term
        )
        SELECT suggestion, score_q / {LLQ_SCALE}.0 AS score
        FROM paths ORDER BY score_q DESC, suggestion ASC LIMIT 3
    """
    # data-mix report: the quality formula replayed per doc, grouped
    # by (lang, source), shares from a 1-row totals cross join
    out["corpus_mix_report"] = f"""
        WITH t AS (
          SELECT lang, source, {_TOKS} AS toks, text,
                 length(text) AS n_chars,
                 length(text) - length(regexp_replace(text,
                     '[^\\w\\s]', '', 'g')) AS n_punct
          FROM documents
        ),
        q AS (
          SELECT lang, source, len(toks) AS nt,
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
        ),
        g AS (
          SELECT lang, source, count(*)::bigint AS n_docs,
                 sum(nt)::bigint AS n_tokens,
                 round(avg(quality), 6) AS avg_quality
          FROM q GROUP BY lang, source
        ),
        tot AS (SELECT sum(n_docs)::double AS td,
                       sum(n_tokens)::double AS tt FROM g)
        SELECT lang, source, n_docs, n_tokens, avg_quality,
               round(n_docs / td, 6) AS doc_share,
               round(n_tokens / tt, 6) AS token_share
        FROM g, tot
    """
    # DSIR (operators/dsir.py): hashed unigram+bigram features
    # (murmur3 % 1024, replayed bit-exactly over distinct grams), raw
    # vs target(lang='en') add-one distributions, per-feature
    # log-ratios quantized to int64 micro-nats, per-doc exact sums,
    # Gumbel top-k keyed by the murmur-seeded uniform
    from hadoop_search_engine_spark.functions.hashes import (
        sql_murmur3_u32_duckdb as _mm_sql,
    )
    from hadoop_search_engine_spark.operators.dsir import (
        LLQ_SCALE as _DSIR_SCALE,
    )

    _dsir_nf = 1024
    _dsir_cte = f"""
        WITH t AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
        tok AS (
          SELECT doc_id, lang, unnest(t) AS w,
                 unnest(range(1, len(t) + 1)) AS pos, t
          FROM t
        ),
        gram AS (
          SELECT doc_id, lang, w AS g FROM tok
          UNION ALL
          SELECT doc_id, lang, t[pos - 1] || ' ' || w AS g
          FROM tok WHERE pos > 1
        ),
        gf AS (
          SELECT g, ({_mm_sql("g")}) % {_dsir_nf} AS feature
          FROM (SELECT DISTINCT g FROM gram)
        ),
        gfeat AS (
          SELECT gram.doc_id, gram.lang, gf.feature
          FROM gram JOIN gf USING (g)
        ),
        raw_c AS (SELECT feature, count(*)::BIGINT AS c
                  FROM gfeat GROUP BY feature),
        tgt_c AS (SELECT feature, count(*)::BIGINT AS ct
                  FROM gfeat WHERE lang = 'en' GROUP BY feature),
        rt AS (SELECT sum(c)::BIGINT AS n_raw FROM raw_c),
        tt AS (SELECT sum(ct)::BIGINT AS n_tgt FROM tgt_c),
        lam AS (
          SELECT feature,
                 CAST(round(ln((coalesce(ct, 0) + 1)
                               / (tt.n_tgt + {_dsir_nf}))
                            * {_DSIR_SCALE}) AS BIGINT)
               - CAST(round(ln((coalesce(c, 0) + 1)
                               / (rt.n_raw + {_dsir_nf}))
                            * {_DSIR_SCALE}) AS BIGINT) AS lambda_llq
          FROM raw_c FULL OUTER JOIN tgt_c USING (feature)
          CROSS JOIN rt CROSS JOIN tt
        ),
        dw AS (
          SELECT gfeat.doc_id, sum(lam.lambda_llq)::BIGINT AS dsir_llq
          FROM gfeat JOIN lam USING (feature) GROUP BY gfeat.doc_id
        ),
        w AS (
          SELECT d.doc_id, d.lang,
                 coalesce(dw.dsir_llq, 0)::BIGINT AS dsir_llq
          FROM documents d LEFT JOIN dw USING (doc_id)
        )
    """
    out["dsir_weights"] = _dsir_cte + """
        SELECT doc_id, dsir_llq::VARCHAR AS dsir_llq FROM w
    """
    _h_id = _mm_sql("(doc_id)::varchar")
    _h_gum = _mm_sql("'dsir'", seed=_h_id)
    out["dsir_selected"] = _dsir_cte + f"""
        , keyed AS (
          SELECT doc_id, lang, dsir_llq,
                 dsir_llq + CAST(round(
                     -ln(-ln((({_h_gum}) + 0.5) / 4294967296.0))
                     * {float(1.0) * _DSIR_SCALE}) AS BIGINT) AS key_llq
          FROM w
        )
        SELECT doc_id, lang, dsir_llq::VARCHAR AS dsir_llq,
               key_llq::VARCHAR AS key_llq
        FROM (SELECT * FROM keyed
              ORDER BY key_llq DESC, doc_id ASC LIMIT 50)
    """
    # learned classifier (operators/classifier.py): hashed-ngram
    # PRESENCE features + intercept, int64-quantized full-batch GD
    # unrolled iteration-by-iteration as CTEs (the IVF-Lloyd pattern).
    # Weights are exact int64 micro-units; residuals are quantized
    # BEFORE the gradient sum, so every aggregate is an order-free
    # int64 sum and the unroll is bit-identical to the Spark loop.
    _sig = "1.0 / (1.0 + exp(-(mm::DOUBLE / 1000000.0)))"

    def _cls_iter(i: int) -> str:
        """One GD step: margins from w{i-1} -> quantized residuals ->
        int64 gradients -> rounded weight update (zeros dropped; a
        zero weight is indistinguishable from an absent one in every
        consumer, matching the Spark trainer's canonical table)."""
        upd = "-CAST(round(0.5 * (g::DOUBLE) / n) AS BIGINT)"
        return f"""
        m{i} AS (
          SELECT f.doc_id, sum(coalesce(w.wq, 0))::BIGINT AS mm
          FROM cfeat f LEFT JOIN w{i - 1} w USING (feature)
          GROUP BY f.doc_id
        ),
        r{i} AS (
          SELECT m.doc_id,
                 CAST(round(({_sig} - y) * 1000000.0) AS BIGINT) AS r
          FROM m{i} m JOIN clbl USING (doc_id)
        ),
        g{i} AS (
          SELECT feature, sum(r)::BIGINT AS g
          FROM cfeat JOIN r{i} USING (doc_id) GROUP BY feature
        ),
        w{i} AS (
          SELECT feature, sum(wq)::BIGINT AS wq FROM (
            SELECT feature, wq FROM w{i - 1}
            UNION ALL
            SELECT feature, {upd} AS wq FROM g{i}, cn
          ) GROUP BY feature HAVING sum(wq) <> 0
        )"""

    _cls_nf = _CLS_NF

    # export this part's locals for later parts (exact closure
    # semantics of the original single-function implementation)
    g.update({k: v for k, v in locals().items()
              if k not in ('out', 'g') and not k.startswith('__')})
    return out
