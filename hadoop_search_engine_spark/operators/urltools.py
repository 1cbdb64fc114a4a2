"""URL curation for web corpora: canonicalization, canonical-URL
dedup, registrable-domain extraction, and per-domain document caps.

Every large crawl pipeline runs these before anything touches text:
the same page is fetched under `http://WWW.Site.com/a/?utm_source=x`
and `https://site.com/a`, a handful of hosts contribute half the
corpus, and per-domain caps are the first diversity lever. The
reference engine ingests pages keyed by raw url with no
canonicalization (server/src/utils/index.js treats the url as an
opaque key), so duplicate fetches of one page index as distinct
documents — these operators close that gap Spark-side.

Cross-engine contract: everything here is built from the Java-regex ∩
RE2 dialect (no lookaround, no backrefs) and engine-agnostic string /
list builtins, exactly like the PII redactor, so DuckDB replays each
transformation bit-identically (`sql_normalize_url_duckdb`,
`sql_registrable_domain_duckdb`) and the operators sit on the oracle
board. All map-only ops fuse with the parquet scan; the two shuffling
ops (dedup, caps) document their skew shape inline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tracking parameters dropped during normalization: the `utm_` family
# plus the common click-id params. Keys are compared exactly (or by
# `utm_` prefix) — a tight, documented list, not a heuristic regex, so
# `?butm_x=1` or `?refresh=1` are never touched.
TRACKING_EXACT = (
    "fbclid", "gclid", "msclkid", "yclid", "igshid",
    "mc_cid", "mc_eid", "ref_src", "spm",
)

# Two-level public suffixes for the registrable-domain heuristic: a
# small inline subset of the public-suffix list covering the common
# ccTLD second levels. Full-PSL accuracy is pluggable via the
# `extra_suffixes` argument; the default is the standard "last two
# labels, or three when the last two are a known public pair" rule.
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "co.in", "ac.in", "gov.in",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
    "co.za", "com.sg", "com.hk", "co.kr", "com.tw",
)

_SCHEME_RE = "^([A-Za-z][-A-Za-z0-9+.]*)://"


def _is_tracking(key: Column) -> Column:
    cond = key.substr(1, 4) == "utm_"
    for k in TRACKING_EXACT:
        cond = cond | (key == k)
    return cond


def url_parts(url: Column) -> dict[str, Column]:
    """Decompose a URL string column into (scheme, host, port, path,
    query, fragment) expression columns — RFC-3986's coarse grammar as
    anchored regexes over the common Java/RE2 dialect. Unmatched parts
    are empty strings (both engines' ``regexp_extract`` miss value).
    Pure projection: fuses with the scan, no shuffle, no Python."""
    scheme = F.regexp_extract(url, _SCHEME_RE, 1)
    rest = F.regexp_replace(url, _SCHEME_RE, "")
    auth = F.regexp_extract(rest, "^([^/?#]*)", 1)
    hostport = F.regexp_replace(auth, "^[^@/]*@", "")
    host = F.regexp_replace(hostport, ":[0-9]*$", "")
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    tail = F.regexp_replace(rest, "^[^/?#]*", "")
    path = F.regexp_extract(tail, "^([^?#]*)", 1)
    query = F.regexp_extract(tail, "^[^?#]*\\?([^#]*)", 1)
    fragment = F.regexp_extract(tail, "#(.*)$", 1)
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "path": path,
        "query": query,
        "fragment": fragment,
    }


def normalize_url(url: Column, strip_www: bool = False) -> Column:
    """Canonical form of a web URL (the crawl-dedup key):

    * scheme and host lowercased; userinfo dropped
    * default ports stripped (``http:80`` / ``https:443``); other
      explicit ports kept
    * fragment dropped
    * tracking params dropped (``utm_*`` prefix + :data:`TRACKING_EXACT`),
      the remaining params byte-sorted (param order is not semantic)
    * trailing-slash run stripped from the path; empty path becomes ``/``
    * ``strip_www=True`` additionally drops one leading ``www.``
      (recommended for the dedup key; off for display)

    Rows without a ``scheme://`` prefix are returned lowercased and
    trimmed, untouched otherwise (relative references are not crawl
    keys). Deliberately NOT full RFC 3986 — no percent-decoding or
    path-segment resolution, which are not injective and would merge
    distinct pages; this is the reversible, conservative subset every
    crawl canonicalizer agrees on.

    Pure expression column (regex + list builtins, no UDF): fuses with
    the scan, whole-stage codegen, replayed bit-identically in DuckDB
    by :func:`sql_normalize_url_duckdb`."""
    p = url_parts(url)
    scheme = F.lower(p["scheme"])
    host = F.lower(p["host"])
    if strip_www:
        host = F.regexp_replace(host, "^www\\.", "")
    port = p["port"]
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.regexp_replace(p["path"], "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.filter(
        F.split(p["query"], "&"),
        lambda kv: (F.length(kv) > 0)
        & ~_is_tracking(F.regexp_extract(kv, "^([^=]*)", 1)),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    q_part = F.when(
        qnorm != "", F.concat(F.lit("?"), qnorm)
    ).otherwise(F.lit(""))
    built = F.concat(scheme, F.lit("://"), host, port_part, path, q_part)
    return F.when(p["scheme"] == "", F.lower(F.trim(url))).otherwise(built)


def registrable_domain(
    host: Column, extra_suffixes: tuple[str, ...] = ()
) -> Column:
    """Registrable (pay-level) domain of a lowercase host: the last two
    labels, or three when the last two form a known public two-level
    suffix (:data:`TWO_LEVEL_SUFFIXES`, extendable via
    ``extra_suffixes`` up to the full public-suffix list). Hosts with
    fewer than three labels pass through whole. Pure expressions."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    two = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    three = F.concat_ws(".", F.element_at(labels, -3), two)
    suffixes = tuple(TWO_LEVEL_SUFFIXES) + tuple(extra_suffixes)
    return F.when(n <= 2, host).otherwise(
        F.when(two.isin(*suffixes), three).otherwise(two)
    )


def with_url_columns(
    docs: DataFrame,
    url_col: str = "url",
    strip_www: bool = True,
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """Annotate a crawl frame with ``url_norm``, ``host``, and
    ``domain`` — the three keys the rest of the curation pipeline
    groups and filters on. Map-only; fuses with the scan."""
    norm = normalize_url(F.col(url_col), strip_www=strip_www)
    host = F.lower(url_parts(F.col(url_col))["host"])
    if strip_www:
        host = F.regexp_replace(host, "^www\\.", "")
    return docs.withColumns(
        {
            "url_norm": norm,
            "host": host,
            "domain": registrable_domain(host, extra_suffixes),
        }
    )


def url_dedup(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    strip_www: bool = True,
) -> DataFrame:
    """Canonical-URL dedup: one surviving row per
    :func:`normalize_url` key, winner = lowest ``id_col`` (pure
    function of the data — stable across reruns, partitionings, and
    engines; re-crawls of one page collapse to the first fetch).

    Scale shape: winner selection is a partial-aggregated
    ``groupBy(url_norm).min(id)`` — map-side combine absorbs even a
    viral URL fetched millions of times (the skew case a
    window-per-key dedup ships to one reducer) — then survivors come
    back via an id-keyed semi-join (uniform key). Output keeps every
    input column plus ``url_norm``."""
    annotated = docs.withColumn(
        "url_norm", normalize_url(F.col(url_col), strip_www=strip_www)
    )
    winners = (
        annotated.groupBy("url_norm")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return annotated.join(winners, id_col, "left_semi")


def domain_stats(
    docs: DataFrame,
    url_col: str = "url",
    size_col: str | None = "n_chars",
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """Per-registrable-domain corpus census: doc count, total size,
    and doc share — the report that drives blocklists and per-domain
    caps. One annotation projection + one partial-aggregated groupBy
    (output is |domains| rows) + a 1-row broadcast total for the
    share, the same shape as ``corpus_mix_report``."""
    host = F.lower(url_parts(F.col(url_col))["host"])
    host = F.regexp_replace(host, "^www\\.", "")
    per = docs.select(
        registrable_domain(host, extra_suffixes).alias("domain"),
        *( [F.col(size_col)] if size_col else [] ),
    )
    aggs = [F.count("*").alias("n_docs")]
    if size_col:
        aggs.append(F.sum(size_col).cast("long").alias("total_size"))
    grouped = per.groupBy("domain").agg(*aggs)
    total = docs.select(F.count("*").alias("_n_total"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .withColumn(
            "doc_share",
            F.round(F.col("n_docs") / F.col("_n_total"), 6),
        )
        .drop("_n_total")
    )


def cap_per_domain(
    docs: DataFrame,
    n: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    salt: str = "domaincap",
    skew_buckets: int | None = None,
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """Keep at most ``n`` documents per registrable domain — the
    diversity cap every crawl recipe applies before mixing. Selection
    is an UNBIASED deterministic sample: docs rank within their domain
    by ``murmur3(id:salt)`` (uniform, engine-replayable — the
    ``split_corpus`` determinism contract) with id tie-break, so the
    kept set is a pure function of (data, salt), stable under reruns,
    partitioning, and corpus append order.

    Scale shape: the default is one window per domain — per-task state
    is the domain's doc count, which is exactly the skew risk (a
    100M-page host lands on one task). ``skew_buckets=B`` (a power of
    two) switches to the exact two-phase form: the murmur key's top
    bits split each domain into B ordered sub-buckets, local ranks
    come from a window over (domain, bucket) — max partition cut B× —
    and the global rank adds the per-domain exclusive running count of
    the preceding buckets (a |domains|·B-row side table). Identical
    output by construction (the bucket is a PREFIX of the sort key),
    pinned by test."""
    from ..functions.hashes import murmur3_u32

    if n < 1:
        raise ValueError("n must be >= 1")
    host = F.lower(url_parts(F.col(url_col))["host"])
    host = F.regexp_replace(host, "^www\\.", "")
    h = murmur3_u32(F.col(id_col).cast("string"), salt=salt)
    base = docs.withColumns(
        {"_dom": registrable_domain(host, extra_suffixes), "_h": h}
    )
    if skew_buckets is None:
        w = Window.partitionBy("_dom").orderBy(
            F.col("_h").asc(), F.col(id_col).asc()
        )
        return (
            base.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= n)
            .drop("_dom", "_h", "_rk")
        )
    b = int(skew_buckets)
    if b < 2 or (b & (b - 1)) != 0 or b > 1 << 20:
        raise ValueError("skew_buckets must be a power of two in [2, 2^20]")
    shift = 32 - b.bit_length() + 1  # murmur3_u32 is a 32-bit value
    base = base.withColumn("_bkt", F.shiftrightunsigned(F.col("_h"), shift))
    counts = base.groupBy("_dom", "_bkt").agg(F.count("*").alias("_c"))
    wc = (
        Window.partitionBy("_dom")
        .orderBy(F.col("_bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(wc), F.lit(0))
    ).select("_dom", "_bkt", "_off")
    wl = Window.partitionBy("_dom", "_bkt").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    ranked = (
        base.withColumn("_lrk", F.row_number().over(wl))
        # offsets is |domains|*B rows; hot domains split B ways before
        # this join, and the join key includes the bucket
        .join(offsets, ["_dom", "_bkt"])
        .where(F.col("_off") + F.col("_lrk") <= n)
    )
    return ranked.drop("_dom", "_h", "_bkt", "_lrk", "_off")


def blocklist_filter(
    docs: DataFrame,
    blocked_domains: DataFrame,
    url_col: str = "url",
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """Drop documents whose registrable domain appears in a blocklist
    frame (column ``domain``) — broadcast anti-join: blocklists are
    KBs next to a 100 TB corpus, so the probe is map-side, no
    shuffle of the corpus."""
    host = F.lower(url_parts(F.col(url_col))["host"])
    host = F.regexp_replace(host, "^www\\.", "")
    annotated = docs.withColumn(
        "_dom", registrable_domain(host, extra_suffixes)
    )
    return (
        annotated.join(
            F.broadcast(blocked_domains.select(F.col("domain").alias("_dom"))),
            "_dom",
            "left_anti",
        ).drop("_dom")
    )


# ------------------------------------------------------------------ #
# DuckDB SQL mirrors (oracle replay)                                  #
# ------------------------------------------------------------------ #


def sql_url_parts_duckdb(expr: str) -> dict[str, str]:
    """DuckDB SQL fragments mirroring :func:`url_parts` over ``expr``
    (same anchored regexes; DuckDB's regexp_replace without the ``g``
    flag replaces the first match, which is all the anchored patterns
    can produce — identical to Spark's replace-all on these)."""
    scheme_re = "^([A-Za-z][-A-Za-z0-9+.]*)://"
    rest = f"regexp_replace({expr}, '{scheme_re}', '')"
    auth = f"regexp_extract({rest}, '^([^/?#]*)', 1)"
    hostport = f"regexp_replace({auth}, '^[^@/]*@', '')"
    tail = f"regexp_replace({rest}, '^[^/?#]*', '')"
    return {
        "scheme": f"regexp_extract({expr}, '{scheme_re}', 1)",
        "host": f"regexp_replace({hostport}, ':[0-9]*$', '')",
        "port": f"regexp_extract({hostport}, ':([0-9]+)$', 1)",
        "path": f"regexp_extract({tail}, '^([^?#]*)', 1)",
        "query": f"regexp_extract({tail}, '^[^?#]*\\?([^#]*)', 1)",
    }


def sql_normalize_url_duckdb(expr: str, strip_www: bool = False) -> str:
    """DuckDB expression replaying :func:`normalize_url` bit-exactly —
    the oracle side of the canonicalization contract."""
    p = sql_url_parts_duckdb(expr)
    scheme = f"lower({p['scheme']})"
    host = f"lower({p['host']})"
    if strip_www:
        host = f"regexp_replace({host}, '^www\\.', '')"
    port = p["port"]
    default_port = (
        f"(({scheme} = 'http' AND {port} = '80') OR "
        f"({scheme} = 'https' AND {port} = '443'))"
    )
    port_part = (
        f"CASE WHEN {port} <> '' AND NOT {default_port} "
        f"THEN ':' || {port} ELSE '' END"
    )
    path = f"regexp_replace({p['path']}, '/+$', '')"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    exact_in = ", ".join(f"'{k}'" for k in TRACKING_EXACT)
    params = (
        f"list_filter(string_split({p['query']}, '&'), "
        f"kv -> len(kv) > 0 AND NOT ("
        f"substr(regexp_extract(kv, '^([^=]*)', 1), 1, 4) = 'utm_' OR "
        f"regexp_extract(kv, '^([^=]*)', 1) IN ({exact_in})))"
    )
    qnorm = f"array_to_string(list_sort({params}), '&')"
    q_part = f"CASE WHEN {qnorm} <> '' THEN '?' || {qnorm} ELSE '' END"
    built = f"{scheme} || '://' || {host} || {port_part} || {path} || {q_part}"
    return (
        f"CASE WHEN {p['scheme']} = '' THEN lower(trim({expr})) "
        f"ELSE {built} END"
    )


def sql_registrable_domain_duckdb(
    host_expr: str, extra_suffixes: tuple[str, ...] = ()
) -> str:
    """DuckDB expression replaying :func:`registrable_domain` (DuckDB
    lists index from 1 and support negative indexing like Spark's
    ``element_at``)."""
    labels = f"string_split({host_expr}, '.')"
    two = f"({labels}[-2] || '.' || {labels}[-1])"
    three = f"({labels}[-3] || '.' || {two})"
    suffixes = tuple(TWO_LEVEL_SUFFIXES) + tuple(extra_suffixes)
    suffix_in = ", ".join(f"'{s}'" for s in suffixes)
    return (
        f"CASE WHEN len({labels}) <= 2 THEN {host_expr} "
        f"WHEN {two} IN ({suffix_in}) THEN {three} "
        f"ELSE {two} END"
    )


# Default crawl-cleaning patterns (RefinedWeb/CCNet-style URL filters):
# search/tag/calendar/login pages and obvious non-content endpoints.
# Java-regex ∩ RE2 dialect so the oracle replays them exactly.
URL_PATTERN_DEFAULTS = (
    "[?&](s|q|search|query)=",        # on-site search results
    "/(tag|tags|category|label)s?/",  # tag/category listing pages
    "/(login|signin|signup|register|logout)([/?#]|$)",
    "/calendar/",
    "/(feed|rss|atom)([/?#]|$)",
    "\\.(css|js|ico|woff2?)([?#]|$)",
)


def url_pattern_filter(
    docs: DataFrame,
    patterns: tuple[str, ...] = URL_PATTERN_DEFAULTS,
    url_col: str = "url",
) -> DataFrame:
    """Drop documents whose (lowercased) URL matches any of the given
    regexes — the pattern-blocklist crawl cleaner (search-result
    pages, tag listings, login/feed endpoints) that runs before any
    text is read. Map-only codegen'd filter fused with the scan; the
    pattern list is a plan literal (keep it dozens, not thousands —
    a huge list belongs in a broadcast :func:`blocklist_filter`
    domain table instead)."""
    if not patterns:
        raise ValueError("patterns must name at least one regex")
    u = F.lower(F.col(url_col))
    keep = F.lit(True)
    for p in patterns:
        keep = keep & ~(u.rlike(p))
    return docs.where(keep)


def sql_url_pattern_predicate_duckdb(
    patterns: tuple[str, ...] = URL_PATTERN_DEFAULTS,
    url_expr: str = "url",
) -> str:
    """DuckDB WHERE predicate computing the SAME keep decision as
    :func:`url_pattern_filter`."""
    parts = [
        f"NOT regexp_matches(lower({url_expr}), '{p}')" for p in patterns
    ]
    return " AND ".join(parts)


# -- link extraction (html -> web graph) --------------------------------------

_HREF_PATTERN = r'href="([^"#]+)'


def extract_links(
    docs: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    normalize: bool = True,
) -> DataFrame:
    """html → the outlink edge list ``(src, dst)``: every absolute
    ``href="..."`` target (http/https only — fragments cut by the
    capture, relative/js/mailto links filtered), distinct per page.
    Everything is JVM expressions (``regexp_extract_all`` + explode +
    filter — fused with the scan, no Python), so extracting the link
    graph from 100 TB of html is one map-only pass. ``normalize=True``
    canonicalizes both endpoints with :func:`normalize_url` so the
    edge list joins cleanly against a url-keyed corpus.

    Feed the result to :func:`~.graph.pagerank` and the corpus ranks
    by its own link structure; feed THAT to :func:`~.ltr.ltr_features`
    as a doc feature and the learned ranker uses it.
    """
    html_str = F.col(html_col).cast("string")
    raw = F.explode(
        F.regexp_extract_all(html_str, F.lit(_HREF_PATTERN), 1)
    ).alias("dst_raw")
    edges = (
        docs.select(F.col(url_col).alias("src"), raw)
        .where(
            F.col("dst_raw").startswith("http://")
            | F.col("dst_raw").startswith("https://")
        )
    )
    src = F.col("src")
    dst = F.col("dst_raw")
    if normalize:
        src = normalize_url(src)
        dst = normalize_url(dst)
    return (
        edges.select(src.alias("src"), dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))  # self-links carry no rank
        .distinct()
    )


def link_graph_ids(
    edges: DataFrame, docs: DataFrame, url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(src, dst) url edges → (src, dst) ``doc_id`` edges, keeping only
    targets that exist in the corpus (the pagerank input shape). Two
    broadcast-or-shuffle equi-joins on the normalized url key."""
    ids = docs.select(
        normalize_url(F.col(url_col)).alias("_u"), F.col(id_col)
    )
    return (
        edges.join(ids.withColumnRenamed(id_col, "src_id"),
                   edges["src"] == ids["_u"])
        .drop("_u")
        .join(
            ids.withColumnRenamed(id_col, "dst_id").withColumnRenamed(
                "_u", "_u2"
            ),
            F.col("dst") == F.col("_u2"),
        )
        .select(F.col("src_id").alias("src"), F.col("dst_id").alias("dst"))
        .distinct()
    )
