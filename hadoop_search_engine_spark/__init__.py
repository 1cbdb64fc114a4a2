"""PySpark-native full-text index + BM25 query engine.

A from-scratch re-expression of the capabilities of the reference
repo (i-am-sergio/hadoop-search-engine, read-only at /root/reference):
document ingestion into a schema'd table, per-document token
extraction with normalization, inverted-index construction, and
multi-term query serving — rebuilt Spark-first over Common-Crawl-style
web text:

  documents(url, warc_ts, html, text, lang)
    -> tokenize (vectorized, byte-identical contract)
    -> (term, doc_id, tf)
    -> sharded, blocked, delta+varint-compressed posting lists
       with per-block max BM25 score metadata
    -> BM25(k1, b) top-k via block-max WAND, rank-identical to a
       single-node NumPy oracle.

Nothing here is a port: the reference's execution engine (Hadoop MR /
Scala jobs / Node.js hash-map serving) is replaced by DataFrame plans
that Catalyst optimizes, with Arrow pandas UDFs only where built-in
operators cannot express the semantics (posting-block encode/decode,
WAND scoring).
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
BLOCK_SIZE = 128
