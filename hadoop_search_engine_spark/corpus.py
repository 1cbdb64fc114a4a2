"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Generates the input table of exactly the BASELINE.json ``input_hint``
shape — ``documents(url STRING, warc_ts TIMESTAMP, html BINARY,
text STRING, lang STRING)`` — fully distributed (``mapInPandas`` over
``spark.range``), with every byte a pure function of the row index, so
the same row is reproducible in isolation and the table content is
invariant under partitioning / parallelism level.

  * body words: Zipfian (s≈1.1) over a fixed 10,000-word vocabulary
    ``w00000..w09999`` — the Zipf head (df ≈ N) exercises the
    head-term sharding/salting path;
  * doc length: uniform 20..400 tokens;
  * RNG: counter-based splitmix64 keyed by (row index, token index) —
    no sequential state, hence partition-order independent;
  * ``text`` is derived from ``html`` by :func:`extract_text`, the
    canonical pure extractor, so the per-url byte-identical invariant
    holds by construction and is independently testable;
  * signal terms: ``needle7`` planted with tf=3 in docs {10, 20, 30}
    and ``needle3`` with tf=1 in doc {7} for hand-checkable BM25
    fixtures.

The role of this table mirrors the reference's corpus table ``jsons``
(Parquet, /root/reference/processVideo/process.py:204-219); columns
follow the webtext graft payload instead of video metadata.
"""

from __future__ import annotations

import datetime as dt
import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

VOCAB_SIZE = 10_000
ZIPF_S = 1.1
MIN_LEN, MAX_LEN = 20, 400
EPOCH = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html: bytes) -> str:
    """Canonical pure HTML→text extractor: strip tags, collapse whitespace.

    This is the function whose per-url output must be byte-identical
    between the distributed pipeline and the oracle (BASELINE.json
    per-row invariant). Deliberately simple and total: any byte string
    in, normalized single-spaced text out.
    """
    stripped = _TAG_RE.sub(" ", html.decode("utf-8", errors="replace"))
    return _WS_RE.sub(" ", stripped).strip()


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based 64-bit mix (public-domain splitmix64 constants)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _zipf_cdf() -> np.ndarray:
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    w = 1.0 / np.power(ranks, ZIPF_S)
    return np.cumsum(w / w.sum())


_ZIPF_CDF = _zipf_cdf()
_VOCAB = np.array([f"w{i:05d}" for i in range(VOCAB_SIZE)])

# (doc index -> extra tokens appended to the body) — signal fixtures.
SIGNAL_DOCS: dict[int, list[str]] = {
    7: ["needle3"],
    10: ["needle7"] * 3,
    20: ["needle7"] * 3,
    30: ["needle7"] * 3,
}


def url_for(i: int) -> str:
    return f"https://site{i % 997}.example/page/{i}"


def _lang_for(h: np.ndarray) -> np.ndarray:
    r = (h % np.uint64(100)).astype(np.int64)
    return np.where(r < 90, "en", np.where(r < 98, "es", "und"))


def _gen_batch(ids: np.ndarray) -> pd.DataFrame:
    n = ids.size
    h = _splitmix64(ids.astype(np.uint64))
    lens = (MIN_LEN + (h % np.uint64(MAX_LEN - MIN_LEN + 1))).astype(np.int64)
    total = int(lens.sum())
    # Token RNG counter: doc_id * 2^21 + token_index (doc len << 2^21,
    # so counters never collide across docs).
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
    doc_of_tok = np.repeat(np.arange(n), lens)
    tok_idx = np.arange(total) - offsets[doc_of_tok]
    counters = (ids[doc_of_tok].astype(np.uint64) << np.uint64(21)) | tok_idx.astype(np.uint64)
    u = _splitmix64(counters ^ np.uint64(0xABCDEF0123456789)).astype(np.float64) * np.float64(2.0**-64)
    word_ids = np.searchsorted(_ZIPF_CDF, u, side="left").clip(0, VOCAB_SIZE - 1)
    words = _VOCAB[word_ids]

    rows: list[tuple[str, dt.datetime, bytes, str, str]] = []
    langs = _lang_for(h)
    for r in range(n):
        i = int(ids[r])
        body_words = words[offsets[r] : offsets[r] + lens[r]].tolist()
        body_words += SIGNAL_DOCS.get(i, [])
        title = " ".join(body_words[:2])
        body = " ".join(body_words)
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body><p>{body}</p></body></html>"
        ).encode("utf-8")
        rows.append(
            (
                url_for(i),
                EPOCH + dt.timedelta(seconds=i * 137),
                html,
                extract_text(html),
                str(langs[r]),
            )
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def gen_document_row(i: int) -> dict:
    """Reproduce a single document in isolation (oracle-side helper)."""
    pdf = _gen_batch(np.array([i], dtype=np.int64))
    return pdf.iloc[0].to_dict()


def gen_documents(spark: SparkSession, n_docs: int, n_partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` rows."""
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            if ids.size:
                yield _gen_batch(ids)

    return (
        spark.range(0, n_docs, numPartitions=n_partitions)
        .mapInPandas(gen, schema=DOCUMENTS_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Reference query set (FIXTURES.md §2) + synonym fixture
# ---------------------------------------------------------------------------

SYNONYMS: dict[str, str] = {
    # 20-entry fixture table, the analog of the reference's ES->EN COCO
    # dictionary (client/src/utils/cocoData.ts): maps noisy/foreign
    # surface forms onto canonical index terms.
    "persona": "w00000", "personas": "w00000", "person": "w00000",
    "coche": "w00001", "car": "w00001", "autos": "w00001",
    "perro": "w00002", "dog": "w00002",
    "gato": "w00003", "cat": "w00003",
    "bus": "w00004", "autobus": "w00004",
    "bici": "w00005", "bicycle": "w00005",
    "camion": "w00006", "truck": "w00006",
    "aguja": "needle7", "needle": "needle7",
    "semaforo": "w00008", "trafficlight": "w00008",
}


def reference_queries() -> list[dict]:
    """50 deterministic queries: head/tail single-term, multi-term OR,
    absent terms, duplicate terms, punctuation/case noise, synonyms."""
    qs: list[dict] = []
    qid = 0

    def add(text: str, k: int = 10) -> None:
        nonlocal qid
        qs.append({"qid": qid, "query_text": text, "k": k})
        qid += 1

    # single-term head (Zipf ranks 0..9)
    for i in range(10):
        add(f"w{i:05d}")
    # single-term tail
    for i in (9999, 9871, 9500, 9000, 8000, 7777, 6543, 5000):
        add(f"w{i:05d}")
    # signal terms, small and large k
    add("needle7", k=10)
    add("needle7", k=1)
    add("needle3", k=10)
    add("Needle7, and THE w00003!", k=10)
    # multi-term OR (2-5 terms)
    add("w00000 w00010")
    add("w00001 w00200 w04000")
    add("w00002, w00020, w00200, w02000")
    add("w00005 w00050 w00500 w05000 w09999")
    add("needle7 w00000")
    add("needle3 w09999")
    # absent terms / empty results
    add("zzzzz")
    add("qqq xxx zzz")
    add("w00003 zzzzz")
    # duplicate terms (dedup case)
    add("w00004 w00004 w00004")
    add("needle7 needle7")
    # punctuation / case noise
    add("W00006!!")
    add("w00007, w00007.")
    add("  w00008   w00009  ")
    add("W00010? w00011!")
    # synonym rewrites
    add("person car")
    add("Personas!? coche")
    add("perro gato bus")
    add("aguja")
    add("needle w00000")
    # mixed, larger k
    add("w00000 w00001 w00002", k=100)
    add("w00012 w00123 w01234", k=100)
    add("needle7 needle3", k=100)
    add("w00042", k=1)
    add("w00100 w00200", k=1)
    # generic multi-term
    for i in range(qid, 50):
        add(f"w{(i * 97) % 300:05d} w{(i * 389) % 3000:05d}")
    return qs[:50]
