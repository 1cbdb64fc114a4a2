"""WARC (ISO 28500) container source + sink — Common-Crawl-style ingest.

The BASELINE.json north star reads "Common-Crawl-style web pages"; the
wire format Common Crawl actually distributes is WARC/1.0: ~1 GB
``.warc.gz`` files, each a concatenation of per-record gzip members,
each record a ``WARC/1.0`` header block + HTTP response payload. This
module implements that container from scratch (the public ISO 28500 /
WARC 1.0 spec — no warcio or other parser library):

* :func:`iter_warc_records` — pure-bytes record iterator (plain or
  multi-member gzip), tolerant of a truncated trailing record (crawls
  get cut off mid-write; a torn tail must not poison the file);
* :func:`split_http_response` — HTTP/1.x status + headers + body split
  for ``WARC-Type: response`` payloads;
* :func:`read_warc` — distributed reader: ``binaryFile`` scan → one
  ``mapInPandas`` parse task per WARC file. This matches the corpus
  layout at 100 TB: Common Crawl ships ~64 k files of ~1 GB per crawl,
  far more files than executor cores, so file-granular tasks already
  saturate a 1000-executor cluster with zero shuffle. (``binaryFile``
  caps a single file at 2 GB — the CC convention of ~1 GB archives is
  inside that by design; re-chunk larger archives upstream.)
* :func:`export_warc` — deterministic distributed sink (bucket-by-url
  repartition, sort within partition, one gzip WARC per partition),
  so corpus → WARC → corpus round-trips byte-identically.

Reference analog: the reference stages raw crawl inputs onto HDFS and
reads them into its corpus table (/root/reference/processVideo/
upload_videos_to_hive.py:16-36 for ingest, process.py:204-219 for the
table); here the raw-input container is WARC because the graft payload
is webtext.

Byte-stream container parsing is inherently sequential *within a file*
(each record's extent depends on the previous record's Content-Length)
— the Python loop below is per-*record* driver-free executor work on
C-speed ``bytes.find``/slicing, not a per-row UDF on a column path,
and the unit of parallelism is the file, exactly like Spark's own
text/Parquet readers.
"""

from __future__ import annotations

import datetime as dt
import gzip
import hashlib
import io
import os
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"

WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("warc_file", T.StringType(), True),
    ]
)


# ---------------------------------------------------------------------------
# byte-level parsing
# ---------------------------------------------------------------------------


def gunzip_members(data: bytes) -> bytes:
    """Decompress a buffer of one or more concatenated gzip members.

    Common Crawl gzips each record as its own member so readers can
    seek; ``zlib.decompressobj(wbits=47)`` handles one member, so loop
    over ``unused_data`` until the buffer is exhausted.
    """
    out = []
    while data:
        d = zlib.decompressobj(wbits=47)
        out.append(d.decompress(data))
        out.append(d.flush())
        if not d.eof:  # truncated final member — keep what decoded
            break
        data = d.unused_data
    return b"".join(out)


def parse_warc_headers(block: bytes) -> dict[str, str]:
    """``Name: value`` lines → dict with lower-cased names (the spec
    says field names are case-insensitive)."""
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            name, _, value = line.partition(b":")
            headers[name.strip().decode("utf-8", "replace").lower()] = (
                value.strip().decode("utf-8", "replace")
            )
    return headers


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield ``(headers, payload)`` per well-formed record; stop (don't
    raise) at a truncated tail."""
    if data[:2] == b"\x1f\x8b":
        data = gunzip_members(data)
    n = len(data)
    pos = 0
    while pos < n:
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0:
            break  # torn header at EOF
        first_line_end = data.find(_CRLF, pos)
        if not data[pos:first_line_end].startswith(b"WARC/"):
            break  # lost sync — refuse to guess at record extents
        headers = parse_warc_headers(data[first_line_end + 2 : hdr_end])
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + len(_HDR_END)
        if body_start + clen > n:
            break  # torn payload at EOF
        yield headers, data[body_start : body_start + clen]
        pos = body_start + clen


def split_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """HTTP/1.x response payload → (status, headers, body).

    A payload with no header/body separator is treated as all-body with
    status 0 (some crawlers store bare content for ``resource``
    records).
    """
    sep = payload.find(_HDR_END)
    if sep < 0 or not payload[:5] == b"HTTP/":
        return 0, {}, payload
    head = payload[:sep]
    status_line, _, rest = head.partition(_CRLF)
    parts = status_line.split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = 0
    return status, parse_warc_headers(rest), payload[sep + len(_HDR_END) :]


def parse_warc_date(value: str | None) -> dt.datetime | None:
    """``2025-01-01T00:00:00Z`` (the spec's UTC ISO 8601 profile)."""
    if not value:
        return None
    try:
        return dt.datetime.strptime(value, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=dt.timezone.utc
        )
    except ValueError:
        return None


# ---------------------------------------------------------------------------
# writing
# ---------------------------------------------------------------------------


def _record_id_for(url: str) -> str:
    """Deterministic WARC-Record-ID: RFC-4122-shaped name from the url
    digest (crawlers use random uuid4; determinism keeps the whole
    fixture byte-reproducible)."""
    h = hashlib.md5(url.encode("utf-8")).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def warc_record_bytes(
    warc_type: str, headers: dict[str, str], payload: bytes
) -> bytes:
    head = [WARC_VERSION]
    head.append(f"WARC-Type: {warc_type}".encode())
    for k, v in headers.items():
        head.append(f"{k}: {v}".encode())
    head.append(f"Content-Length: {len(payload)}".encode())
    return _CRLF.join(head) + _HDR_END + payload + _CRLF + _CRLF


def response_record_bytes(url: str, ts: dt.datetime, html: bytes) -> bytes:
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html\r\n"
        + f"Content-Length: {len(html)}\r\n".encode()
        + _CRLF
        + html
    )
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=dt.timezone.utc)
    return warc_record_bytes(
        "response",
        {
            "WARC-Target-URI": url,
            "WARC-Date": ts.astimezone(dt.timezone.utc).strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            ),
            "WARC-Record-ID": _record_id_for(url),
            "Content-Type": "application/http; msgtype=response",
        },
        http,
    )


def _gzip_member(record: bytes) -> bytes:
    """One gzip member per record (mtime pinned → byte-deterministic)."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


def write_warc(
    path: str, rows: Iterator[tuple[str, dt.datetime, bytes]], compress: bool = True
) -> int:
    """Write ``(url, ts, html)`` rows as one WARC file; returns record
    count. ``compress=True`` follows the CC member-per-record gzip
    convention."""
    n = 0
    with open(path, "wb") as f:
        for url, ts, html in rows:
            rec = response_record_bytes(url, ts, html)
            f.write(_gzip_member(rec) if compress else rec)
            n += 1
    return n


def export_warc(
    docs: DataFrame, out_dir: str, n_files: int = 4, compress: bool = True
) -> list[tuple[str, int]]:
    """Distributed deterministic WARC export of a documents-shaped frame.

    Bucket = ``pmod(xxhash64(url), n_files)``; repartition on the
    bucket, sort by ``(bucket, url)`` within each partition, and write
    one gzip WARC *per bucket* (a hash repartition may co-locate
    several buckets in one task — the writer switches files on bucket
    change, so exactly ``n_files`` files come out regardless). File
    membership and record order are pure functions of the url set, so
    the emitted bytes are invariant under input partitioning and
    cluster size. Executors write their own buckets (no driver
    collect); at scale this is the standard "export N archive files"
    sink with N chosen for ~1 GB apiece.

    Returns ``[(file, n_records)]``.
    """
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        cur_bucket, f = None, None
        try:
            for pdf in batches:
                for url, ts, html, bucket in zip(
                    pdf["url"], pdf["warc_ts"], pdf["html"], pdf["bucket"]
                ):
                    if bucket != cur_bucket:
                        if f is not None:
                            f.close()
                        cur_bucket = bucket
                        path = os.path.join(out_dir, f"crawl-{bucket:05d}{ext}")
                        f = open(path, "wb")
                        counts[path] = 0
                    rec = response_record_bytes(
                        url, ts.to_pydatetime(), bytes(html)
                    )
                    f.write(_gzip_member(rec) if compress else rec)
                    counts[path] += 1
        finally:
            if f is not None:
                f.close()
        yield pd.DataFrame(
            {"file": list(counts), "n_records": list(counts.values())}
        )

    out = (
        docs.select("url", "warc_ts", "html")
        .withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(n_files)))
        .repartition(n_files, "bucket")
        .sortWithinPartitions("bucket", "url")
        .mapInPandas(
            _write,
            T.StructType(
                [
                    T.StructField("file", T.StringType()),
                    T.StructField("n_records", T.LongType()),
                ]
            ),
        )
        .collect()  # k-row manifest, not data
    )
    return sorted((r["file"], r["n_records"]) for r in out)


# ---------------------------------------------------------------------------
# reading (distributed)
# ---------------------------------------------------------------------------


def read_warc(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """WARC files → (url, warc_ts, html, http_status, mime, record_id,
    warc_file); only ``WARC-Type: response`` records become rows
    (warcinfo / request / metadata records are container bookkeeping).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    bf = reader.load(path).select("path", "content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for headers, payload in iter_warc_records(bytes(content)):
                    if headers.get("warc-type") != "response":
                        continue
                    status, http_headers, body = split_http_response(payload)
                    rows.append(
                        (
                            headers.get("warc-target-uri"),
                            parse_warc_date(headers.get("warc-date")),
                            body,
                            status,
                            (http_headers.get("content-type") or "").split(";")[0]
                            or None,
                            headers.get("warc-record-id"),
                            fpath,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url",
                    "warc_ts",
                    "html",
                    "http_status",
                    "mime",
                    "record_id",
                    "warc_file",
                ],
            )

    return bf.mapInPandas(_parse, WARC_SCHEMA)


def warc_to_documents(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """WARC archive dir → the input_hint documents shape
    ``(url, warc_ts, html, text, lang)``: text by the canonical
    extractor (vectorized — same regexes as :func:`corpus.extract_text`
    applied batch-wide, so the per-url byte-identity invariant holds),
    lang by the expression-only heuristic classifier."""
    from ..corpus import _TAG_RE, _WS_RE
    from ..operators.text_analysis import lang_id

    @F.pandas_udf(T.StringType())
    def _extract(payloads: pd.Series) -> pd.Series:
        s = payloads.map(lambda b: bytes(b).decode("utf-8", "replace"))
        return (
            s.str.replace(_TAG_RE, " ", regex=True)
            .str.replace(_WS_RE, " ", regex=True)
            .str.strip()
        )

    recs = read_warc(spark, path, glob)
    return (
        recs.where(F.col("http_status") == 200)
        .select(
            "url", "warc_ts", "html", _extract(F.col("html")).alias("text")
        )
        .withColumn("lang", lang_id(F.col("text")))
    )


def stream_warc(
    spark: SparkSession, path: str, glob: str = "*.warc.gz", max_files: int = 4
) -> DataFrame:
    """Structured-Streaming WARC source: watch ``path`` for new crawl
    archives (`binaryFile` file stream, ``max_files`` per micro-batch
    — one ~1 GB archive is one task's worth of parse work), parse each
    with the same ``mapInPandas`` record walk as :func:`read_warc`,
    and emit input_hint-shaped document rows. Feed straight into
    ``streaming.incremental.incremental_tf_sink`` and the crawl→index
    loop is: archives land in a directory, deltas accumulate,
    compaction folds them into the serving index."""
    from ..corpus import _TAG_RE, _WS_RE
    from ..operators.text_analysis import lang_id

    bf_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    bf = (
        spark.readStream.format("binaryFile")
        .schema(bf_schema)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", int(max_files))
        .load(path)
        .select("path", "content")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for headers, payload in iter_warc_records(bytes(content)):
                    if headers.get("warc-type") != "response":
                        continue
                    status, _http, body = split_http_response(payload)
                    if status != 200:
                        continue
                    rows.append(
                        (
                            headers.get("warc-target-uri"),
                            parse_warc_date(headers.get("warc-date")),
                            body,
                        )
                    )
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html"])

    parsed = bf.mapInPandas(
        _parse,
        T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("warc_ts", T.TimestampType()),
                T.StructField("html", T.BinaryType()),
            ]
        ),
    )

    @F.pandas_udf(T.StringType())
    def _extract(payloads: pd.Series) -> pd.Series:
        s = payloads.map(lambda b: bytes(b).decode("utf-8", "replace"))
        return (
            s.str.replace(_TAG_RE, " ", regex=True)
            .str.replace(_WS_RE, " ", regex=True)
            .str.strip()
        )

    return parsed.select(
        "url", "warc_ts", "html", _extract(F.col("html")).alias("text")
    ).withColumn("lang", lang_id(F.col("text")))
