"""Legacy text-index importer: the reference engine's serialized index.

The reference serves queries from a Hadoop-MR-style text serialization
of its inverted index — one line per term, ``entity<TAB>f1, f2, ...``
with a TAB *or* spaces between entity and file list (the checked-in
sample mixes both: /root/reference/server/data/part_r_00000.txt:1-4) —
parsed by splitting on ``/\\s+/``, joining the remainder, splitting on
commas and trimming (server/src/utils/index.js:19-24), with lowercased
keys and first-seen ``Set`` dedup of files (index.js:26-31).

A user migrating off the reference engine imports that file here:

  * :func:`read_legacy_index` — distributed text scan + built-in
    expression parse into ``(entity, files array<string>)``; no Python
    on the data path, tolerant of mixed separators like the reference;
  * :func:`legacy_index_to_documents` — inverts term->files into
    pseudo-documents (one per file, text = its entities), the shape
    :func:`operators.index_build.build_index` consumes;
  * :func:`import_legacy_index` — end to end: parse, invert, mint dense
    doc_ids, build the compressed block index, and write a
    ``doc_map(doc_id, url)`` table so results map back to the legacy
    file names.

Caveat (inherited from the legacy format): entities are ``\\S+`` tokens,
so any entity the canonical tokenizer would split or strip to empty
(it removes ``[.,!?]``) cannot round-trip; the reference's entities
(COCO classes, dates, camera ids, hours) all survive.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_legacy_index(spark: SparkSession, path: str) -> DataFrame:
    """Parse a part-r-* text index into (entity, files array<string>).

    Matches the reference parser's semantics: trim the line, the first
    whitespace run ends the entity (lowercased, like the serving map's
    keys), the remainder splits on commas with per-file trim, duplicate
    files dedup keeping first occurrence.
    """
    lines = spark.read.text(path)
    trimmed = F.trim(F.col("value"))
    entity = F.lower(F.regexp_extract(trimmed, r"^(\S+)", 1))
    rest = F.trim(F.regexp_replace(trimmed, r"^\S+\s*", ""))
    files = F.array_distinct(
        F.filter(
            F.transform(F.split(rest, ","), lambda s: F.trim(s)),
            lambda s: s != "",
        )
    )
    return (
        lines.select(entity.alias("entity"), files.alias("files"))
        .where((F.col("entity") != "") & (F.size("files") > 0))
    )


def legacy_index_to_documents(legacy: DataFrame) -> DataFrame:
    """Invert (entity, files) into pseudo-documents (url, text).

    One row per distinct file; text is the space-joined, sorted set of
    entities that listed it (sorted for partition-order determinism —
    BM25 over the import is insensitive to within-doc order). tf is 1
    per (entity, file), mirroring the legacy presence-only semantics.
    """
    pairs = legacy.select(
        "entity", F.explode("files").alias("url")
    ).distinct()
    return pairs.groupBy("url").agg(
        F.concat_ws(" ", F.sort_array(F.collect_list("entity"))).alias("text")
    )


def import_legacy_index(
    spark: SparkSession, path: str, out_dir: str, **build_kwargs
):
    """Parse a legacy index file and build the engine's block index.

    Returns IndexStats. Also writes ``doc_map`` (doc_id, url) under
    ``out_dir`` so top-k doc_ids translate back to legacy file names.
    """
    from ..operators.doc_ids import assign_doc_ids
    from ..operators.index_build import build_index

    docs = legacy_index_to_documents(read_legacy_index(spark, path))
    docs = assign_doc_ids(docs)
    doc_map_dir = os.path.join(out_dir, "doc_map")
    stats = build_index(
        spark, docs.select("doc_id", "text"), out_dir, **build_kwargs
    )
    # after build_index: it clears out_dir on a fresh build, so the
    # doc_map write must come after
    docs.select("doc_id", "url").write.mode("overwrite").parquet(doc_map_dir)
    return stats
