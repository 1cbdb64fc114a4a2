"""Round-trip: legacy part-r-* text index -> engine index -> queries.

Fixture mirrors the reference sample's quirks
(/root/reference/server/data/part_r_00000.txt:1-4): TAB separators on
some lines, a space separator on another, duplicate files within a
line, mixed case, and a blank line.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.sources.legacy_index import (
    import_legacy_index,
    legacy_index_to_documents,
    read_legacy_index,
)

FIXTURE = (
    "person\tv1.json, v2.json, v3.json\n"
    "BUS\tv1.json, v2.json, v1.json\n"
    "bicycle\tv4.json\n"
    "airplane v2.json, v4.json\n"          # space separator (sample line 4)
    "\n"
    "  2010-07-01\tv3.json  \n"            # leading/trailing whitespace
)

EXPECT = {
    "person": ["v1.json", "v2.json", "v3.json"],
    "bus": ["v1.json", "v2.json"],         # lowercased key, deduped files
    "bicycle": ["v4.json"],
    "airplane": ["v2.json", "v4.json"],
    "2010-07-01": ["v3.json"],
}


@pytest.fixture(scope="module")
def legacy_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("legacy") / "part-r-00000"
    p.write_text(FIXTURE)
    return str(p)


def test_parse_mixed_separators(spark, legacy_file):
    got = {
        r["entity"]: list(r["files"])
        for r in read_legacy_index(spark, legacy_file).collect()
    }
    assert got == EXPECT


def test_invert_to_documents(spark, legacy_file):
    docs = legacy_index_to_documents(read_legacy_index(spark, legacy_file))
    by_url = {r["url"]: r["text"] for r in docs.collect()}
    assert set(by_url) == {"v1.json", "v2.json", "v3.json", "v4.json"}
    assert by_url["v1.json"] == "bus person"          # sorted entities
    assert by_url["v2.json"] == "airplane bus person"
    assert by_url["v3.json"] == "2010-07-01 person"
    assert by_url["v4.json"] == "airplane bicycle"


def test_import_round_trip_queries(spark, legacy_file, tmp_path):
    from hadoop_search_engine_spark.operators.query_exec import (
        Index,
        or_union_search,
        search_topk,
    )

    out = str(tmp_path / "legacy_idx")
    import_legacy_index(spark, legacy_file, out, n_buckets=4, block_size=16)
    idx = Index.load(spark, out)
    doc_map = {
        r["doc_id"]: r["url"]
        for r in spark.read.parquet(f"{out}/doc_map").collect()
    }

    # every legacy term returns exactly its legacy file set
    for entity, files in EXPECT.items():
        hits = search_topk(idx, entity, k=10).collect()
        assert sorted(doc_map[r["doc_id"]] for r in hits) == sorted(files), entity

    # case-insensitive probe, like the legacy serving map
    hits = search_topk(idx, "BUS", k=10).collect()
    assert sorted(doc_map[r["doc_id"]] for r in hits) == ["v1.json", "v2.json"]

    # the reference's own OR-union compat mode over the imported index
    rows = or_union_search(idx, "bicycle person").collect()
    got = [doc_map[r["doc_id"]] for r in sorted(rows, key=lambda r: r["rank"])]
    assert got[0] == "v4.json"                      # bicycle's file first
    assert set(got) == {"v1.json", "v2.json", "v3.json", "v4.json"}
