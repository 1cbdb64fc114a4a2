"""Size-tiered compaction planning (plan_compaction).

The policy is pure driver-side metadata logic, so most tests run on
synthesized segment profiles (stats.json + a checkpoints parquet —
exactly what the planner reads); one integration test plans over real
tiny segments, applies the plan with merge_indexes, and fsck-verifies
the result.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hadoop_search_engine_spark.operators.index_build import (
    IndexStats,
    write_stats,
)
from hadoop_search_engine_spark.operators.index_maint import plan_compaction


def _fake_segment(tmp_path, name: str, size_bytes: int, n_docs: int = 1000,
                  tombstones: int = 0, shard_span: int = 1024,
                  positions: bool = False) -> str:
    d = str(tmp_path / name)
    os.makedirs(os.path.join(d, "checkpoints"))
    write_stats(d, IndexStats(
        n_docs=n_docs, avgdl=10.0, shard_span=shard_span,
        num_shards=max(1, n_docs // shard_span + 1), n_buckets=16,
        block_size=128, k1=1.2, b=0.75, positions=positions,
    ))
    ck = pd.DataFrame(
        [(-1, "done", 0, 0, 0, 0, 0), (0, "done", 5, 7, 100, 200,
                                       size_bytes)],
        columns=["bucket", "status", "terms", "blocks", "postings",
                 "tokens", "bytes"],
    )
    pq.write_table(pa.Table.from_pandas(ck),
                   os.path.join(d, "checkpoints", "part-0.parquet"))
    if tombstones:
        t = pd.DataFrame({"doc_id": list(range(tombstones))})
        os.makedirs(os.path.join(d, "tombstones"))
        pq.write_table(pa.Table.from_pandas(t),
                       os.path.join(d, "tombstones", "part-0.parquet"))
    return d


def test_similar_sizes_merge_largest_first(tmp_path):
    a = _fake_segment(tmp_path, "a", 100)
    b = _fake_segment(tmp_path, "b", 150)
    c = _fake_segment(tmp_path, "c", 120)
    plan = plan_compaction([a, b, c])
    assert plan["merges"] == [[b, c, a]]  # one tier, largest first
    assert plan["vacuum"] == []


def test_dissimilar_sizes_stay_tiered(tmp_path):
    small1 = _fake_segment(tmp_path, "s1", 100)
    small2 = _fake_segment(tmp_path, "s2", 110)
    base = _fake_segment(tmp_path, "base", 100_000)
    plan = plan_compaction([base, small1, small2])
    # the small tier merges; the base is NOT rewritten into it
    assert plan["merges"] == [[small2, small1]]


def test_lone_segment_never_merges(tmp_path):
    a = _fake_segment(tmp_path, "a", 100)
    b = _fake_segment(tmp_path, "b", 10_000)
    plan = plan_compaction([a, b])
    assert plan["merges"] == []


def test_width_cap_splits_tiers(tmp_path):
    dirs = [_fake_segment(tmp_path, f"s{i}", 100 + i) for i in range(7)]
    plan = plan_compaction(dirs, max_width=3)
    assert [len(g) for g in plan["merges"]] == [3, 3]  # 7th is a lone rest


def test_incompatible_layouts_never_group(tmp_path):
    a = _fake_segment(tmp_path, "a", 100, shard_span=1024)
    b = _fake_segment(tmp_path, "b", 100, shard_span=2048)
    c = _fake_segment(tmp_path, "c", 100, shard_span=1024)
    d = _fake_segment(tmp_path, "d", 100, positions=True)
    plan = plan_compaction([a, b, c, d])
    assert plan["merges"] == [[a, c]]  # b (span) and d (positions) excluded


def test_tombstone_heavy_segment_routed_to_vacuum(tmp_path):
    a = _fake_segment(tmp_path, "a", 100)
    b = _fake_segment(tmp_path, "b", 100, n_docs=1000, tombstones=300)
    c = _fake_segment(tmp_path, "c", 100)
    plan = plan_compaction([a, b, c], tombstone_ratio=0.2)
    assert plan["vacuum"] == [b]
    assert plan["merges"] == [[a, c]]  # b excluded from merging


def test_plan_is_deterministic(tmp_path):
    dirs = [_fake_segment(tmp_path, f"s{i}", 100 + (i * 37) % 50)
            for i in range(6)]
    p1 = plan_compaction(dirs)
    p2 = plan_compaction(list(reversed(dirs)))
    assert p1["merges"] == p2["merges"]


def test_plan_applies_with_merge_and_verifies(spark, tmp_path):
    from hadoop_search_engine_spark.operators.fsck import verify_index
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.index_maint import merge_indexes
    from hadoop_search_engine_spark.operators.query_exec import (
        search_topk_rows,
    )

    dirs = []
    for i in range(3):
        rows = [(j, f"alpha w{i} token{j % 5} beta") for j in range(20)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        d = str(tmp_path / f"seg{i}")
        build_index(spark, docs, d, shard_span=16, n_buckets=4, block_size=8)
        dirs.append(d)
    plan = plan_compaction(dirs)
    assert len(plan["merges"]) == 1 and set(plan["merges"][0]) == set(dirs)
    merged = merge_indexes(spark, plan["merges"][0],
                           str(tmp_path / "merged"))
    assert verify_index(merged, sample_fraction=1.0)["ok"]
    assert len(search_topk_rows(merged, "alpha", k=60)) == 60


def test_cli_plan_compaction(tmp_path, capsys):
    import jobs.maintain as job

    a = _fake_segment(tmp_path, "a", 100)
    b = _fake_segment(tmp_path, "b", 120)
    job.main(["--plan-compaction", f"{a},{b}"])
    out = capsys.readouterr().out
    import json

    plan = json.loads(out)
    assert plan["merges"] == [[b, a]]


# ---------------------------------------------------------------------
# property-based invariants (pure planning logic, no Spark)

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except Exception:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:

    @settings(max_examples=25, deadline=None)
    @given(
        sizes=st.lists(st.integers(min_value=1, max_value=10**9),
                       min_size=0, max_size=24),
        spans=st.lists(st.sampled_from([512, 1024]), min_size=0,
                       max_size=24),
        ratio=st.floats(min_value=1.5, max_value=10.0),
        width=st.integers(min_value=2, max_value=8),
    )
    def test_plan_invariants(tmp_path_factory, sizes, spans, ratio, width):
        tmp = tmp_path_factory.mktemp("plan")
        dirs, meta = [], {}
        for i, size in enumerate(sizes):
            span = spans[i % len(spans)] if spans else 1024
            d = _fake_segment(tmp, f"s{i}", size, shard_span=span)
            dirs.append(d)
            meta[d] = (size, span)
        plan = plan_compaction(dirs, tier_ratio=ratio, max_width=width)
        seen: set[str] = set()
        for group in plan["merges"]:
            # width bounds and no dir in two merges
            assert 2 <= len(group) <= width
            assert not (set(group) & seen)
            seen.update(group)
            # only merge-compatible members
            assert len({meta[d][1] for d in group}) == 1
            # largest first; tier ratio holds between extremes
            gs = [meta[d][0] for d in group]
            assert gs == sorted(gs, reverse=True)
            assert max(gs) <= ratio * max(1, min(gs))
        # deterministic under input permutation
        assert plan["merges"] == plan_compaction(
            list(reversed(dirs)), tier_ratio=ratio, max_width=width
        )["merges"]
