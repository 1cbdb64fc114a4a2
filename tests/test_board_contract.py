"""Board-contract shape guards (round 4): the driver grades only the
FIRST 50 queries() entries, so the certification prefix must stay
pinned, fully oracled, and family-covering — these tests fail loudly
if a future edit reorders the board or drops an oracle."""

from __future__ import annotations


def test_certification_prefix_pinned():
    import __spark_entry__ as e

    qs = list(e.queries().keys())
    assert len(e._CERT_PREFIX) == 50
    assert qs[:50] == e._CERT_PREFIX
    # the prefix covers each SURVEY §2 family by representative
    for required in (
        "bm25_topk_indexed", "scan_project_filter", "semi_join_orderby",
        "broadcast_join_agg", "window_topk_per_group", "union_by_name",
        "or_union_docs", "warc_ingest", "exact_dedup", "minhash_lsh",
        "ann_ivfpq", "dsl_match", "pii_census", "bm25_topk_batch_50",
        "percolate_stream",
    ):
        assert required in e._CERT_PREFIX, required


def test_prefix_entries_all_oracled():
    import __spark_entry__ as e

    oracles = e.oracle_sql()
    missing = [k for k in e._CERT_PREFIX if k not in oracles]
    assert not missing, f"prefix entries without oracle SQL: {missing}"


def test_rows_only_set_is_exactly_the_known_three():
    """Only the inherently iterative BPE entries and the gated media
    fake lack oracles — anything else appearing here is a regression
    (media_features_decoded, the REAL decode path, IS oracled)."""
    import __spark_entry__ as e

    qs = set(e.queries())
    oracles = set(e.oracle_sql())
    assert qs - oracles == {"bpe_merges", "bpe_encoded", "media_features"}
    assert "media_features_decoded" in oracles


def test_oracle_package_builds_nonempty_sql():
    from oracle_sql import PARTS

    import __spark_entry__ as e

    out = e.oracle_sql()
    assert len(PARTS) >= 5
    assert all(isinstance(v, str) and v.strip() for v in out.values())
