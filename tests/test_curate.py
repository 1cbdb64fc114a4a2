"""End-to-end corpus curation: annotate -> filter -> exact dedup ->
minhash near-dedup (operators/curate.py). The composed pipeline is
also value-hash checked against DuckDB at sf0.01 via the
``curated_docs`` oracle entry (test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators.curate import (
    curate_corpus,
    curation_report,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tomorrow"
OTHER = (
    "completely different content about the spark engine and its "
    "inverted index for the win"
)
SPANISH = "el perro y la casa de la familia grande en la ciudad vieja"


def test_curate_pipeline_keeps_expected_survivors(spark):
    rows = [
        (0, BASE),        # keeper: near-dup cluster representative
        (1, NEAR),        # near-dup of 0 (smaller id wins) -> dropped
        (2, BASE),        # exact dup of 0 -> dropped at the digest stage
        (3, OTHER),       # keeper: distinct english doc
        (4, SPANISH),     # dropped by the lang filter (langs=en only)
        (5, "too short"), # dropped by min_tokens
        (6, ""),          # dropped (0 tokens)
        (7, None),        # dropped (null text)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curated = curate_corpus(
        docs, min_tokens=5, min_quality=0.2, langs=("en",),
        near_threshold=0.5,
    )
    got = {r["doc_id"]: r for r in curated.collect()}
    assert set(got) == {0, 3}
    assert got[0]["lang_pred"] == "en" and got[3]["lang_pred"] == "en"
    assert got[0]["n_tokens"] == 13
    assert all(0.0 <= got[i]["quality"] <= 1.0 for i in got)
    assert got[0]["fingerprint"] != got[3]["fingerprint"]

    rep = curation_report(docs, curated)
    assert rep["docs_in"] == 8 and rep["docs_out"] == 2
    assert rep["dropped"] == 6
    assert rep["tokens_out"] == got[0]["n_tokens"] + got[3]["n_tokens"]


def test_curate_greedy_drop_keeps_lowest_id_per_chain(spark):
    """Three mutually-near docs: only the lowest id survives (every
    other doc has a smaller-id near-dup)."""
    rows = [
        (10, BASE),
        (11, BASE.replace("today", "yesterday")),
        (12, BASE.replace("dog", "cat")),
        (13, OTHER),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curated = curate_corpus(
        docs, min_tokens=5, min_quality=0.2, langs=("en",),
        near_threshold=0.5,
    )
    assert {r["doc_id"] for r in curated.collect()} == {10, 13}


def test_split_corpus_deterministic_and_proportional(spark):
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.curate import split_corpus

    docs = spark.range(5000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"]
         for r in split_corpus(docs).collect()}
    # pure function of (id, salt): repartitioning must not move docs
    b = {r["doc_id"]: r["split"]
         for r in split_corpus(docs.repartition(7)).collect()}
    assert a == b
    from collections import Counter

    frac = {k: v / 5000 for k, v in Counter(a.values()).items()}
    assert abs(frac["train"] - 0.9) < 0.02
    assert abs(frac["val"] - 0.05) < 0.01
    assert abs(frac["test"] - 0.05) < 0.01
    # a different salt reshuffles assignments
    c = {r["doc_id"]: r["split"]
         for r in split_corpus(docs, salt="other").collect()}
    assert a != c


def test_split_corpus_weight_validation(spark):
    import pytest as _pytest

    from hadoop_search_engine_spark.operators.curate import split_corpus

    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    with _pytest.raises(ValueError, match="sum to 1"):
        split_corpus(docs, splits=(("a", 0.5), ("b", 0.4)))


def test_split_matches_python_reference(spark):
    """The Spark assignment equals the pure-Python murmur reference —
    the same guarantee the DuckDB oracle row checks cross-engine."""
    from hadoop_search_engine_spark.functions.hashes import mm3_u32_ref
    from hadoop_search_engine_spark.operators.curate import (
        SPLIT_BUCKETS,
        split_corpus,
    )

    docs = spark.range(300).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["split"] for r in split_corpus(docs).collect()}
    for i in range(300):
        h1 = mm3_u32_ref(str(i).encode())
        h = mm3_u32_ref("split".encode(), seed=h1)
        b = h % SPLIT_BUCKETS
        want = "train" if b < 9000 else ("val" if b < 9500 else "test")
        assert got[i] == want, (i, b, got[i], want)


def test_stratified_sample_deterministic_nested_and_rated(spark):
    """Keep decision is a pure function of (id, salt); a lower rate
    with the same salt selects a SUBSET (buckets nest); realized rates
    track the requested ones."""
    from hadoop_search_engine_spark.operators.curate import (
        stratified_sample,
    )

    docs = spark.range(4000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in stratified_sample(docs, 0.3).collect()}
    b = {r["doc_id"]
         for r in stratified_sample(docs.repartition(5), 0.3).collect()}
    assert a == b
    small = {r["doc_id"] for r in stratified_sample(docs, 0.1).collect()}
    assert small <= a  # nesting: rate-0.1 sample subset of rate-0.3
    assert abs(len(a) / 4000 - 0.3) < 0.03
    assert abs(len(small) / 4000 - 0.1) < 0.02
    # different salt -> a different (roughly independent) selection
    c = {r["doc_id"]
         for r in stratified_sample(docs, 0.3, salt="v2").collect()}
    assert c != a


def test_stratified_sample_per_stratum_rates(spark):
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.curate import (
        stratified_sample,
    )

    docs = (
        spark.range(3000).withColumnRenamed("id", "doc_id")
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 3 == 0, "en")
            .when(F.col("doc_id") % 3 == 1, "zh")
            .otherwise("de"),
        )
    )
    kept = stratified_sample(
        docs, {"en": 0.2, "zh": 1.0}, strata_col="lang",
        default_rate=0.0,
    ).groupBy("lang").count().collect()
    got = {r["lang"]: r["count"] for r in kept}
    assert got.get("zh") == 1000          # rate 1.0 keeps everything
    assert "de" not in got                # default 0.0 drops the rest
    assert abs(got["en"] / 1000 - 0.2) < 0.04


def test_stratified_sample_matches_python_reference(spark):
    from hadoop_search_engine_spark.functions.hashes import mm3_u32_ref
    from hadoop_search_engine_spark.operators.curate import (
        SPLIT_BUCKETS,
        stratified_sample,
    )

    docs = spark.range(300).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]
           for r in stratified_sample(docs, 0.25).collect()}
    want = set()
    for i in range(300):
        h1 = mm3_u32_ref(str(i).encode())
        h = mm3_u32_ref("sample".encode(), seed=h1)
        if h % SPLIT_BUCKETS < 2500:
            want.add(i)
    assert got == want


def test_stratified_sample_validation(spark):
    import pytest as _pytest

    from hadoop_search_engine_spark.operators.curate import (
        stratified_sample,
    )

    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    with _pytest.raises(ValueError, match="rate"):
        stratified_sample(docs, 1.5)
    with _pytest.raises(ValueError, match="strata_col"):
        stratified_sample(docs, {"en": 0.5})


def test_contamination_report_planted_overlap(spark):
    from hadoop_search_engine_spark.operators.curate import (
        contamination_report,
        decontaminate,
    )

    train = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),   # shares 4-gram
            (1, "totally unrelated training text here ok"),
            (2, "tiny doc"),                               # < n tokens
        ],
        "doc_id long, text string",
    )
    evald = spark.createDataFrame(
        [(100, "xx alpha beta gamma delta yy")],
        "doc_id long, text string",
    )
    rep = {r["doc_id"]: r
           for r in contamination_report(train, evald, n=4).collect()}
    assert set(rep) == {0}
    # doc 0: 3 distinct 4-grams, exactly 1 shared ("alpha beta gamma delta")
    assert rep[0]["n_shingles"] == 3 and rep[0]["overlap"] == 1
    assert abs(rep[0]["rate"] - round(1 / 3, 6)) < 1e-9

    kept = {r["doc_id"]
            for r in decontaminate(train, evald, n=4).collect()}
    assert kept == {1, 2}  # flagged doc dropped, short doc kept


def test_contamination_no_overlap_and_broadcast_off(spark):
    from hadoop_search_engine_spark.operators.curate import (
        contamination_report,
    )

    train = spark.createDataFrame(
        [(0, "one two three four five")], "doc_id long, text string")
    evald = spark.createDataFrame(
        [(1, "six seven eight nine ten")], "doc_id long, text string")
    assert contamination_report(train, evald, n=4).count() == 0
    # shuffle-join fallback gives identical results
    t2 = spark.createDataFrame(
        [(0, "one two three four five")], "doc_id long, text string")
    got = contamination_report(
        t2, t2.withColumn("doc_id", F.col("doc_id") + 10),
        n=4, broadcast_eval=False,
    ).collect()
    assert len(got) == 1 and got[0]["overlap"] == 2


def test_dedup_lines_keep_first_and_drop_all(spark):
    from hadoop_search_engine_spark.operators.curate import dedup_lines

    banner = "accept all cookies"
    docs = spark.createDataFrame(
        [
            (0, f"{banner}\nunique body zero\nfooter"),
            (1, f"{banner}\nunique body one\nfooter"),
            (2, f"{banner}\nunique body two"),
            (3, "all lines unique here"),
        ],
        "doc_id long, text string",
    )
    # banner df=3, footer df=2, bodies df=1
    kf = {r["doc_id"]: r["text"]
          for r in dedup_lines(docs, max_line_df=1,
                               mode="keep_first").collect()}
    assert kf[0] == f"{banner}\nunique body zero\nfooter"  # first copies
    assert kf[1] == "unique body one"
    assert kf[2] == "unique body two"
    assert kf[3] == "all lines unique here"

    da = {r["doc_id"]: r["text"]
          for r in dedup_lines(docs, max_line_df=1,
                               mode="drop_all").collect()}
    assert da[0] == "unique body zero"  # banner+footer gone everywhere
    assert da[1] == "unique body one"
    assert da[2] == "unique body two"

    # max_line_df=2 tolerates the footer (df 2) but not the banner
    da2 = {r["doc_id"]: r["text"]
           for r in dedup_lines(docs, max_line_df=2,
                                mode="drop_all").collect()}
    assert da2[0] == "unique body zero\nfooter"


def test_dedup_lines_doc_fully_boilerplate_disappears(spark):
    from hadoop_search_engine_spark.operators.curate import dedup_lines

    docs = spark.createDataFrame(
        [(0, "same"), (1, "same"), (2, "same"), (3, "other")],
        "doc_id long, text string",
    )
    da = {r["doc_id"] for r in
          dedup_lines(docs, max_line_df=1, mode="drop_all").collect()}
    assert da == {3}
    kf = {r["doc_id"]: r["text"] for r in
          dedup_lines(docs, max_line_df=1, mode="keep_first").collect()}
    assert kf == {0: "same", 3: "other"}  # first occurrence survives

    import pytest as _pytest
    with _pytest.raises(ValueError, match="mode"):
        dedup_lines(docs, mode="bogus")


def test_mix_corpus_integer_weights_exact_epochs(spark):
    from hadoop_search_engine_spark.operators.curate import mix_corpus

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "es", f"t{i}") for i in range(40)],
        "doc_id long, lang string, text string",
    )
    out = mix_corpus(docs, {"en": 2.0, "es": 0.0}, strata_col="lang")
    rows = out.collect()
    assert all(r["lang"] == "en" for r in rows)   # es weight 0: dropped
    per = {}
    for r in rows:
        per.setdefault(r["doc_id"], []).append(r["epoch"])
    assert len(per) == 20
    assert all(sorted(v) == [0, 1] for v in per.values())


def test_mix_corpus_matches_python_reference_and_nests(spark):
    from hadoop_search_engine_spark.functions.hashes import mm3_u32_ref_str
    from hadoop_search_engine_spark.operators.curate import (
        SPLIT_BUCKETS,
        mix_corpus,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(300)], "doc_id long, text string"
    )

    def py_mix(w):
        wq = int(round(w * SPLIT_BUCKETS))
        nf, rem = wq // SPLIT_BUCKETS, wq % SPLIT_BUCKETS
        out = set()
        for i in range(300):
            for e in range(nf + 1):
                if e < nf or (
                    mm3_u32_ref_str(f"{i}:{e}", "mix") % SPLIT_BUCKETS < rem
                ):
                    out.add((i, e))
        return out

    prev = None
    for w in (0.3, 0.7, 1.3):
        got = {
            (r["doc_id"], r["epoch"])
            for r in mix_corpus(docs.repartition(5), w).collect()
        }
        assert got == py_mix(w), w
        if prev is not None:
            assert prev < got  # strict superset: the ablation ladder nests
        prev = got
    # fractional share lands near the weight
    assert abs(len({d for d, _e in py_mix(0.3)}) / 300 - 0.3) < 0.07


def test_mix_corpus_validation(spark):
    from hadoop_search_engine_spark.operators.curate import mix_corpus

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="strata_col"):
        mix_corpus(docs, {"en": 1.0})
    with _pytest.raises(ValueError, match="weight"):
        mix_corpus(docs, -0.5)


def test_temperature_weights_shape(spark):
    from hadoop_search_engine_spark.operators.curate import (
        mix_corpus,
        temperature_weights,
    )

    docs = spark.createDataFrame(
        [(i, "en" if i < 90 else "es") for i in range(100)],
        "doc_id long, lang string",
    )
    # alpha=1: proportional -> every weight 1.0 (identity mix)
    w1 = temperature_weights(docs, "lang", alpha=1.0)
    assert w1 == {"en": 1.0, "es": 1.0}
    # alpha=0: uniform across strata -> small stratum upsampled 5x,
    # large downsampled, expected total preserved
    w0 = temperature_weights(docs, "lang", alpha=0.0)
    assert w0["es"] == 5.0 and abs(w0["en"] - 50 / 90) < 1e-6
    exp_rows = 90 * w0["en"] + 10 * w0["es"]
    assert abs(exp_rows - 100) < 1e-3
    # feeds the deterministic mixer: es docs now appear 5x each
    mixed = mix_corpus(docs, w0, strata_col="lang")
    es_rows = mixed.where("lang = 'es'").count()
    assert es_rows == 50  # exactly floor(5.0) epochs per doc
