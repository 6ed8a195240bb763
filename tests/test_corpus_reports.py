"""Behavioral tests for the round-4 corpus-report operators: data-card
rollup totals, TVD divergence bounds, dedup impact accounting, nDCG
ordering vs recall, and range-partitioner balance — invariants the
oracle hash check can't state directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_temp_data_pipeline_spark.operators import packing as pk
from iot_temp_data_pipeline_spark.operators import text_analysis as ta
from iot_temp_data_pipeline_spark.sources.catalog import load_table


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_datacard_rollup_levels_total_consistently(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = ta.datacard_rollup(docs).collect()
    n = docs.count()
    grand = [r for r in out if r["grouping_level"] == 3]
    assert len(grand) == 1 and grand[0]["n_docs"] == n
    # per-source subtotals (lang rolled up) sum to the grand total
    subs = [r for r in out if r["grouping_level"] == 1]
    assert sum(r["n_docs"] for r in subs) == n
    assert sum(r["sum_tokens"] for r in subs) == grand[0]["sum_tokens"]
    # leaf rows sum to each source subtotal
    leaves = [r for r in out if r["grouping_level"] == 0]
    for s in subs:
        assert (
            sum(r["n_docs"] for r in leaves if r["source"] == s["source"])
            == s["n_docs"]
        )


def test_tvd_zero_for_identical_sources_and_high_for_disjoint(spark):
    # two sources with IDENTICAL token distributions -> each source's
    # distribution equals the corpus distribution -> TVD = 0
    same = [
        (1, "a b c d", "en", "s1", 7),
        (2, "a b c d", "en", "s2", 7),
    ]
    out = {r["source"]: r for r in ta.vocab_divergence_tvd(_docs(spark, same)).collect()}
    assert out["s1"]["tvd_permille"] == 0
    assert out["s2"]["tvd_permille"] == 0
    # disjoint vocabularies, equal sizes: TVD vs the 50/50 corpus = 1/2
    disj = [
        (1, "a a a a", "en", "s1", 7),
        (2, "b b b b", "en", "s2", 7),
    ]
    out = {r["source"]: r for r in ta.vocab_divergence_tvd(_docs(spark, disj)).collect()}
    assert out["s1"]["tvd_permille"] == 500
    assert out["s2"]["tvd_permille"] == 500


def test_range_partition_audit_is_balanced_and_ordered(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = pk.range_partition_audit(ev).collect()
    n = ev.count()
    assert sum(r["n_rows"] for r in out) == n
    # bucket value ranges must not interleave (bounds are cut points of
    # a monotone binning; bin-granular overlap at the boundary bin is
    # impossible because buckets partition bins)
    by_bucket = sorted(out, key=lambda r: r["bucket"])
    for lo, hi in zip(by_bucket, by_bucket[1:]):
        assert lo["max_value_milli"] <= hi["min_value_milli"] + pk.RANGE_BIN_MILLI
    # histogram-CDF splits bound every bucket by one bin's mass over the
    # ideal share; the fixture's value distribution is smooth enough
    # that no bucket should exceed 2x ideal
    assert max(r["n_rows"] for r in out) <= 2 * (n // pk.RANGE_BUCKETS) + 1


def test_dedup_cluster_report_accounts_for_whole_corpus(spark, sf_dir):
    from iot_temp_data_pipeline_spark.plans.extensions import _dedup_cluster_report

    out = _dedup_cluster_report(spark, sf_dir).collect()
    from iot_temp_data_pipeline_spark.operators import dedup as dd

    corpus_n = dd.dedup_corpus(spark, sf_dir).count()
    assert sum(r["n_docs"] for r in out) == corpus_n
    for r in out:
        assert r["docs_removed"] == r["n_docs"] - r["n_clusters"]
        assert r["cluster_size"] >= 1
        if r["cluster_size"] == 1:
            assert r["docs_removed"] == 0 and r["chars_removed"] == 0


def test_ndcg_bounded_and_no_higher_than_perfect(spark, sf_dir):
    from iot_temp_data_pipeline_spark.plans.extensions import _ndcg_eval

    row = _ndcg_eval(spark, sf_dir).collect()[0]
    assert 0 <= row["mean_ndcg_permille"] <= 1000
    assert 0 <= row["n_perfect"] <= row["n_queries"]


def test_l_diversity_flags_uniform_sensitive_classes(spark):
    from iot_temp_data_pipeline_spark.operators.governance import l_diversity_audit

    rows = [
        # class (nation 1, band 0): 3 members, ONE segment -> flagged
        (1, "AUTOMOBILE", 100.0),
        (1, "AUTOMOBILE", 200.0),
        (1, "AUTOMOBILE", 300.0),
        # class (nation 2, band 0): 3 members, 3 segments -> diverse, passes
        (2, "AUTOMOBILE", 100.0),
        (2, "BUILDING", 200.0),
        (2, "MACHINERY", 300.0),
    ]
    df = spark.createDataFrame(
        rows, "c_nationkey long, c_mktsegment string, c_acctbal double"
    )
    out = l_diversity_audit(df, l_min=3).collect()
    assert [(r["nationkey"], r["n_distinct_sensitive"]) for r in out] == [(1, 1)]


def test_tokenizer_fertility_counts_subwords_not_words(spark):
    # "don't stop" -> 2 whitespace words; BPE regex splits don't into
    # don / ' / t -> 4 subwords total; fertility 2000 milli
    df = _docs(spark, [(1, "don't stop", "en", "s", 10)])
    row = ta.tokenizer_fertility(df).collect()[0]
    assert row["word_tokens"] == 2
    assert row["subword_tokens"] == 4
    assert row["fertility_milli"] == 2000


def test_triangle_count_on_known_graph(spark):
    from iot_temp_data_pipeline_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} has 4 triangles, every node in 3 of them;
    # a pendant node 5 attached to 1 joins no triangle
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(1, 5)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_merge_intervals_handles_nested_and_chained(spark, tmp_path, sf_dir):
    from iot_temp_data_pipeline_spark.plans.timeseries import merge_error_intervals

    out = merge_error_intervals(spark, sf_dir).collect()
    assert len(out) >= 1
    # islands are disjoint and ordered per user, each at least one pad wide
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for rows in by_user.values():
        for a, b in zip(rows, rows[1:]):
            assert a["end_s"] < b["start_s"]  # merged => gaps are real
        for r in rows:
            assert r["end_s"] - r["start_s"] >= 60
            assert r["n_events"] >= 1


def test_linkage_blocking_and_threshold(spark):
    from iot_temp_data_pipeline_spark.operators.linkage import (
        linkage_blocked_matches,
    )

    rows = [
        # block 1: two names 1 edit apart (match), one far (no match)
        (1, "Customer#000000001", 1, 0.0, "X"),
        (2, "Customer#000000002", 1, 0.0, "X"),
        (3, "Zebra", 1, 0.0, "X"),
        # block 2: singleton -> zero pairs, sentinel min dist
        (4, "Customer#000000004", 2, 0.0, "X"),
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    )
    out = {r["block"]: r for r in linkage_blocked_matches(df).collect()}
    assert out[1]["n_pairs"] == 3  # 3 choose 2 within the block
    assert out[1]["n_matches"] == 1  # only the 1-edit pair
    assert out[1]["min_nonzero_dist"] == 1
    assert out[2] == (2, 1, 0, 0, -1) or (
        out[2]["n_pairs"] == 0 and out[2]["min_nonzero_dist"] == -1
    )
    # cross-block pairs are never compared
    assert sum(r["n_pairs"] for r in out.values()) == 3


def test_hll_intersection_inclusion_exclusion(spark):
    from iot_temp_data_pipeline_spark.operators.sketches import hll_set_intersection

    # users 0-99 click; users 50-149 view -> exact intersection 50
    rows = [(i, "click") for i in range(100)] + [
        (i, "view") for i in range(50, 150)
    ]
    df = spark.createDataFrame(
        [(u, t) for u, t in rows], "user_id long, event_type string"
    )
    r = hll_set_intersection(df).collect()[0]
    assert r["exact_intersection"] == 50
    # union estimate can never exceed the sum of the parts (register
    # max-merge is monotone), and every estimate is positive here
    assert r["est_union"] <= r["est_a"] + r["est_b"]
    assert r["est_a"] > 0 and r["est_b"] > 0
    # HLL at m=64 is coarse, but a 100-user set must not estimate 10x off
    assert 10 <= r["est_a"] <= 1000
