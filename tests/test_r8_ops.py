"""Round-8 regression tests for the ADVICE r7 items: arbitrary-exponent
square-and-multiply in the band-tuning S-curve, the empty-digest guard
in the anomaly enrichment, and empty-query-set guards on every
driver-collect matmul/LUT kernel."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from iot_temp_data_pipeline_spark.operators.anomalies import (
    int_temperature_anomalies,
)
from iot_temp_data_pipeline_spark.operators.dedup import _pow2_col, _pow2_sql
from iot_temp_data_pipeline_spark.operators.pq import (
    M,
    SUBDIM,
    adc_topm,
)
from iot_temp_data_pipeline_spark.operators.similarity import (
    _hnm_partial_matmul,
    knn_brute_force_matmul,
)


# ------------------------------------------------- square-and-multiply

@pytest.mark.parametrize("e", [1, 2, 3, 4, 5, 6, 7, 8, 11, 16])
def test_pow_col_any_positive_exponent(spark, e):
    """_pow2_col must be x**e for ANY positive e (ADVICE r7: e=3 used
    to silently yield x^2), and the SQL twin must build the identical
    multiply tree so both engines agree bit-for-bit."""
    x = 0.7
    got_spark = spark.range(1).select(
        _pow2_col(F.lit(x), e).alias("p")
    ).collect()[0]["p"]
    got_sql = duckdb.sql(
        f"SELECT {_pow2_sql(f'CAST({x} AS DOUBLE)', e)} AS p"
    ).fetchone()[0]
    assert got_spark == pytest.approx(x**e, rel=1e-12)
    # bit-identical cross-engine: same tree, same IEEE order
    assert got_spark == got_sql


def test_pow_rejects_nonpositive_exponent():
    with pytest.raises(ValueError):
        _pow2_col(F.lit(1.0), 0)
    with pytest.raises(ValueError):
        _pow2_sql("x", -1)


# ------------------------------------------------- empty-digest guard

def test_anomalies_empty_input_returns_empty(spark):
    """An empty staging input must yield an empty anomalies frame, not
    StopIteration from the missing global digest row (ADVICE r7)."""
    stg = spark.createDataFrame(
        [],
        schema="device_id string, reading_timestamp timestamp,"
        " _dlt_id string, is_valid_record boolean,"
        " temperature_celsius double, location string,"
        " environment_type string",
    )
    out = int_temperature_anomalies(stg, cache=False)
    assert out.count() == 0
    assert "anomaly_score" in out.columns


# ------------------------------------------- empty-query matmul guards

def _tiny_emb(spark):
    # quantized_corpus shape; vec_ids 1..4, none divisible by 100 so the
    # query filter selects nothing
    return spark.createDataFrame(
        [(i, i % 2, [1] * 4, 4) for i in range(1, 5)],
        schema="vec_id long, label int, qvec array<bigint>, qnorm2 long",
    )


def test_knn_brute_force_matmul_empty_queries(spark):
    out = knn_brute_force_matmul(_tiny_emb(spark), query_mod=100, k=3)
    assert out.count() == 0
    assert out.columns == [
        "query_id", "neighbor_id", "neighbor_label", "cosine", "rank",
    ]


def test_hnm_partial_matmul_empty_queries(spark):
    emb = _tiny_emb(spark).withColumn("label", F.col("label").cast("long"))
    out = _hnm_partial_matmul(emb, query_mod=100)
    assert out.count() == 0
    assert out.columns == [
        "query_id", "q_label", "neighbor_id", "is_same", "cosine",
    ]


def test_adc_topm_numpy_empty_queries(spark):
    enc = spark.createDataFrame(
        [tuple([i] + [0] * M) for i in range(1, 4)],
        schema="vec_id long, "
        + ", ".join(f"c{j} int" for j in range(M)),
    )
    cb = [[(0, [0] * SUBDIM)] for _ in range(M)]
    queries = spark.createDataFrame(
        [], schema="query_id long, q_uvec array<bigint>"
    )
    out = adc_topm(enc, cb, queries, m=3, n_pairs=10**9, strategy="numpy")
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "adc_dist", "rank"]


# ===================================================== round-8 widening
# Semantic contracts for the r8 wave (oracle parity is separately pinned
# for every one of these by tests/test_registry_parity.py).

from iot_temp_data_pipeline_spark.operators import dedup as dd
from iot_temp_data_pipeline_spark.operators import retrieval_ext as rx
from iot_temp_data_pipeline_spark.operators import text_analysis as ta
from iot_temp_data_pipeline_spark.operators.quality import (
    quality_quantile_normalize,
)
from iot_temp_data_pipeline_spark.operators.similarity import (
    ground_truth_topk,
)
from iot_temp_data_pipeline_spark.sources.catalog import load_table


def test_matryoshka_full_dim_recall_is_one(spark, sf_dir):
    """The full-dimension branch must recover the exact ground truth —
    recall exactly 1.0 (the sweep's built-in self-check)."""
    rows = {
        r["prefix_dim"]: r
        for r in rx.matryoshka_recall(spark, sf_dir).collect()
    }
    assert rows[64]["mean_recall_at_k"] == 1.0
    # truncation can only lose recall (not strictly monotone in theory,
    # but the full dim is an upper bound by construction)
    assert rows[16]["mean_recall_at_k"] <= 1.0
    assert rows[16]["n_queries"] == rows[64]["n_queries"]


def test_label_filtered_neighbors_share_query_label(spark, sf_dir):
    emb, _ = __import__(
        "iot_temp_data_pipeline_spark.operators.similarity",
        fromlist=["quantized_corpus"],
    ).quantized_corpus(spark, sf_dir)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    out = rx.knn_label_filtered(spark, sf_dir).collect()
    assert out, "filtered search returned no rows"
    for r in out:
        assert r["label"] == labels[r["query_id"]]
        assert r["neighbor_id"] != r["query_id"]
        assert 1 <= r["rank"] <= rx.FILTERED_K


def test_maxsim_scores_bounded_and_ranked(spark, sf_dir):
    """MaxSim micros are bounded by tokens_per_doc x 1e6 (each per-token
    max cosine <= 1), and ranks are dense 1..k per query."""
    out = rx.maxsim_topk(spark, sf_dir).collect()
    assert out
    bound = rx.MAXSIM_TOKENS_PER_DOC * 1_000_000
    per_q = {}
    for r in out:
        assert -bound <= r["maxsim_micros"] <= bound
        per_q.setdefault(r["query_doc"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_dedup_curve_totals_and_monotonicity(spark, sf_dir):
    corpus = dd.dedup_corpus(spark, sf_dir)
    rows = sorted(
        dd.corpus_dedup_curve(corpus).collect(), key=lambda r: r["bucket"]
    )
    n_docs_total = corpus.count()
    n_distinct = corpus.select("text").distinct().count()
    assert rows[-1]["docs_cum"] == n_docs_total
    assert rows[-1]["new_cum"] == n_distinct
    prev_docs = prev_new = 0
    for r in rows:
        assert r["docs_cum"] == prev_docs + r["n_docs"]
        assert r["new_cum"] == prev_new + r["n_new"]
        assert 0 <= r["novelty_ppm"] <= 1_000_000
        prev_docs, prev_new = r["docs_cum"], r["new_cum"]
    # the injected exact copies guarantee the curve is not flat at 1
    assert rows[-1]["novelty_ppm"] < 1_000_000


def test_pmi_lift_matches_python_recount(spark, sf_dir):
    """Recompute lift for the top row from raw python counts."""
    docs = load_table(spark, sf_dir, "documents")
    out = ta.pmi_collocations(docs).collect()
    assert out
    texts = [r["text"].lower().split() for r in docs.select("text").collect()]
    t_total = sum(len(t) for t in texts)
    b_total = sum(max(len(t) - 1, 0) for t in texts)
    top = out[0]
    c_ab = sum(
        1
        for t in texts
        for a, b in zip(t, t[1:])
        if a == top["w1"] and b == top["w2"]
    )
    c_a = sum(t.count(top["w1"]) for t in texts)
    c_b = sum(t.count(top["w2"]) for t in texts)
    assert c_ab == top["c_ab"] and c_a == top["c_a"] and c_b == top["c_b"]
    assert top["lift_ppm"] == (c_ab * t_total * t_total * 1_000_000) // (
        c_a * c_b * b_total
    )
    # descending-lift ordering with (w1, w2) tie-break
    lifts = [r["lift_ppm"] for r in out]
    assert lifts == sorted(lifts, reverse=True)


def test_quantile_normalize_contract(spark, sf_dir):
    stats = ta.text_stats(load_table(spark, sf_dir, "documents"))
    out = quality_quantile_normalize(stats).collect()
    assert out
    by_source = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    for rows in by_source.values():
        n = rows[0]["src_n"]
        assert len(rows) == n
        top = max(rows, key=lambda r: (r["quality_score"], r["src_rank"]))
        if n > 1:
            # the max-score docs sit at ppm consistent with RANK ties
            assert 0 <= top["pr_ppm"] <= 1_000_000
        for r in rows:
            assert 0 <= r["pr_ppm"] <= 1_000_000
            assert r["decile"] == min(9, r["pr_ppm"] // 100_000)


def test_maxsim_reduces_to_cosine_rank_when_one_token(spark, sf_dir):
    """With tokens_per_doc=1 MaxSim degenerates to single-vector search:
    the micro-floored cosine ranking must agree with the exact
    brute-force ground truth ranking wherever micro-floors are distinct
    (same query set: tdoc == vec_id, mod 100)."""
    ms = rx.maxsim_topk(
        spark, sf_dir, tokens_per_doc=1, query_mod=100, k=5
    ).collect()
    gt = ground_truth_topk(spark, sf_dir, query_mod=100, k=5).collect()
    gt_pairs = {(r["query_id"], r["neighbor_id"]) for r in gt}
    ms_pairs = {(r["query_doc"], r["neighbor_doc"]) for r in ms}
    # micro-floor ties at the k-boundary can swap members; demand >=80%
    # overlap and identical query sets
    assert {q for q, _ in ms_pairs} == {q for q, _ in gt_pairs}
    inter = len(gt_pairs & ms_pairs)
    assert inter >= int(0.8 * len(gt_pairs))


def test_maxsim_pooled_rerank_equals_full_when_r_covers_corpus(
    spark, sf_dir
):
    """With the shortlist covering every doc the refine sees every pair,
    so the composition must equal the exhaustive MaxSim exactly."""
    full = {
        (r["query_doc"], r["rank"]): (r["neighbor_doc"], r["maxsim_micros"])
        for r in rx.maxsim_topk(spark, sf_dir).collect()
    }
    comp = {
        (r["query_doc"], r["rank"]): (r["neighbor_doc"], r["maxsim_micros"])
        for r in rx.maxsim_pooled_rerank(spark, sf_dir, r=10**6).collect()
    }
    assert comp == full


def test_maxsim_pooled_rerank_rank_contract(spark, sf_dir):
    out = rx.maxsim_pooled_rerank(spark, sf_dir).collect()
    assert out
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_doc"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_maxsim_matmul_bit_identical_to_catalyst(spark, sf_dir):
    """The GEMM strategy (probe catch #7) must reproduce the Catalyst
    form exactly — same docs, same micro-unit scores, same ranks."""
    cat = {
        (r["query_doc"], r["rank"]): (r["neighbor_doc"], r["maxsim_micros"])
        for r in rx.maxsim_topk(spark, sf_dir, strategy="catalyst").collect()
    }
    mm = {
        (r["query_doc"], r["rank"]): (r["neighbor_doc"], r["maxsim_micros"])
        for r in rx.maxsim_topk(spark, sf_dir, strategy="matmul").collect()
    }
    assert mm == cat


def test_maxsim_matmul_empty_queries(spark):
    """tdoc 0 matches every mod, so the empty-query guard only fires on
    a corpus with no doc 0 — drive the kernel directly with one."""
    tok = spark.createDataFrame(
        [(7, 28, [1, 2], 5), (7, 29, [2, 1], 5)],
        schema="tdoc long, vec_id long, qvec array<bigint>, qnorm2 long",
    )
    out = rx._maxsim_matmul(tok, query_mod=10**9, k=5)
    assert out.count() == 0
    assert out.columns == [
        "query_doc", "neighbor_doc", "maxsim_micros", "rank",
    ]


def test_pmi_empty_and_degenerate_corpus(spark):
    """Empty corpus and single-token docs (no bigram positions) must
    return empty cleanly — the lift denominator is never evaluated."""
    empty = spark.createDataFrame([], schema="doc_id long, text string")
    assert ta.pmi_collocations(empty).count() == 0
    single = spark.createDataFrame(
        [(1, "hello"), (2, "world")], schema="doc_id long, text string"
    )
    out = ta.pmi_collocations(single)
    assert out.count() == 0
    assert out.columns == ["w1", "w2", "c_ab", "c_a", "c_b", "lift_ppm"]


def test_dedup_curve_crafted_corpus(spark):
    """Hand-checkable corpus: totals, first-bucket attribution, and ppm
    floors recomputed in python over the same portable hash."""
    import hashlib

    rows = [(i, f"text {i % 6}") for i in range(30)]  # 6 distinct texts
    corpus = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {r["bucket"]: r for r in dd.corpus_dedup_curve(corpus).collect()}

    def bucket(doc_id: int) -> int:
        h = hashlib.md5(
            f"{dd.NOVELTY_CURVE_SEED}:{doc_id}".encode()
        ).hexdigest()
        return int(h[:8], 16) % dd.NOVELTY_CURVE_BUCKETS

    per_bucket: dict[int, int] = {}
    first: dict[str, int] = {}
    for i, t in rows:
        b = bucket(i)
        per_bucket[b] = per_bucket.get(b, 0) + 1
        first[t] = min(first.get(t, 10**9), b)
    new_per: dict[int, int] = {}
    for b in first.values():
        new_per[b] = new_per.get(b, 0) + 1
    docs_cum = new_cum = 0
    for b in sorted(per_bucket):
        docs_cum += per_bucket[b]
        new_cum += new_per.get(b, 0)
        r = out[b]
        assert r["n_docs"] == per_bucket[b]
        assert r["n_new"] == new_per.get(b, 0)
        assert r["docs_cum"] == docs_cum and r["new_cum"] == new_cum
        assert r["novelty_ppm"] == (new_cum * 1_000_000) // docs_cum


def test_quantile_normalize_single_doc_source(spark):
    """src_n == 1 must yield pr_ppm 0 (the (n-1) denominator guard)."""
    stats = spark.createDataFrame(
        [(1, "solo", 0.7), (2, "duo", 0.4), (3, "duo", 0.9)],
        schema="doc_id long, source string, quality_score double",
    )
    from iot_temp_data_pipeline_spark.operators.quality import (
        quality_quantile_normalize as qqn,
    )

    out = {r["doc_id"]: r for r in qqn(stats).collect()}
    assert out[1]["pr_ppm"] == 0 and out[1]["decile"] == 0
    assert out[2]["pr_ppm"] == 0
    assert out[3]["pr_ppm"] == 1_000_000 and out[3]["decile"] == 9


def test_prefix_filter_join_equals_unpruned_all_pairs(spark, sf_dir):
    """Algorithm equivalence: prefix filtering is a LOSSLESS candidate
    generator, so its output must equal the unpruned exact self-join's
    pair set, pair for pair and count for count."""
    corpus = dd.dedup_corpus(spark, sf_dir)
    pf = {
        (r["doc_a"], r["doc_b"]): (
            r["common_shingles"], r["shingles_a"], r["shingles_b"],
        )
        for r in dd.jaccard_prefix_filter_pairs(corpus).collect()
    }
    brute = {
        (r["doc_a"], r["doc_b"]): (
            r["common_shingles"], r["shingles_a"], r["shingles_b"],
        )
        for r in dd.ngram_jaccard_pairs(
            corpus, max_shingle_df=1 << 62
        ).collect()
    }
    assert pf == brute
    assert pf, "fixture corpus should contain near-duplicate pairs"


def test_hybrid_rrf_contract(spark, sf_dir):
    """Fused ranking rewards dual-retriever agreement: every (query,
    rank) chain is dense 1..k; a doc in BOTH lists at rank r scores
    2·(SCALE div (k0+r)) ≥ any single-list doc at the same rank; all
    rrf_scaled recompute exactly from the member ranks."""
    from iot_temp_data_pipeline_spark.operators.similarity import (
        ground_truth_topk,
    )
    from iot_temp_data_pipeline_spark.operators.tfidf import bm25_topk

    out = rx.hybrid_rrf_topk(spark, sf_dir).collect()
    assert out
    dense = {
        (r["query_id"], r["neighbor_id"]): r["rank"]
        for r in ground_truth_topk(spark, sf_dir, 100, rx.RRF_DEPTH).collect()
    }
    sparse = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in bm25_topk(spark, sf_dir, 100, rx.RRF_DEPTH).collect()
    }
    for r in out:
        key = (r["query_id"], r["doc_id"])
        expect = 0
        if key in sparse:
            expect += rx.RRF_SCALE // (rx.RRF_K0 + sparse[key])
        if key in dense:
            expect += rx.RRF_SCALE // (rx.RRF_K0 + dense[key])
        assert r["rrf_scaled"] == expect
        assert r["in_sparse"] == int(key in sparse)
        assert r["in_dense"] == int(key in dense)
