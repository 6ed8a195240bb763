"""Round-10 operator contracts: the winnowing pair-index build/serve
split, the incremental (delta-crawl) winnowing probe, and the per-doc
bigram-LM surprisal gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_temp_data_pipeline_spark.operators.dedup import dedup_corpus
from iot_temp_data_pipeline_spark.operators.text_analysis import (
    WINNOW_INC_MOD,
    bigram_surprisal_per_doc,
    cached_winnowing_fps,
    cached_winnowing_pairs,
    winnowing_incremental_overlap,
    winnowing_overlap_pairs,
    winnowing_pair_index,
)


def test_pair_index_equals_report_pairs(spark, sf_dir):
    """The cached pair index and the overlap report must agree pair-for-
    pair on (doc_a, doc_b, shared_fps) — the report only adds the count
    joins."""
    fp = cached_winnowing_fps(spark, sf_dir)
    idx = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in winnowing_pair_index(fp).collect()
    }
    rep = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in winnowing_overlap_pairs(
            fp=fp, pairs=cached_winnowing_pairs(spark, sf_dir)
        ).collect()
    }
    assert idx == rep
    assert all(a < b for a, b in idx)


def test_incremental_winnowing_flags_injected_dups(spark, sf_dir):
    """Exact-copy replicas (+1M, every 7th doc) whose original landed on
    the other side of the increment split MUST be flagged 'dup' with
    overlap 1000‰ — identical text shares every fingerprint. Replicas
    holding fewer than min_shared fingerprints are below the detector's
    guarantee threshold by definition and legitimately read 'novel'."""
    fp = cached_winnowing_fps(spark, sf_dir)
    rows = winnowing_incremental_overlap(fp).collect()
    by_id = {r["doc_id"]: r for r in rows}
    originals = {
        r["doc_id"]
        for r in dedup_corpus(spark, sf_dir)
        .filter(
            (F.col("doc_id") < 1_000_000)
            & (F.col("doc_id") % WINNOW_INC_MOD != 0)
        )
        .select("doc_id")
        .collect()
    }
    from iot_temp_data_pipeline_spark.operators.text_analysis import (
        WINNOW_MIN_SHARED,
    )

    checked = 0
    for doc_id, r in by_id.items():
        if (
            1_000_000 <= doc_id < 2_000_000
            and (doc_id - 1_000_000) in originals
            and r["n_fp"] >= WINNOW_MIN_SHARED
        ):
            assert r["verdict"] == "dup", doc_id
            assert r["best_overlap_permille"] == 1000, doc_id
            checked += 1
    assert checked > 0  # the split genuinely exercises the dup branch
    # every increment doc gets exactly one row, all verdicts valid
    assert len(rows) == len(by_id)
    assert {r["verdict"] for r in rows} <= {"dup", "novel"}
    # matches are history-side only: no increment doc may appear as a
    # match of itself (n_fp > 0 for every emitted row by construction)
    assert all(r["n_fp"] > 0 for r in rows)


def test_bigram_surprisal_invariants(spark, sf_dir):
    """bits ≥ 0 per construction (c1 ≥ c2); a doc whose every bigram is
    unique-to-itself scores bitlen(c1)−bitlen(c2) with c1 = c2 → 0; the
    mean is the exact integer centibit ratio."""
    docs = spark.createDataFrame(
        [
            (1, "zqx1 zqx2 zqx3 zqx4", "en"),   # all bigrams unique → 0 bits
            (2, "the the the the the", "en"),   # one repeated bigram
            (3, "solo", "en"),                  # < 2 tokens → no row
        ],
        "doc_id long, text string, lang string",
    )
    rows = {r["doc_id"]: r for r in bigram_surprisal_per_doc(docs).collect()}
    assert 3 not in rows
    assert rows[1]["total_bits"] == 0  # its bigrams occur nowhere else
    assert rows[2]["total_bits"] == 0  # p(the|the) = 1 → 0 bits
    corpus = bigram_surprisal_per_doc(dedup_corpus(spark, sf_dir))
    agg = corpus.agg(
        F.min("total_bits").alias("mn"),
        F.sum(
            (
                F.expr("div(100 * total_bits, n_bigrams)")
                != F.col("mean_centibits")
            ).cast("int")
        ).alias("bad"),
    ).first()
    assert agg["mn"] >= 0
    assert agg["bad"] == 0


def test_batch_contamination_scatter_vs_colocate(spark):
    """A manifest that co-locates a dup pair in one batch must count it;
    one that scatters the pair across shards must not."""
    from iot_temp_data_pipeline_spark.operators.packing import (
        batch_contamination_audit,
    )

    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    co = spark.createDataFrame(
        [(1, 0, 1), (2, 0, 2)], "doc_id long, shard_id long, shard_pos long"
    )
    scattered = spark.createDataFrame(
        [(1, 0, 1), (2, 1, 1)], "doc_id long, shard_id long, shard_pos long"
    )
    r_co = batch_contamination_audit(co, pairs).first()
    assert (r_co["n_pairs"], r_co["co_shard_pairs"], r_co["co_batch_pairs"]) == (1, 1, 1)
    assert r_co["co_batch_permille"] == 1000
    r_sc = batch_contamination_audit(scattered, pairs).first()
    assert (r_sc["co_shard_pairs"], r_sc["co_batch_pairs"]) == (0, 0)
    # batch boundary: positions 32 and 33 straddle batches (1-based pos,
    # batch = (pos-1) div 32)
    straddle = spark.createDataFrame(
        [(1, 0, 32), (2, 0, 33)], "doc_id long, shard_id long, shard_pos long"
    )
    r_st = batch_contamination_audit(straddle, pairs).first()
    assert (r_st["co_shard_pairs"], r_st["co_batch_pairs"]) == (1, 0)


def test_unimax_waterfilling_invariants(spark, sf_dir):
    """Σ allocated == min(B, Σ cap) exactly; allocated ≤ cap row-wise;
    the capped set is a prefix of the cap order; both branches occur
    on the fixture (B = tot/2 with a 4-epoch cap)."""
    from iot_temp_data_pipeline_spark.operators.mixture import (
        mixture_unimax_allocation,
    )
    from iot_temp_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = mixture_unimax_allocation(docs).collect()
    total_tokens = sum(r["n_tokens"] for r in rows)
    budget = total_tokens // 2
    cap_sum = sum(r["cap_tokens"] for r in rows)
    assert sum(r["allocated_tokens"] for r in rows) == min(budget, cap_sum)
    assert all(0 <= r["allocated_tokens"] <= r["cap_tokens"] for r in rows)
    ordered = sorted(rows, key=lambda r: (r["cap_tokens"], r["source"]))
    flags = [r["capped"] for r in ordered]
    assert flags == sorted(flags, reverse=True)  # capped is a prefix
    # synthetic corpus forcing both branches: one tiny source, one giant
    synth = spark.createDataFrame(
        [(1, "a b", "tiny"), (2, " ".join(["w"] * 1000), "giant")],
        "doc_id long, text string, source string",
    )
    srows = {r["source"]: r for r in mixture_unimax_allocation(synth).collect()}
    assert srows["tiny"]["capped"] and srows["tiny"]["allocated_tokens"] == 8
    assert not srows["giant"]["capped"]
    assert (
        srows["tiny"]["allocated_tokens"] + srows["giant"]["allocated_tokens"]
        == (2 + 1000) // 2
    )


def test_bm25_impact_reduces_to_exact_when_unpruned(spark, sf_dir):
    """With m ≥ every term's df the impact index keeps all postings, so
    the pruned ranking must equal exact BM25 row-for-row (the
    r-covers-corpus equality pattern)."""
    from iot_temp_data_pipeline_spark.operators.tfidf import (
        bm25_impact_topk,
        bm25_topk,
    )

    exact = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score_scaled"])
        for r in bm25_topk(spark, sf_dir).collect()
    }
    pruned = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score_scaled"])
        for r in bm25_impact_topk(spark, sf_dir, m=10_000_000).collect()
    }
    assert exact == pruned
    assert len(exact) > 0
