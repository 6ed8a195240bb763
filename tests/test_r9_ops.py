"""Round-9 reworks: fused matryoshka kernel, cached substring-span
artifacts, Q21 window decorrelation, maxsim strategy validation, IVF
zero-norm-centroid guard, literal-map rank fusion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_temp_data_pipeline_spark.operators import dedup as dd
from iot_temp_data_pipeline_spark.operators import quality as qa
from iot_temp_data_pipeline_spark.operators import retrieval_ext as rx
from iot_temp_data_pipeline_spark.plans.registry import REGISTRY


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_matryoshka_fused_equals_catalyst(spark, sf_dir):
    """The one-scan GEMM sweep must be row-identical to the per-dim
    Catalyst twin — the bit-parity pin for the fused kernel (same
    exact int64 prefix dots, same IEEE op order, same tie rule)."""
    a = _rows(rx.matryoshka_recall(spark, sf_dir), "prefix_dim")
    b = _rows(rx.matryoshka_recall_catalyst(spark, sf_dir), "prefix_dim")
    assert a == b
    # full-dim branch is a self-check: recall exactly 1
    assert a[-1][2] == 1.0


def test_matryoshka_warm_serve_equals_cold(spark, sf_dir):
    """Session-cached query matrix / ground-truth keys: warm calls
    must reproduce the cold result exactly."""
    a = _rows(rx.matryoshka_recall(spark, sf_dir), "prefix_dim")
    b = _rows(rx.matryoshka_recall(spark, sf_dir), "prefix_dim")
    assert a == b and len(a) == len(rx.MATRYOSHKA_DIMS)


def test_maxsim_strategy_typo_raises(spark, sf_dir):
    """A typo'd strategy must raise, never silently fall through to
    the interpreted-HOF path (ADVICE r8)."""
    with pytest.raises(ValueError, match="strategy"):
        rx.maxsim_topk(spark, sf_dir, strategy="gemm")


def test_ivf_matmul_rejects_zero_norm_centroids(spark, sf_dir):
    """The chunked running-best tie rule is only provably identical to
    np.argmax for non-NaN columns; a zero-norm centroid must fail the
    build loudly (ADVICE r8)."""
    from iot_temp_data_pipeline_spark.operators.similarity import (
        ivf_cell_assignments_matmul,
    )

    emb = spark.createDataFrame(
        [(0, 0, [0, 0], 0), (1, 0, [3, 4], 25), (2, 1, [4, 3], 25)],
        schema="vec_id long, label int, qvec array<long>, qnorm2 long",
    )
    with pytest.raises(ValueError, match="zero-norm centroid"):
        # centroid_mod=1 makes every row (incl. the zero vector) a centroid
        ivf_cell_assignments_matmul(emb, centroid_mod=1)
    # BOTH physical strategies must fail identically — the HOF path's
    # max_by treats NaN cosines as greatest and would otherwise
    # silently assign every vector to the degenerate cell (review r9)
    from iot_temp_data_pipeline_spark.operators.similarity import (
        ivf_cell_assignments,
    )

    with pytest.raises(ValueError, match="zero-norm centroid"):
        ivf_cell_assignments(emb, centroid_mod=1)


def test_substring_serve_matches_build(spark, sf_dir):
    """Report/removal served from the cached span table must equal the
    build-from-scratch forms (the cache is a pure materialization)."""
    corpus = dd.dedup_corpus(spark, sf_dir)
    base = dd.cached_tokenized_corpus(spark, sf_dir)
    spans = dd.cached_repeated_spans(spark, sf_dir)
    cold = _rows(dd.exact_substring_spans(corpus), "doc_id")
    warm = _rows(
        dd.exact_substring_spans_from_tokens(base, spans=spans), "doc_id"
    )
    assert cold == warm
    cold_rm = _rows(dd.apply_substring_removal(corpus), "doc_id")
    warm_rm = _rows(
        dd.apply_substring_removal_from_tokens(base, spans=spans), "doc_id"
    )
    assert cold_rm == warm_rm


def test_repeated_spans_cache_is_checkpointed_once(spark, sf_dir):
    """Same (session, sf_dir) key returns the SAME DataFrame object —
    the build runs once per session, not per consumer."""
    a = dd.cached_repeated_spans(spark, sf_dir)
    b = dd.cached_repeated_spans(spark, sf_dir)
    assert a is b
    t1 = dd.cached_tokenized_corpus(spark, sf_dir)
    t2 = dd.cached_tokenized_corpus(spark, sf_dir)
    assert t1 is t2


def test_rank_fusion_serve_equals_build(spark, sf_dir):
    """quality_rank_fusion served from the session-cached signal-bins
    artifact must equal the build-from-scratch operator."""
    from iot_temp_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    cold = _rows(qa.quality_rank_fusion(docs), "source")
    warm = _rows(
        qa.quality_rank_fusion_from_bins(qa.quality_signal_bins(spark, sf_dir)),
        "source",
    )
    assert cold == warm


def test_q21_window_form_equals_aggregate_join_form(spark, sf_dir):
    """The window-based decorrelation must reproduce the aggregate-and-
    join-back form it replaced (independent of the DuckDB oracle's
    literal EXISTS/NOT EXISTS check)."""
    from iot_temp_data_pipeline_spark.plans.tpch_extra import (
        Q21_LATE_DAYS,
        Q21_NATION,
    )
    from iot_temp_data_pipeline_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    na = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == Q21_NATION)
    su = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q21_LATE_DAYS} DAYS"
    )
    enriched = li.join(od, li.l_orderkey == od.o_orderkey).select(
        "l_orderkey", "l_suppkey", late.alias("is_late")
    )
    per_order = enriched.groupBy(F.col("l_orderkey").alias("agg_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    old_form = _rows(
        enriched.filter(F.col("is_late"))
        .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .join(per_order, F.col("l_orderkey") == F.col("agg_orderkey"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait")),
        "s_name",
    )
    new_form = _rows(
        REGISTRY["tpch_q21_suppliers_who_kept_waiting"]
        .spark(spark, sf_dir)
        .select("s_name", "numwait"),
        "s_name",
    )
    assert new_form == old_form


def test_winnowing_guarantee_and_density(spark, sf_dir):
    """Schleimer et al.'s two winnowing theorems on a constructed pair:
    (1) any shared run of >= w+2 tokens yields >= 1 shared fingerprint;
    (2) per-doc fingerprint count is <= the number of hash positions
    and >= positions/w (each window keeps one)."""
    from iot_temp_data_pipeline_spark.operators.text_analysis import (
        WINNOW_W,
        winnowing_fingerprints,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 >= w+2
    docs = spark.createDataFrame(
        [
            (1, "one two three " + shared + " nine ten"),
            (2, shared + " zulu yankee xray whiskey victor"),
        ],
        schema="doc_id long, text string",
    )
    fp = winnowing_fingerprints(docs).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    for d in (1, 2):
        n_tokens = len([t for t in docs.filter(F.col("doc_id") == d).collect()[0]["text"].split()])
        positions = n_tokens - 2
        full_windows = positions - (WINNOW_W - 1)
        n_fp = len([r for r in fp if r["doc_id"] == d])
        assert 1 <= n_fp <= positions
        assert n_fp * WINNOW_W >= full_windows  # one per window, dedup'd


def test_winnowing_overlap_finds_injected_duplicates(spark, sf_dir):
    """The MOSS report over the duplicate-injected corpus must flag
    every exact copy (doc_id + 1_000_000) with overlap 1000 permille
    against its original."""
    from iot_temp_data_pipeline_spark.operators.text_analysis import (
        cached_winnowing_fps,
        winnowing_overlap_pairs,
    )
    from iot_temp_data_pipeline_spark.operators.dedup import dedup_corpus

    corpus = dedup_corpus(spark, sf_dir)
    pairs = winnowing_overlap_pairs(
        corpus, fp=cached_winnowing_fps(spark, sf_dir)
    ).collect()
    exact = {
        (r["doc_a"], r["doc_b"]): r["overlap_permille"]
        for r in pairs
        if r["doc_b"] == r["doc_a"] + 1_000_000
    }
    copies = [
        r["doc_id"]
        for r in corpus.filter(
            (F.col("doc_id") < 1_000_000) & (F.col("doc_id") % 7 == 0)
        ).collect()
    ]
    found = [d for d in copies if (d, d + 1_000_000) in exact]
    # every exact copy with enough fingerprints must be flagged at 1000
    assert found, "no injected copies flagged"
    assert all(exact[(d, d + 1_000_000)] == 1000 for d in found)


def test_temperature_weights_boost_small_sources(spark, sf_dir):
    """w = isqrt(n) damps giants: the largest source's boost_permille
    must be <= the smallest source's, and weights must be exact
    integer sqrts."""
    import math

    from iot_temp_data_pipeline_spark.operators.mixture import (
        mixture_temperature_weights,
    )
    from iot_temp_data_pipeline_spark.sources.catalog import load_table

    rows = mixture_temperature_weights(
        load_table(spark, sf_dir, "documents")
    ).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["weight"] == math.isqrt(r["n_tokens"])
    big = max(rows, key=lambda r: r["n_tokens"])
    small = min(rows, key=lambda r: r["n_tokens"])
    assert big["boost_permille"] <= small["boost_permille"]


def test_span_corruption_invariants(spark, sf_dir):
    """Plan self-consistency: corrupted+kept accounts for every token,
    spans merge adjacent positions (n_spans <= n_corrupted), and the
    corruption rate is in the plausible band for 5%-start/len-3
    (roughly 15%, loose bounds for small docs)."""
    from iot_temp_data_pipeline_spark.operators.augment import (
        span_corruption_plan,
    )
    from iot_temp_data_pipeline_spark.sources.catalog import load_table

    rows = span_corruption_plan(load_table(spark, sf_dir, "documents")).collect()
    assert rows
    tot = sum(r["n_tokens"] for r in rows)
    cor = sum(r["n_corrupted"] for r in rows)
    for r in rows:
        assert 0 <= r["n_spans"] <= r["n_corrupted"] <= r["n_tokens"]
    assert 0.05 < cor / tot < 0.30  # ~15% by construction


def test_fim_cuts_partition_the_document(spark, sf_dir):
    """0 <= cut1 <= cut2 <= n for every doc, and the three segment
    hashes reassemble the document (verified on one doc by
    recomputation)."""
    import hashlib
    import re

    from iot_temp_data_pipeline_spark.operators.augment import (
        fim_transform_plan,
    )
    from iot_temp_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = fim_transform_plan(docs).collect()
    assert rows
    for r in rows:
        assert 0 <= r["cut1"] <= r["cut2"] <= r["n_tokens"]
    r = rows[0]
    text = docs.filter(F.col("doc_id") == r["doc_id"]).collect()[0]["text"]
    tk = re.split(r"\s+", text.lower())
    for lo, hi, col in [
        (0, r["cut1"], "prefix_md5"),
        (r["cut1"], r["cut2"], "middle_md5"),
        (r["cut2"], len(tk), "suffix_md5"),
    ]:
        assert (
            hashlib.md5(" ".join(tk[lo:hi]).encode()).hexdigest() == r[col]
        )


def test_hamilton_allocation_sums_to_k(spark, sf_dir):
    """Largest-remainder apportionment: Σ final_alloc == k exactly,
    every final is base or base+1, and top-ups go to the largest
    residues."""
    from iot_temp_data_pipeline_spark.operators.mixture import (
        HAMILTON_K,
        stratified_allocation_hamilton,
    )
    from iot_temp_data_pipeline_spark.sources.catalog import load_table

    rows = stratified_allocation_hamilton(
        load_table(spark, sf_dir, "documents")
    ).collect()
    assert sum(r["final_alloc"] for r in rows) == HAMILTON_K
    for r in rows:
        assert r["final_alloc"] - r["base_alloc"] in (0, 1)
    min_topped = min(
        (r["residue"] for r in rows if r["got_topup"]), default=None
    )
    if min_topped is not None:
        assert all(
            r["residue"] <= min_topped or r["got_topup"]
            for r in rows
        )


def test_vocab_growth_monotone(spark, sf_dir):
    """Cumulative tokens/types are nondecreasing across buckets and
    cum_types matches the corpus's total distinct-token count."""
    from iot_temp_data_pipeline_spark.functions.text import tokens
    from iot_temp_data_pipeline_spark.operators.text_analysis import (
        vocab_growth_curve,
    )
    from iot_temp_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = sorted(
        vocab_growth_curve(docs).collect(), key=lambda r: r["bucket"]
    )
    for a, b in zip(rows, rows[1:]):
        assert b["cum_tokens"] >= a["cum_tokens"]
        assert b["cum_types"] >= a["cum_types"]
    total_types = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .distinct()
        .count()
    )
    assert rows[-1]["cum_types"] == total_types


def test_footrule_decorrelates_and_bounds(spark, sf_dir):
    """Footrule of two independently-seeded epoch orders sits well away
    from 0 (identical) and below the n^2/2 max; same-seed epochs give
    exactly 0."""
    from iot_temp_data_pipeline_spark.operators.packing import (
        epoch_shuffle_footrule,
    )
    from iot_temp_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = epoch_shuffle_footrule(docs).collect()
    for r in rows:
        n = r["n_docs"]
        assert 0 <= r["footrule_sum"] <= n * n // 2
        if n >= 20:
            # independent permutations expect ~n^2/3 → ~667 permille of
            # the n^2/2 max; a broken reseed would read ~0
            assert 300 <= r["footrule_permille_of_max"] <= 1000
    same = epoch_shuffle_footrule(docs, seed1=51, seed2=51).collect()
    assert all(r["footrule_sum"] == 0 for r in same)


def test_seq_len_tradeoff_conservation(spark, sf_dir):
    """kept + trunc == total and kept + pad == n_docs·L for every
    candidate length; utilization decreases in L once docs are shorter
    than the window."""
    from iot_temp_data_pipeline_spark.operators.packing import (
        seq_len_tradeoff,
    )
    from iot_temp_data_pipeline_spark.sources.catalog import load_table

    rows = sorted(
        seq_len_tradeoff(load_table(spark, sf_dir, "documents")).collect(),
        key=lambda r: r["seq_len"],
    )
    assert len(rows) == 4
    for r in rows:
        assert r["kept_tokens"] + r["trunc_tokens"] == r["total_tokens"]
        assert r["kept_tokens"] + r["pad_tokens"] == r["n_docs"] * r["seq_len"]
    assert rows[-1]["trunc_tokens"] <= rows[0]["trunc_tokens"]
    assert rows[-1]["pad_tokens"] >= rows[0]["pad_tokens"]


def test_maxsim_truth_cache_serves_pooled_recall(spark, sf_dir):
    """cached_maxsim_truth equals a fresh exhaustive run, and warm
    calls return the same DataFrame object."""
    from iot_temp_data_pipeline_spark.operators import retrieval_ext as rx2

    a = rx2.cached_maxsim_truth(spark, sf_dir)
    b = rx2.cached_maxsim_truth(spark, sf_dir)
    assert a is b
    fresh = rx2.maxsim_topk(spark, sf_dir).select("query_doc", "neighbor_doc")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, fresh.collect()))
