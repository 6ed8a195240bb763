"""Behavioral tests for the corpus-quality operators (operators/quality.py)
and k-means clustering (operators/clustering.py) — semantics the
oracle-parity hash check can't express: threshold behavior on crafted
inputs, invariants (partition/cap bounds), and convergence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_temp_data_pipeline_spark.operators import clustering as km
from iot_temp_data_pipeline_spark.operators import quality as qa
from iot_temp_data_pipeline_spark.operators.dedup import dedup_corpus
from iot_temp_data_pipeline_spark.sources.catalog import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_repetition_rules_flag_degenerate_docs(spark):
    normal = " ".join(f"w{i}" for i in range(60))
    looping = "spam ham " * 40  # one bigram dominates; 5-grams repeat
    short = "too short"
    df = qa.repetition_quality(
        _docs(spark, [(1, normal, "s"), (2, looping.strip(), "s"), (3, short, "s")])
    )
    got = {r["doc_id"]: r for r in df.collect()}
    assert got[1]["passes_quality"] is True
    assert got[1]["dup_5gram_frac"] == 0.0
    # the looping doc fails on BOTH repetition rules
    assert got[2]["passes_quality"] is False
    assert got[2]["dup_5gram_frac"] > 0.9
    assert got[2]["top_bigram_frac"] > 0.5
    # the short doc fails the length gate
    assert got[3]["passes_quality"] is False


def test_phash_brightness_invariance(spark):
    """The aHash contract on real BMP bytes: a brightness-shifted copy
    (ids 192 apart: same size+seed, different brightness) shares the
    fingerprint but NOT the bytes; ids 576 apart are byte-identical."""
    from iot_temp_data_pipeline_spark.operators.multimodal import (
        perceptual_hash_pairs,
    )

    ids = [(10,), (10 + 192,), (10 + 576,), (12,)]  # 12: different class
    docs = spark.createDataFrame(ids, "doc_id long")
    pairs = {
        (r["media_a"], r["media_b"]): r["exact_duplicate"]
        for r in perceptual_hash_pairs(docs).collect()
    }
    assert pairs[(10, 202)] is False  # near-dup: caught, not byte-equal
    assert pairs[(10, 586)] is True  # brightness cycle of 3 → exact copy
    assert not any(12 in p for p in pairs)  # different class never pairs


def test_audio_energy_silence_and_coverage(spark):
    """Windowed PCM energy: digital-silence docs (id % 5 == 0) flag
    every window, patterned docs flag none, and the windows tile the
    full sample count."""
    from iot_temp_data_pipeline_spark.operators.multimodal import (
        audio_energy_windows,
    )

    docs = spark.createDataFrame([(5,), (7,), (15,)], "doc_id long")
    rows = audio_energy_windows(docs).collect()
    per: dict[int, list] = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r)
    assert set(per) == {5, 7, 15}
    for mid, rs in per.items():
        assert sum(r["n_samples"] for r in rs) == 16 + mid % 32
        if mid % 5 == 0:
            assert all(r["is_silence"] for r in rs)
        else:
            assert not any(r["is_silence"] for r in rs)


def test_exact_substring_spans_semantics(spark, sf_dir):
    """A 20-token run shared by two otherwise-unique docs yields exactly
    one merged span of exactly 20 tokens in each; fully-copied corpus
    docs score repeated_frac 1.0."""
    from iot_temp_data_pipeline_spark.operators.dedup import exact_substring_spans

    shared = " ".join(f"s{i}" for i in range(20))
    doc_a = " ".join(f"a{i}" for i in range(20)) + " " + shared + " " + " ".join(
        f"z{i}" for i in range(20)
    )
    doc_b = " ".join(f"b{i}" for i in range(25)) + " " + shared
    doc_c = " ".join(f"c{i}" for i in range(40))  # no repeats
    toy = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in exact_substring_spans(toy).collect()}
    assert set(rows) == {1, 2}
    for d in (1, 2):
        assert rows[d]["n_spans"] == 1
        assert rows[d]["repeated_tokens"] == 20

    # corpus-level: every exact copy (and its original) is 100% repeated
    out = exact_substring_spans(dedup_corpus(spark, sf_dir))
    full = out.filter(
        (F.col("doc_id") % 7 == 0)
        & (F.col("doc_id") < 1_000_000)
        & (F.col("n_tokens") >= 16)
    )
    bad = full.filter(F.col("repeated_frac") < 1.0).count()
    assert bad == 0 and full.count() > 0


def test_dsir_upweights_target_language(spark, sf_dir):
    """The DSIR scorer's selection property: documents from the target
    distribution (lang='en') must out-score every other language on
    average — their hashed n-gram profile IS the target profile."""
    docs = load_table(spark, sf_dir, "documents")
    scored = qa.dsir_importance(docs).join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r["lang"]: r["m"]
        for r in scored.groupBy("lang").agg(F.avg("avg_importance").alias("m")).collect()
    }
    assert "en" in means and len(means) > 1
    for lang, m in means.items():
        if lang != "en":
            assert means["en"] > m, f"en {means['en']} !> {lang} {m}"


def test_cluster_aware_split_has_no_cross_split_pairs(spark, sf_dir):
    """The split's whole point: no near-duplicate pair straddles a
    split boundary, every corpus doc is assigned, and the hash split
    lands near 90/5/5."""
    from iot_temp_data_pipeline_spark.operators import dedup as dd
    from iot_temp_data_pipeline_spark.plans.registry import REGISTRY

    out = REGISTRY["cluster_aware_split"].spark(spark, sf_dir).persist()
    corpus = dedup_corpus(spark, sf_dir)
    assert out.count() == corpus.count()
    pairs = dd.ngram_jaccard_pairs(corpus)
    a = out.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = out.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    crossing = (
        pairs.join(a, "doc_a").join(b, "doc_b").filter(F.col("sa") != F.col("sb"))
    )
    assert crossing.count() == 0
    fracs = {
        r["split"]: r["c"] for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()
    }
    n = sum(fracs.values())
    assert 0.80 <= fracs["train"] / n <= 0.97
    out.unpersist()


def test_contamination_flags_eval_copies(spark, sf_dir):
    out = qa.contaminated_docs(dedup_corpus(spark, sf_dir))
    rows = out.collect()
    assert rows, "duplicate-injected corpus must contain eval leakage"
    by_id = {r["doc_id"]: r for r in rows}
    # every exact copy (doc_id + 1M) of an eval doc (id % 13 == 0, i.e.
    # id % 91 == 0 among the %7 copies) must be flagged at frac 1.0
    docs = load_table(spark, sf_dir, "documents")
    eval_copy_ids = [
        r["doc_id"] + 1_000_000
        for r in docs.filter(
            (F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 13 == 0)
        ).collect()
    ]
    assert eval_copy_ids
    for cid in eval_copy_ids:
        assert cid in by_id, f"exact eval copy {cid} not flagged"
        assert by_id[cid]["contamination_frac"] == 1.0
    # eval docs themselves are never in the output (they are not train)
    assert all(
        not (r["doc_id"] % 13 == 0 and r["doc_id"] < 1_000_000) for r in rows
    )


def test_bpe_greedy_merge_semantics(spark):
    """Pin the canonical BPE behaviors against hand-computed merges:
    left-to-right non-overlapping fusing ('abab' → [ab, ab], count 2
    despite 3 adjacent pairs at offset parity), and the deterministic
    lexicographic tie-break."""
    from iot_temp_data_pipeline_spark.operators.bpe import bpe_merge_table

    docs = spark.createDataFrame([(1, "abab")], "doc_id long, text string")
    rows = {r["round"]: r for r in bpe_merge_table(docs, n_merges=2).collect()}
    # round 1: (a,b) occurs at offsets 0 and 2 → count 2; beats (b,a)=1
    assert (rows[1]["pa"], rows[1]["pb"], rows[1]["cnt"]) == ("a", "b", 2)
    # greedy fold left [a,b,a,b] → [ab, ab], so round 2 merges (ab, ab)
    assert (rows[2]["pa"], rows[2]["pb"], rows[2]["merged"]) == ("ab", "ab", "abab")

    # odd chain: 'aaa' folds to [aa, a] (leftmost-nonoverlap), so after
    # round 1 the (aa, a) pair exists
    docs2 = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    rows2 = {r["round"]: r for r in bpe_merge_table(docs2, n_merges=2).collect()}
    assert (rows2[1]["pa"], rows2[1]["pb"], rows2[1]["cnt"]) == ("a", "a", 2)
    assert (rows2[2]["pa"], rows2[2]["pb"]) == ("aa", "a")

    # tie-break: (x,y) and (y,x) both count 1 → lexicographic smallest
    docs3 = spark.createDataFrame([(1, "xy yx")], "doc_id long, text string")
    r3 = bpe_merge_table(docs3, n_merges=1).collect()[0]
    assert (r3["pa"], r3["pb"]) == ("x", "y")


def test_bloom_prefilter_contract(spark, sf_dir):
    """The Bloom pre-filter's three contracts: (1) NO false negatives —
    every doc the exact join flags is bloom-flagged, per gram; (2) the
    false-positive rate stays under the analytic (fill)^depth bound with
    slack; (3) the probe side joins a BROADCAST filter — the corpus
    never shuffles (the 100 TB point of the sketch)."""
    out = qa.bloom_contaminated_docs(dedup_corpus(spark, sf_dir))
    agg = out.agg(
        F.sum("n_ngrams").alias("grams"),
        F.sum("bloom_overlap").alias("bloom"),
        F.sum("exact_overlap").alias("exact"),
        F.min(F.col("no_false_negative").cast("int")).alias("nfn"),
    ).collect()[0]
    assert agg["nfn"] == 1  # bloom ⊇ exact, per gram, in every doc
    assert agg["bloom"] >= agg["exact"]
    # FPR bound: fill ≈ eval-gram inserts / m is well under 20% at
    # fixture scale → per-gram FPR < 1%; allow 2% slack for collisions.
    fp = agg["bloom"] - agg["exact"]
    assert fp / agg["grams"] < 0.02
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_domain_cap_bounds_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    capped = qa.domain_cap(docs, cap=7)
    per_source = (
        capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    )
    assert per_source
    assert all(r["n"] <= 7 for r in per_source)
    # sources with >= 7 docs are capped exactly at 7
    pop = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for r in per_source:
        assert r["n"] == min(7, pop[r["source"]])
    # deterministic: same selection on a second run
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(r["doc_id"] for r in qa.domain_cap(docs, cap=7).collect())
    assert a == b


def test_kmeans_partitions_corpus_and_converges(spark, sf_dir):
    emb_n = load_table(spark, sf_dir, "embeddings").count()
    final = km.kmeans_clusters(spark, sf_dir)
    rows = final.collect()
    assert sum(r["n_vecs"] for r in rows) == emb_n
    assert 1 <= len(rows) <= km.KMEANS_K
    inertia_2 = sum(r["inertia"] for r in rows)
    # Lloyd's monotonicity: total inertia after 2 iterations is no worse
    # than after 0 (seed centroids only)
    inertia_0 = sum(
        r["inertia"] for r in km.kmeans_clusters(spark, sf_dir, iters=0).collect()
    )
    assert inertia_2 <= inertia_0 + 1e-9


def test_pack_sequences_invariants(spark, sf_dir):
    from iot_temp_data_pipeline_spark.operators import packing as pk

    docs = load_table(spark, sf_dir, "documents")
    out = pk.pack_sequences(docs).collect()
    n_docs = docs.count()
    # one segment per doc plus one extra for each boundary-crossing doc
    assert n_docs <= len(out) <= 2 * n_docs
    assert len({r["doc_id"] for r in out}) == n_docs
    ctx = pk.CONTEXT_LEN
    by_bin = {}
    for r in out:
        assert 0 < r["n_tokens"] <= ctx
        assert 0 <= r["offset_in_bin"] < ctx
        assert 0 < r["seg_len"] <= r["n_tokens"]
        assert r["offset_in_bin"] + r["seg_len"] <= ctx
        by_bin.setdefault(r["bin_id"], []).append(r)
    # segments within a bin are disjoint and bins are exactly full
    # (every bin except the last carries precisely ctx tokens)
    last_bin = max(by_bin)
    for b, rows in by_bin.items():
        rows.sort(key=lambda x: x["offset_in_bin"])
        pos = 0
        for x in rows:
            assert x["offset_in_bin"] == pos
            pos += x["seg_len"]
        assert pos == ctx or b == last_bin
    # a split doc's segments are consistent
    segs = {}
    for r in out:
        segs.setdefault(r["doc_id"], []).append(r)
    for rows in segs.values():
        rows.sort(key=lambda x: x["seg_idx"])
        assert [x["seg_idx"] for x in rows] == list(range(len(rows)))
        assert sum(x["seg_len"] for x in rows) == rows[0]["n_tokens"]
        if len(rows) == 2:
            assert rows[1]["offset_in_bin"] == 0
            assert rows[1]["bin_id"] == rows[0]["bin_id"] + 1
    # bins are contiguous from 0
    bins = sorted(by_bin)
    assert bins[0] == 0 and bins == list(range(len(bins)))


def test_lang_weights_upweight_low_resource(spark, sf_dir):
    from iot_temp_data_pipeline_spark.operators import packing as pk

    docs = load_table(spark, sf_dir, "documents")
    rows = pk.language_sampling_weights(docs).collect()
    assert abs(sum(r["natural_share"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["resampled_share"] for r in rows) - 1.0) < 1e-9
    smallest = min(rows, key=lambda r: r["n_docs"])
    largest = max(rows, key=lambda r: r["n_docs"])
    if smallest["n_docs"] < largest["n_docs"]:
        assert smallest["doc_weight"] > 1.0 > largest["doc_weight"]


def test_cdc_chunks_stable_under_head_truncation(spark, sf_dir):
    """Content-defined boundaries re-synchronize after an edit: a doc's
    head-truncated copy (dedup_corpus +2M replicas drop the first 5
    tokens) must share every chunk hash from the first common cut point
    on — the property fixed-size windows lack."""
    from iot_temp_data_pipeline_spark.operators import chunking as ck

    corpus = dedup_corpus(spark, sf_dir)
    chunks = ck.chunk_documents(corpus)
    orig = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_hash"]
        for r in chunks.filter(F.col("doc_id") < 1_000_000).collect()
    }
    trunc_rows = chunks.filter(F.col("doc_id") >= 2_000_000).collect()
    assert trunc_rows
    by_doc = {}
    for r in trunc_rows:
        by_doc.setdefault(r["doc_id"] - 2_000_000, []).append(r)
    resynced = 0
    for base_id, rows in by_doc.items():
        orig_hashes = {h for (d, _), h in orig.items() if d == base_id}
        shared = sum(1 for r in rows if r["chunk_hash"] in orig_hashes)
        # all chunks after the first (possibly split) one must re-sync
        if len(rows) > 1 and shared >= len(rows) - 1:
            resynced += 1
    assert resynced >= 0.9 * sum(1 for rows in by_doc.values() if len(rows) > 1)


def test_chunk_bounds_and_coverage(spark, sf_dir):
    from iot_temp_data_pipeline_spark.operators import chunking as ck
    from iot_temp_data_pipeline_spark.functions.text import tokens as tok

    docs = load_table(spark, sf_dir, "documents")
    chunks = ck.chunk_documents(docs)
    rows = chunks.collect()
    assert all(1 <= r["n_tokens"] <= ck.MAX_CHUNK for r in rows)
    # chunks tile each doc exactly: sum of lengths == token count
    per_doc = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tokens"]
    truth = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", F.size(tok(F.col("text"))).alias("n")).collect()
    }
    assert per_doc == truth


def test_pagerank_star_graph_ranks_hub_highest(spark):
    from iot_temp_data_pipeline_spark.operators import graph as gr

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "doc_a long, doc_b long"
    )
    rows = {r["doc_id"]: r for r in gr.pagerank_int(edges).collect()}
    hub, leaves = rows[0], [rows[i] for i in range(1, 9)]
    assert hub["degree"] == 8
    assert all(l["degree"] == 1 for l in leaves)
    assert all(hub["rank_e6"] > l["rank_e6"] for l in leaves)
    # leaves are symmetric — identical ranks
    assert len({l["rank_e6"] for l in leaves}) == 1
    # total mass stays below the undamped total (truncation + damping
    # only ever remove mass) and above the base floor
    total = sum(r["rank_e6"] for r in rows.values())
    n = len(rows)
    assert n * gr.RANK_SCALE * 15 // 100 < total <= n * gr.RANK_SCALE


def test_weighted_sample_prefers_heavy_docs(spark):
    """A-ES property: with weight = token count, a 50x-heavier doc
    population dominates the top-k sample far beyond its count share."""
    light = spark.range(0, 400).selectExpr(
        "id AS doc_id", "'xx' AS lang", "'w' AS text"  # 1 token
    )
    heavy = spark.range(400, 800).selectExpr(
        "id AS doc_id",
        "'xx' AS lang",
        "array_join(array_repeat('w', 50), ' ') AS text",  # 50 tokens
    )
    docs = light.unionByName(heavy)
    got = qa.weighted_sample(docs, k=40)
    rows = got.collect()
    assert len(rows) == 40
    n_heavy = sum(1 for r in rows if r["doc_id"] >= 400)
    # heavy docs hold 50/51 of total weight; even with sampling noise
    # they must dominate a 40-draw (expected ~39)
    assert n_heavy >= 33
    # deterministic: same draw twice
    again = {r["doc_id"] for r in qa.weighted_sample(docs, k=40).collect()}
    assert again == {r["doc_id"] for r in rows}


def test_weighted_sample_fixed_k_per_stratum(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = qa.weighted_sample(docs, k=5)
    per = out.groupBy("lang").count().collect()
    pops = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    for r in per:
        assert r["count"] == min(5, pops[r["lang"]])


def test_weighted_sample_k_exceeds_population(spark):
    docs = spark.range(3).selectExpr(
        "id AS doc_id", "'xx' AS lang", "'a b c' AS text"
    )
    out = qa.weighted_sample(docs, k=10).collect()
    assert len(out) == 3
    assert sorted(r["rank"] for r in out) == [1, 2, 3]


def test_pack_sequences_sharded_invariants(spark, sf_dir):
    from iot_temp_data_pipeline_spark.operators import packing as pk

    docs = load_table(spark, sf_dir, "documents")
    shard_docs = 64
    out = pk.pack_sequences_sharded(docs, shard_docs=shard_docs).collect()
    n_docs = docs.count()
    assert n_docs <= len(out) <= 2 * n_docs
    assert len({r["doc_id"] for r in out}) == n_docs
    ctx = pk.CONTEXT_LEN
    by_bin = {}
    for r in out:
        # shard assignment and globally-unique bin encoding
        assert r["shard_id"] == r["doc_id"] // shard_docs
        assert r["bin_id"] // shard_docs == r["shard_id"]
        assert 0 <= r["offset_in_bin"] < ctx
        assert r["offset_in_bin"] + r["seg_len"] <= ctx
        by_bin.setdefault(r["bin_id"], []).append(r)
    # per shard: segments within a bin are disjoint, bins exactly full
    # except each shard's LAST bin (the per-shard padding trade)
    last_bin_of_shard = {}
    for b in by_bin:
        s = b // shard_docs
        last_bin_of_shard[s] = max(last_bin_of_shard.get(s, -1), b)
    for b, rows in by_bin.items():
        rows.sort(key=lambda x: x["offset_in_bin"])
        pos = 0
        for x in rows:
            assert x["offset_in_bin"] == pos
            pos += x["seg_len"]
        assert pos == ctx or b == last_bin_of_shard[b // shard_docs]
    # a split doc's segments reassemble the doc
    segs = {}
    for r in out:
        segs.setdefault(r["doc_id"], []).append(r)
    for rows in segs.values():
        rows.sort(key=lambda x: x["seg_idx"])
        assert sum(x["seg_len"] for x in rows) == rows[0]["n_tokens"]


def test_pack_sequences_sharded_converges_to_global(spark, sf_dir):
    # with one shard covering the whole corpus, sharded == global
    from iot_temp_data_pipeline_spark.operators import packing as pk

    docs = load_table(spark, sf_dir, "documents")
    glob_rows = {
        (r["doc_id"], r["seg_idx"], r["bin_id"], r["offset_in_bin"], r["seg_len"])
        for r in pk.pack_sequences(docs).collect()
    }
    shard_rows = {
        (r["doc_id"], r["seg_idx"], r["bin_id"], r["offset_in_bin"], r["seg_len"])
        for r in pk.pack_sequences_sharded(docs, shard_docs=1 << 40).collect()
    }
    assert glob_rows == shard_rows


def test_pack_sequences_sharded_plan_has_no_global_sort(spark, sf_dir):
    # the scale property itself: the window exchange must be
    # hashpartitioning(shard_id), never SinglePartition
    from iot_temp_data_pipeline_spark.operators import packing as pk

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        pk.pack_sequences_sharded(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert "hashpartitioning(shard_id" in plan


def test_classifier_quality_scores_mapside_and_discriminates(spark, sf_dir):
    """The hashed-linear-classifier gate must (a) actually split the
    corpus (a threshold that keeps or drops everything is a no-op
    filter), and (b) score without any corpus-sized shuffle: no
    Generate/explode, and the only exchange is the final
    (source, lang) aggregate."""
    from iot_temp_data_pipeline_spark.operators import quality as qa

    docs = load_table(spark, sf_dir, "documents")
    df = qa.classifier_quality(docs)
    rows = df.collect()
    n_docs = sum(r["n_docs"] for r in rows)
    n_kept = sum(r["n_kept"] for r in rows)
    assert 0 < n_kept < n_docs
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert 0 <= r["kept_permille"] <= 1000

    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE prints the plan twice
    assert "Generate" not in plan  # no explode: F.aggregate scores in place
    assert plan.count("Exchange hashpartitioning") == 1  # only the group agg
    assert "hashpartitioning(source" in plan


def test_corpus_shuffle_manifest_is_permutation_without_global_sort(spark, sf_dir):
    """Dataloader-shuffle contract: every doc appears exactly once,
    positions are contiguous 1..n within each shard, a different seed
    produces a different permutation, and the plan decomposes into
    per-shard sorts (no SinglePartition)."""
    from iot_temp_data_pipeline_spark.operators import packing as pk

    docs = load_table(spark, sf_dir, "documents")
    df = pk.corpus_shuffle_manifest(docs)
    rows = df.collect()
    assert len(rows) == docs.count()
    assert len({r["doc_id"] for r in rows}) == len(rows)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r["shard_pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard

    reshuffled = {
        r["doc_id"]: (r["shard_id"], r["shard_pos"])
        for r in pk.corpus_shuffle_manifest(docs, seed=pk.SHUFFLE_SEED + 1).collect()
    }
    orig = {r["doc_id"]: (r["shard_id"], r["shard_pos"]) for r in rows}
    assert orig != reshuffled  # epoch reshuffle actually permutes

    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "SinglePartition" not in plan
    assert "hashpartitioning(shard_id" in plan


def test_incremental_dedup_flags_replicas_against_history(spark, sf_dir):
    """The fixture's +1M exact replicas and +2M truncated replicas land
    on both sides of the increment/history split, so the increment must
    contain exact_dup verdicts (replica whose original is history),
    near_dup verdicts (truncated replica of a history doc), and kept
    docs — and every exact verdict must out-rank near (an exact match
    is never reported as merely near)."""
    from iot_temp_data_pipeline_spark.operators import dedup as dd

    out = {
        r["doc_id"]: r
        for r in dd.incremental_dedup(dd.dedup_corpus(spark, sf_dir)).collect()
    }
    verdicts = {r["verdict"] for r in out.values()}
    assert verdicts == {"exact_dup", "near_dup", "kept"}
    for r in out.values():
        if r["n_exact_matches"] > 0:
            assert r["verdict"] == "exact_dup"
        if r["verdict"] == "near_dup":
            assert r["max_est_permille"] >= dd.NEAR_MIN_PERMILLE
        if r["verdict"] == "kept":
            assert r["n_exact_matches"] == 0 and r["n_near_candidates"] == 0
    # an exact +1M replica of a history original: original doc d with
    # d % 3 != 0 and (d + 1_000_000) % 3 == 0 and d % 7 == 0
    probe = [
        i for i in out
        if 1_000_000 <= i < 2_000_000 and (i - 1_000_000) % 3 != 0
    ]
    assert probe and all(out[i]["verdict"] == "exact_dup" for i in probe)


def test_filter_funnel_is_monotone_and_chains(spark, sf_dir):
    """Funnel invariants: stage N's docs_in equals stage N-1's
    docs_out, every stage is non-increasing, every stage drops at
    least one doc on the replica-spiked fixture (each gate is doing
    real work), and docs_dropped is consistent."""
    from iot_temp_data_pipeline_spark.operators import dedup as dd
    from iot_temp_data_pipeline_spark.operators import quality as qa

    rows = sorted(
        qa.filter_funnel(dd.dedup_corpus(spark, sf_dir)).collect(),
        key=lambda r: r["stage_idx"],
    )
    assert [r["stage"] for r in rows] == [
        "length_shape", "repetition", "classifier", "exact_dedup",
    ]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["docs_in"] == prev["docs_out"]
    for r in rows:
        assert 0 <= r["docs_out"] <= r["docs_in"]
        assert r["docs_dropped"] == r["docs_in"] - r["docs_out"]
        assert r["docs_dropped"] > 0


def test_mmr_selection_is_more_diverse_than_pure_topk(spark, sf_dir):
    """MMR's reason to exist, asserted: among the same candidate pool,
    the MMR-selected set's worst-case internal similarity is no higher
    than the pure-relevance top-k's — and the first pick is exactly the
    relevance argmax."""
    from iot_temp_data_pipeline_spark.operators import similarity as sim

    rows = sorted(
        sim.mmr_diverse_topk(spark, sf_dir).collect(), key=lambda r: r["rank"]
    )
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 5

    emb = sim._with_quantized(load_table(spark, sf_dir, "embeddings"))
    vecs = {
        r["vec_id"]: (r["qvec"], r["qnorm2"])
        for r in emb.collect()
    }
    import math

    def cos(i, j):
        (va, na), (vb, nb) = vecs[i], vecs[j]
        return sum(x * y for x, y in zip(va, vb)) / math.sqrt(na) / math.sqrt(nb)

    q = sim.MMR_QUERY_ID
    pool = sorted(
        (i for i in vecs if i != q), key=lambda i: (-cos(q, i), i)
    )[: sim.MMR_POOL]
    topk = pool[: sim.MMR_K]
    assert ids[0] == topk[0]  # rank 1 is the relevance argmax

    def worst_internal(sel):
        return max(cos(i, j) for i in sel for j in sel if i != j)

    assert worst_internal(ids) <= worst_internal(topk) + 1e-12


def test_hrw_resharding_moves_roughly_one_shard_share(spark, sf_dir):
    """The consistent-hashing guarantee, measured: growing 64 -> 65
    shards under rendezvous hashing moves ~1/65 of docs (binomial
    around 15 permille), while mod placement moves nearly everything
    (~64/65). Bounds are loose enough for the 500-doc fixture."""
    from iot_temp_data_pipeline_spark.operators import packing as pk

    rows = {
        r["method"]: r
        for r in pk.reshard_stability(load_table(spark, sf_dir, "documents")).collect()
    }
    assert rows["hrw"]["moved_permille"] <= 40
    assert rows["mod"]["moved_permille"] >= 900
    assert rows["hrw"]["n_moved"] < rows["mod"]["n_moved"]


def test_rank_fusion_midrank_neutral_and_oriented(spark):
    """Percentile-rank fusion contract on crafted docs: (a) midrank
    convention — when every doc ties on a signal, that signal
    contributes ~500 (neutral), not 1000; (b) orientation — a heavily
    repetitive doc must blend strictly below a clean doc with the same
    token vocabulary size."""
    clean = " ".join(f"w{i}" for i in range(60))
    loop = ("spam ham " * 40).strip()
    out = {
        r["source"]: r
        for r in qa.quality_rank_fusion(
            _docs(spark, [(1, clean, "clean"), (2, loop, "loopy")])
        ).collect()
    }
    # the repetitive source is gated out; the clean one survives
    assert out["loopy"]["mean_blend_permille"] < out["clean"]["mean_blend_permille"]
    assert out["loopy"]["n_above_gate"] == 0
    # ranks live on a permille scale and a 2-doc corpus can't saturate
    assert 0 <= out["clean"]["mean_blend_permille"] <= 1000
