"""Property-based tests (hypothesis): the distributed operators must
agree with trivially-correct single-process reference implementations
on arbitrary small inputs — the class of bug (boundary, tie, empty
group, single element) that fixture-based tests miss.

Examples are capped low because each one runs real Spark jobs; the
point is randomized structure, not volume.
"""

from __future__ import annotations

import math
import statistics

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iot_temp_data_pipeline_spark.functions.skew import salted_aggregate
from iot_temp_data_pipeline_spark.functions.stats import exact_avg, exact_stddev
from iot_temp_data_pipeline_spark.operators.asof import asof_join
from iot_temp_data_pipeline_spark.operators.dedup import connected_components

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@_SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=20,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(df).collect()
    }
    want = set(_union_find_components(edges).items())
    assert got == want


@_SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(-1000, 1000)),
        min_size=1,
        max_size=40,
    ),
    st.integers(2, 5),
)
def test_salted_aggregate_equals_plain_groupby(spark, rows, n_salts):
    df = spark.createDataFrame(rows, "k long, v long")
    salted = salted_aggregate(
        df,
        "k",
        n_salts,
        partial_aggs={"s": F.sum("v"), "c": F.count("*"), "m": F.max("v")},
        final_aggs={
            "s": F.sum("s"),
            "c": F.sum("c"),
            "m": F.max("m"),
        },
    )
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count("*").alias("c"), F.max("v").alias("m")
    )
    assert {tuple(r) for r in salted.collect()} == {
        tuple(r) for r in plain.collect()
    }


def _ref_asof_backward(left, right):
    out = {}
    for lid, k, lts in left:
        best = None
        for rid, rk, rts in right:
            if rk == k and rts <= lts:
                if best is None or (rts, rid) > (best[2], best[0]):
                    best = (rid, rk, rts)
        out[lid] = best[0] if best else None
    return out


@_SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 99), st.integers(0, 2), st.integers(0, 50)),
        min_size=1,
        max_size=15,
        unique_by=lambda r: r[0],
    ),
    st.lists(
        st.tuples(st.integers(100, 199), st.integers(0, 2), st.integers(0, 50)),
        min_size=1,
        max_size=15,
        unique_by=lambda r: r[0],
    ),
)
def test_asof_backward_matches_reference(spark, lrows, rrows):
    left = spark.createDataFrame(lrows, "lid long, k long, ts long")
    right = spark.createDataFrame(rrows, "rid long, k long, ts long")
    got = {
        r["lid"]: r["r_rid"]
        for r in asof_join(
            left, right, on=["k"], ts="ts", tie="rid", direction="backward"
        ).collect()
    }
    assert got == _ref_asof_backward(lrows, rrows)


@_SETTINGS
@given(
    st.lists(
        st.integers(-10000, 10000).map(lambda c: c / 100.0),
        min_size=2,
        max_size=30,
    )
)
def test_exact_stats_match_python_statistics(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v double")
    row = df.agg(
        exact_avg(F.col("v")).alias("a"), exact_stddev(F.col("v")).alias("s")
    ).first()
    assert math.isclose(row["a"], statistics.fmean(values), abs_tol=1e-9)
    assert math.isclose(row["s"], statistics.stdev(values), rel_tol=1e-9, abs_tol=1e-9)


def _ref_point_in_interval(points, intervals):
    out = set()
    for pid, pk, pts_ in points:
        for iid, ik, s, e in intervals:
            if pk == ik and s <= pts_ < e:
                out.add((pid, iid))
    return out


@_SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 99), st.integers(0, 2), st.integers(0, 100)),
        min_size=1,
        max_size=12,
        unique_by=lambda r: r[0],
    ),
    st.lists(
        st.tuples(
            st.integers(100, 199),
            st.integers(0, 2),
            st.integers(0, 90),
            st.integers(1, 40),
        ).map(lambda r: (r[0], r[1], r[2], r[2] + r[3])),
        min_size=1,
        max_size=12,
        unique_by=lambda r: r[0],
    ),
    st.sampled_from([1, 7, 16]),
)
def test_range_join_matches_brute_force(spark, points, intervals, bucket_width):
    from iot_temp_data_pipeline_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    p = spark.createDataFrame(points, "pid long, k long, pts long")
    i = spark.createDataFrame(intervals, "iid long, k long, s long, e long")
    got = {
        (r["pid"], r["iid"])
        for r in point_in_interval_join(
            p, i, on=["k"], point_ts="pts", start="s", end="e", bucket_width=bucket_width
        ).collect()
    }
    assert got == _ref_point_in_interval(points, intervals)


def test_lsh_fixture_dim_contract(spark, sf_dir):
    """knn_lsh inlines EMB_DIM-length hyperplane literals into both the
    Spark plan and the oracle SQL; the fixture must actually be that
    wide, or bucket bits would silently ignore trailing dims."""
    from pyspark.sql import functions as F

    from iot_temp_data_pipeline_spark.operators.similarity import EMB_DIM
    from iot_temp_data_pipeline_spark.sources.catalog import load_table

    dims = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.size("embedding").alias("d"))
        .distinct()
        .collect()
    )
    assert [r["d"] for r in dims] == [EMB_DIM]


_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@_SETTINGS
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=200),
        min_size=1,
        max_size=8,
    )
)
def test_cdc_chunks_tile_every_document(spark, token_lists):
    """Chunks tile each doc exactly (lengths sum to token count, starts
    are the running prefix, every chunk within the MAX_CHUNK bound) for
    ARBITRARY token content — including hash-pathological repeats."""
    from iot_temp_data_pipeline_spark.operators import chunking as ck

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        ck.chunk_documents(docs).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, toks in enumerate(rows):
        doc_id, text = toks
        n = len(text.split(" "))
        chunks = by_doc[doc_id]
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        assert all(1 <= c["n_tokens"] <= ck.MAX_CHUNK for c in chunks)
        assert sum(c["n_tokens"] for c in chunks) == n
        pos = 1
        for c in chunks:
            assert c["start_tok"] == pos
            pos += c["n_tokens"]


@_SETTINGS
@given(
    st.lists(st.integers(1, 700), min_size=1, max_size=30),
    st.integers(8, 64),
)
def test_grid_packing_invariants(spark, lens, ctx):
    """Grid packing invariants hold for arbitrary doc lengths and
    context sizes: clipped lengths, disjoint in-bin segments, every
    bin except the last exactly full."""
    from iot_temp_data_pipeline_spark.operators import packing as pk

    rows = [(i, " ".join("w" for _ in range(n))) for i, n in enumerate(lens)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pk.pack_sequences(docs, context_len=ctx).collect()
    assert len(lens) <= len(out) <= 2 * len(lens)
    total = sum(min(n, ctx) for n in lens)
    by_bin: dict[int, list] = {}
    for r in out:
        assert 0 < r["n_tokens"] <= ctx
        assert 0 <= r["offset_in_bin"] < ctx
        assert 0 < r["seg_len"] <= r["n_tokens"]
        assert r["offset_in_bin"] + r["seg_len"] <= ctx
        by_bin.setdefault(r["bin_id"], []).append(r)
    assert sum(x["seg_len"] for rows_ in by_bin.values() for x in rows_) == total
    last_bin = max(by_bin)
    for b, rows_ in by_bin.items():
        rows_.sort(key=lambda x: x["offset_in_bin"])
        pos = 0
        for x in rows_:
            assert x["offset_in_bin"] == pos
            pos += x["seg_len"]
        assert pos == ctx or b == last_bin


def _py_bpe_merge(sym, a, b):
    out: list[str] = []
    for x in sym:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


@_SETTINGS
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "ab"]), min_size=1, max_size=8),
        min_size=1,
        max_size=5,
    ),
    st.sampled_from([("a", "b"), ("a", "a"), ("b", "c"), ("ab", "a"), ("c", "ab")]),
)
def test_bpe_fold_matches_reference(spark, seqs, pair):
    """The column-expression greedy merge fold must agree with the
    obvious single-pass Python reference on arbitrary symbol chains —
    including self-pairs ('a','a') and merged-symbol collisions."""
    from iot_temp_data_pipeline_spark.operators.bpe import _fold_merge

    a, b = pair
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(seqs)], "i long, sym array<string>"
    )
    got = {
        r["i"]: r["m"]
        for r in df.select("i", F.split(_fold_merge(a, b), " ").alias("m")).collect()
    }
    for i, s in enumerate(seqs):
        assert got[i] == _py_bpe_merge(s, a, b), (s, a, b)


def _py_substring_spans(docs_tokens, w):
    from collections import Counter

    grams: Counter = Counter()
    for toks in docs_tokens.values():
        for i in range(len(toks) - w + 1):
            grams[tuple(toks[i : i + w])] += 1
    out = {}
    for d, toks in docs_tokens.items():
        hits = [
            i
            for i in range(len(toks) - w + 1)
            if grams[tuple(toks[i : i + w])] >= 2
        ]
        spans: list[list[int]] = []
        for p in hits:
            if spans and p <= spans[-1][1] + w:  # overlap or adjacency
                spans[-1][1] = p
            else:
                spans.append([p, p])
        if spans:
            out[d] = (len(spans), sum(e + w - s for s, e in spans))
    return out


@_SETTINGS
@given(
    st.dictionaries(
        st.integers(0, 4),
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=12),
        min_size=1,
        max_size=5,
    )
)
def test_exact_substring_spans_match_reference(spark, docs_tokens):
    """Window hits + gaps-and-islands merging must agree with a naive
    reference over random tiny-alphabet corpora (dense with repeats —
    exactly the overlap/adjacency boundary cases)."""
    from iot_temp_data_pipeline_spark.operators.dedup import exact_substring_spans

    w = 3
    rows = [(d, " ".join(toks)) for d, toks in docs_tokens.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["repeated_tokens"])
        for r in exact_substring_spans(df, window=w).collect()
    }
    assert got == _py_substring_spans(docs_tokens, w)


def _brute_triangles(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in es for n in e})
    from collections import defaultdict

    count = defaultdict(int)
    import itertools

    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            count[a] += 1
            count[b] += 1
            count[c] += 1
    return dict(count)


@_SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 10), st.integers(0, 10)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=25,
    )
)
def test_triangle_count_matches_brute_force(spark, edges):
    from iot_temp_data_pipeline_spark.operators.graph import triangle_count

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == _brute_triangles(edges)


def _brute_merge(intervals):
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
            out[-1][2] += 1
        else:
            out.append([s, e, 1])
    return [(s, e, n) for s, e, n in out]


@_SETTINGS
@given(
    st.lists(st.integers(0, 400), min_size=1, max_size=30)
)
def test_interval_merge_matches_brute_force(spark, starts):
    """Islands from the windowed prefix-max must equal a sequential
    sweep merge of the same ±30 s intervals (single synthetic user)."""
    from iot_temp_data_pipeline_spark.plans.timeseries import INTERVAL_PAD_S

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(1, s - INTERVAL_PAD_S, s + INTERVAL_PAD_S) for s in starts]
    df = spark.createDataFrame(rows, "user_id long, start_s long, end_s long")
    w = Window.partitionBy("user_id").orderBy("start_s", "end_s")
    prev_max = F.max("end_s").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.withColumn(
        "ni",
        F.when(prev_max.isNull() | (F.col("start_s") > prev_max), 1)
        .otherwise(0)
        .cast("long"),
    ).withColumn(
        "island", F.sum("ni").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    got = sorted(
        (r["s"], r["e"], r["n"])
        for r in flagged.groupBy("island")
        .agg(
            F.min("start_s").alias("s"),
            F.max("end_s").alias("e"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    want = _brute_merge([(s - INTERVAL_PAD_S, s + INTERVAL_PAD_S) for s in starts])
    assert got == want


def _py_apply_removal(docs_tokens, w):
    from collections import Counter
    import hashlib

    grams: Counter = Counter()
    for toks in docs_tokens.values():
        for i in range(len(toks) - w + 1):
            grams[tuple(toks[i : i + w])] += 1
    out = {}
    for d, toks in docs_tokens.items():
        hits = [
            i
            for i in range(len(toks) - w + 1)
            if grams[tuple(toks[i : i + w])] >= 2
        ]
        covered = set()
        for p in hits:
            covered.update(range(p, p + w))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out[d] = (
            len(toks),
            len(toks) - len(kept),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


@_SETTINGS
@given(
    st.dictionaries(
        st.integers(0, 4),
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=12),
        min_size=1,
        max_size=5,
    )
)
def test_apply_substring_removal_matches_reference(spark, docs_tokens):
    """The REWRITE stage (cut every repeated span, md5 the survivors)
    must agree with a naive per-position reference on the same dense
    tiny-alphabet corpora as the span report — including fully-removed
    docs (md5 of the empty string) and overlap-merge boundaries."""
    from iot_temp_data_pipeline_spark.operators.dedup import (
        apply_substring_removal,
    )

    w = 3
    rows = [(d, " ".join(toks)) for d, toks in docs_tokens.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["removed_tokens"],
            r["kept_tokens"],
            r["cleaned_md5"],
        )
        for r in apply_substring_removal(df, window=w).collect()
    }
    assert got == _py_apply_removal(docs_tokens, w)


def _py_vocab_coverage(docs_tokens, orders, sizes):
    from collections import Counter

    out = {}
    for n in orders:
        counts: Counter = Counter()
        for toks in docs_tokens.values():
            if n == 1:
                counts.update(toks)
            else:
                counts.update(
                    " ".join(toks[i : i + n])
                    for i in range(len(toks) - n + 1)
                )
        if not counts:
            continue  # no n-grams of this order anywhere -> no rows
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        total = sum(counts.values())
        for v in sizes:
            top = ranked[:v]
            covered = sum(c for _, c in top)
            out[(n, v)] = (
                len(top),
                covered,
                total,
                (1_000_000 * covered) // total,
                1_000_000 - (1_000_000 * covered) // total,
            )
    return out


@_SETTINGS
@given(
    st.dictionaries(
        st.integers(0, 4),
        st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=10),
        min_size=1,
        max_size=5,
    )
)
def test_vocab_coverage_matches_reference(spark, docs_tokens):
    """Coverage curve vs a Counter-based reference: exercises frequency
    ties at the truncation boundary (tiny alphabet -> many equal counts,
    resolved by term order), V larger than the vocabulary, and orders
    with no n-grams at all (single-token docs)."""
    from iot_temp_data_pipeline_spark.operators.text_analysis import (
        vocab_coverage_curve,
    )

    orders, sizes = (1, 2), (2, 5)
    rows = [(d, " ".join(toks)) for d, toks in docs_tokens.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["n"], r["vocab_size"]): (
            r["vocab_terms"],
            r["covered_tokens"],
            r["total_tokens"],
            r["coverage_ppm"],
            r["oov_ppm"],
        )
        for r in vocab_coverage_curve(df, orders=orders, sizes=sizes).collect()
    }
    assert got == _py_vocab_coverage(docs_tokens, orders, sizes)


# ---------------------------------------- prefix-filter SSJoin losslessness


def _py_jaccard_pairs(docs, n=3, num=3, den=5):
    """Trivially-correct all-pairs reference: distinct word n-grams,
    exact-rational threshold den·common ≥ num·union."""
    sets = {}
    for doc_id, toks in docs:
        sets[doc_id] = {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            c = len(sa & sb)
            u = len(sa) + len(sb) - c
            if den * c >= num * u:
                out[(a, b)] = (c, len(sa), len(sb))
    return out


@_SETTINGS
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=1,
            max_size=12,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_prefix_filter_join_lossless_on_random_corpora(spark, token_lists):
    """The prefix+length+positional filter stack must be LOSSLESS: on
    arbitrary tiny-vocabulary corpora (the adversarial near-similar
    case) the join's pair set equals the brute-force all-pairs result,
    including θ-boundary pairs where den·common == num·union exactly."""
    from iot_temp_data_pipeline_spark.operators.dedup import (
        jaccard_prefix_filter_pairs,
    )

    docs = [(i, toks) for i, toks in enumerate(token_lists)]
    corpus = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["common_shingles"],
            r["shingles_a"],
            r["shingles_b"],
        )
        for r in jaccard_prefix_filter_pairs(corpus).collect()
    }
    assert got == _py_jaccard_pairs(docs)


# ------------------------- round-10 properties: winnowing + UniMax


def _py_winnow(tokens_list, w=4, seed=31):
    """Single-process reference winnowing: hash 3-grams with the same
    portable md5 scheme, slide a w-window, keep the min with
    rightmost-tie (robust winnowing), return the distinct
    (hash, pos) set."""
    import hashlib

    grams = [
        " ".join(tokens_list[i : i + 3]) for i in range(len(tokens_list) - 2)
    ]
    hs = [
        int(hashlib.md5(f"{seed}:{g}".encode()).hexdigest()[:8], 16)
        for g in grams
    ]
    out = set()
    for end in range(w - 1, len(hs)):
        best_pos, best_h = None, None
        for p in range(end - w + 1, end + 1):  # rightmost min: <= update
            if best_h is None or hs[p] <= best_h:
                best_h, best_pos = hs[p], p
        out.add((best_h, best_pos))
    return out


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "ee"]), min_size=0, max_size=24
        ),
        min_size=1,
        max_size=5,
    )
)
@_SETTINGS
def test_winnowing_matches_reference(spark, docs_tokens):
    """The zero-exchange array-native build must reproduce the
    single-process robust-winnowing reference exactly — including the
    rightmost-min tie rule on repeated-token docs (ties everywhere)."""
    from iot_temp_data_pipeline_spark.operators.text_analysis import (
        winnowing_fingerprints,
    )

    rows = [(i, " ".join(tks)) for i, tks in enumerate(docs_tokens)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["fp_hash"], r["fp_pos"])
        for r in winnowing_fingerprints(docs).collect()
    }
    # empty docs tokenize to [''] on both sides — reference must match
    want = set()
    for i, tks in enumerate(docs_tokens):
        text = " ".join(tks)
        toks = text.lower().split(" ") if text else [""]
        for h, p in _py_winnow(toks):
            want.add((i, h, p))
    assert got == want


@given(
    st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=8)
)
@_SETTINGS
def test_unimax_matches_reference(spark, sizes):
    """UniMax allocation must equal the single-process waterfilling
    reference: Σ = min(B, Σcap), alloc ≤ cap, uniform level for the
    uncapped set with Hamilton-style +1 remainders."""
    from iot_temp_data_pipeline_spark.operators.mixture import (
        mixture_unimax_allocation,
    )

    rows = [
        (i, " ".join(["w"] * n), f"s{i:02d}") for i, n in enumerate(sizes)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["source"]: r["allocated_tokens"]
        for r in mixture_unimax_allocation(docs).collect()
    }
    caps = sorted(
        ((4 * n, f"s{i:02d}") for i, n in enumerate(sizes)),
    )
    budget = sum(sizes) // 2
    n_src = len(sizes)
    alloc = {}
    spent = 0
    remaining = list(caps)
    # waterfill ascending by cap
    for idx, (cap, name) in enumerate(caps):
        if cap * (n_src - idx) <= budget - spent:
            alloc[name] = cap
            spent += cap
        else:
            unc = caps[idx:]
            level, rem = divmod(budget - spent, len(unc))
            for j, (_, nm) in enumerate(unc):
                alloc[nm] = level + (1 if j < rem else 0)
            break
    assert got == alloc
    assert sum(got.values()) == min(budget, sum(c for c, _ in caps))
