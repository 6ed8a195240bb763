"""Similarity search over embedding columns (beyond-reference surface).

Vectors are `array<float>`. Scoring math has two physical forms, chosen
cost-based from the corpus count (the same plan-time statistic that
sizes the centroid set): at small N·C/N·Q, Catalyst higher-order
functions (zip_with/aggregate/transform — JVM-side, no Python stage);
at scale, Arrow-batched integer GEMM kernels (mapInPandas, broadcast
matrices, zero shuffle) — bit-identical rows either way, since both
compute the same exact int64 dot products in the same IEEE operation
order. Two search paths:

- brute-force top-k: exact baseline; Q broadcast queries × N corpus scan,
  per-query heap via window rank. Cost O(Q·N) — right answer for small Q
  or as the recall reference.
- IVF (inverted file): coarse centroids → one assignment pass (each
  vector to its nearest centroid, broadcast centroids) → queries search
  only their own cell. At 100 TB: cells are written bucketed/partitioned
  by cell_id, so a query touches 1/C of the data; recall is traded via
  n_probe (here 1, the classic IVF-flat shape).

**Quantized cosine**: scores use integer-quantized vectors
(round(x·10⁶) per dim). Integer dot products and norms are exact and
order-independent, so scores are bit-identical with the DuckDB oracle —
double-fold cosines differ in the last ulp between engines, which would
make top-k cutoffs nondeterministic. Quantization error (~1e-6 relative)
is far below any meaningful similarity resolution.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

QUANT_SCALE = 1_000_000
MIN_CENTROID_MOD = 37

# N·Q scored-pair count above which brute-force ground truth switches
# from the Catalyst crossJoin+window form (shuffles all N·Q scored rows)
# to the per-partition GEMM + distributive partial top-k form (shuffles
# #partitions·Q·(k+1) rows). sf0.1 (3 k × 30 = 90 k pairs) stays
# Catalyst; the 30x probe (90 k × 900 = 81 M pairs) takes the kernel.
BRUTE_MATMUL_MIN_PAIRS = 2_000_000

# Corpus size above which the IVF assignment switches from the pure
# Catalyst crossJoin+max_by form to the Arrow-batched matmul kernel.
# The N·C fold work grows as N^1.5 while the Python stage costs a fixed
# ~0.3 s; measured crossover is between 3 k (HOF 0.94 s vs 1.27 s) and
# 90 k vectors (HOF 9.6 s vs matmul 3.1 s) on local[32].
MATMUL_ASSIGN_MIN_N = 20_000


def adaptive_centroid_mod(n_vectors: int) -> int:
    """Centroid count ~ sqrt(N): a FIXED selection rate makes the
    centroid set grow linearly with the corpus, turning the O(N*C)
    assignment pass quadratic (the 10x scale probe measured 11.4x).
    mod = max(37, isqrt(N)) gives C = N/mod ~ sqrt(N), so assignment
    work is O(N^1.5) - the classic IVF sizing rule."""
    return max(MIN_CENTROID_MOD, math.isqrt(n_vectors))


# SQL twin of the adaptive mod (FLOOR(SQRT) == isqrt in this range)
ADAPTIVE_MOD_SQL = (
    "(SELECT GREATEST(37, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) FROM qnormed)"
)


def quantize(vec: Column) -> Column:
    return F.transform(
        vec.cast("array<double>"),
        lambda x: F.round(x * QUANT_SCALE).cast("long"),
    )


def qdot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def qnorm2(a: Column) -> Column:
    return qdot(a, a)


def qcosine(a: Column, b: Column, norm2_a: Column, norm2_b: Column) -> Column:
    """cos = dot / sqrt(|a|²) / sqrt(|b|²), all from exact integers."""
    return (
        qdot(a, b).cast("double")
        / F.sqrt(norm2_a.cast("double"))
        / F.sqrt(norm2_b.cast("double"))
    )


def _with_quantized(emb: DataFrame) -> DataFrame:
    q = quantize(F.col("embedding"))
    return emb.select("vec_id", "label", q.alias("qvec")).withColumn(
        "qnorm2", qnorm2(F.col("qvec"))
    )


def quantized_corpus(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, int]:
    """(quantized+normed embeddings, row count), materialized ONCE per
    session and sf_dir. Every ANN entry point starts by quantizing and
    norming the same immutable embedding table; recomputing that per
    query (and re-counting for the cost-based strategy picks) is the
    per-query analog of rebuilding an index per SELECT. The vector-DB
    shape is build-once/serve-many — FAISS ``train()+add()`` runs once,
    then queries reuse the structure — so this caches the quantized
    corpus as a ``localCheckpoint`` (survives ``catalog.clearCache()``,
    which only drops SQL-cached relations) keyed by sf_dir, plus its
    count (a table statistic, the ANALYZE analog). At 100 TB the
    checkpoint becomes a written index/table — same lifecycle, storage
    instead of block manager. Deterministic derivation, so cold- and
    warm-cache results are identical (the parity suite runs both)."""
    from ..sources.catalog import session_cache

    cache = session_cache(spark, "_sg_ann_corpus_cache")
    key = os.path.abspath(sf_dir)
    hit = cache.get(key)
    if hit is None:
        df = _with_quantized(
            load_table(spark, sf_dir, "embeddings")
        ).localCheckpoint(eager=True)
        hit = (df, df.count())
        cache[key] = hit
    return hit


# SQL twins ------------------------------------------------------------

QUANT_SQL = f"""
qembeddings AS (
    SELECT vec_id, label,
        list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(ROUND(x * {QUANT_SCALE}) AS BIGINT)) AS qvec
    FROM embeddings
),
qnormed AS (
    SELECT vec_id, label, qvec,
        list_sum(list_transform(generate_series(1, len(qvec)), i -> qvec[i] * qvec[i]))
            AS qnorm2
    FROM qembeddings
)
"""

def sql_qcos(vec_a: str, vec_b: str, n2_a: str, n2_b: str) -> str:
    """DuckDB text twin of :func:`qcosine` over arbitrary column refs."""
    return (
        f"CAST(list_sum(list_transform(generate_series(1, len({vec_a})),"
        f" i -> {vec_a}[i] * {vec_b}[i])) AS DOUBLE)"
        f" / sqrt(CAST({n2_a} AS DOUBLE)) / sqrt(CAST({n2_b} AS DOUBLE))"
    )


# ----------------------------------------------------------- brute force

# Largest magnitude a float64 holds exactly; integer dot products whose
# worst-case |value| stays below this are EXACT in f64 regardless of
# accumulation order (every partial sum is an integer < 2^53, and FMA /
# blocked BLAS reorderings of exact integers stay exact).
EXACT_F64_DOT_BOUND = float(2**53)

# Query-tile width for the matmul kernels: bounds each task's cosine
# block at B×MATMUL_Q_CHUNK doubles regardless of query-set size
# (catch #9 — a B×Q block at Q=2000 was ~160 MB/task and GC-thrashed
# the grown-Q 100× probe). Selection is per-query, so tiling is
# result-neutral.
MATMUL_Q_CHUNK = 256


def _exact_f64_matmul(x, q, np):
    """x (B×D int64) @ q.T (Q×D int64) with EXACT integer results, via
    float64 BLAS when the worst-case dot magnitude provably fits 2^53 —
    numpy has no BLAS path for int64 (the int64 @ falls back to naive
    loops, ~20× slower at GEMM shapes); f64 dgemm gives the same exact
    integers under the bound. Falls back to int64 matmul (still exact,
    just slow) if the conservative bound is exceeded."""
    bound = (
        float(np.abs(x).max(initial=0)) * float(np.abs(q).max(initial=0)) * x.shape[1]
    )
    if bound < EXACT_F64_DOT_BOUND:
        return x.astype(np.float64) @ q.astype(np.float64).T
    return (x @ q.T).astype(np.float64)



def knn_brute_force(
    spark: SparkSession,
    sf_dir: str,
    query_mod: int = 100,
    k: int = 5,
    strategy: str = "auto",
) -> DataFrame:
    """Exact top-k cosine neighbors for query vectors (vec_id % query_mod
    == 0), self-matches excluded. Deterministic cutoff: rank over
    (score DESC, neighbor id).

    Broadcast bound: the query side is |corpus|/query_mod vectors and is
    broadcast (or collected, matmul path), so this operator assumes the
    QUERY SET fits in executor memory (e.g. ≤ a few hundred MB of
    vectors). That is the contract of brute-force ground truth — a
    corpus-sized query set must instead go through the IVF/LSH paths,
    which shuffle-join on bucket keys.

    ``strategy`` picks the physical form (both bit-identical):
    "catalyst" (crossJoin + window — no Python stage, wins while N·Q is
    small), "matmul" (per-partition GEMM + distributive partial top-k,
    see knn_brute_force_matmul — the scale shape), or "auto" (cost-based
    on N·Q, the same plan-time statistic style as the IVF assignment)."""
    emb, n = quantized_corpus(spark, sf_dir)
    if strategy == "auto":
        strategy = "matmul" if n * (n // query_mod) >= BRUTE_MATMUL_MIN_PAIRS else "catalyst"
    if strategy == "matmul":
        return knn_brute_force_matmul(emb, query_mod, k)
    q = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("qnorm2").alias("q_qnorm2"),
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            qcosine(
                F.col("q_qvec"), F.col("qvec"), F.col("q_qnorm2"), F.col("qnorm2")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ground_truth_topk(
    spark: SparkSession,
    sf_dir: str,
    query_mod: int = 100,
    k: int = 5,
) -> DataFrame:
    """Session-cached EXACT top-k ground truth — the eval baseline
    every recall/nDCG check compares an approximate index against.
    Ground truth is an index-shaped artifact (build-once/serve-many,
    the quantized_corpus rule applied to eval baselines — VERDICT r6
    #2): ann/pq/sq8/jl recall checks all need the same exact top-k, so
    rebuilding the brute-force scan inside each eval re-pays the most
    expensive job in the family once per metric. Keyed by every
    parameter that shapes the result; deterministic derivation, so
    cold and warm caches agree (the DuckDB oracles rebuild from
    scratch every run and still hash-match)."""
    from ..sources.catalog import session_cache

    cache = session_cache(spark, "_sg_ann_ground_truth")
    key = (os.path.abspath(sf_dir), query_mod, k)
    hit = cache.get(key)
    if hit is None:
        hit = knn_brute_force(spark, sf_dir, query_mod, k).localCheckpoint(
            eager=True
        )
        cache[key] = hit
    return hit


def knn_brute_force_matmul(
    emb: DataFrame, query_mod: int = 100, k: int = 5
) -> DataFrame:
    """Large-N physical strategy for :func:`knn_brute_force`: the query
    matrix is collected once (same fits-in-memory contract as the
    broadcast form) and each corpus partition computes its scores as ONE
    integer GEMM per Arrow batch, emitting only its per-batch top-(k+1)
    candidates per query. The final exact top-k window then ranks
    #partitions·Q·(k+1) rows instead of shuffling all N·Q scored pairs —
    the distributive-top-k shape that makes exact ground truth feasible
    on a big corpus. Bit-identical to the Catalyst form: exact int64
    dots, the same IEEE operation order (dot / sqrt(q_norm) /
    sqrt(corpus_norm)), and per-batch selection under the same strict
    total order (cosine DESC, neighbor_id ASC) that ranks the final
    window, so partial top-k loses nothing."""
    import numpy as np

    q_rows = (
        emb.filter(F.col("vec_id") % query_mod == 0)
        .select("vec_id", "qvec", "qnorm2")
        .collect()
    )
    if not q_rows:
        # Empty query set: np.array([]) would build a 1-D (0,)-shaped
        # qmat and fail the worker-side GEMM; the Catalyst path returns
        # empty cleanly, so mirror it (same guard as sq8.knn_sq8_matmul).
        return emb.sparkSession.createDataFrame(
            [],
            schema="query_id long, neighbor_id long, neighbor_label int,"
            " cosine double, rank long",
        )
    qmat = np.array([r["qvec"] for r in q_rows], dtype=np.int64)
    qsqrt = np.sqrt(np.array([r["qnorm2"] for r in q_rows], dtype=np.int64).astype(np.float64))
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    bc = emb.sparkSession.sparkContext.broadcast((qmat, qsqrt, qids))

    def partial_topk(batches):
        import numpy as np  # noqa: PLC0415 — worker-side imports
        import pandas as pd  # noqa: PLC0415

        qmat, qsqrt, qids = bc.value
        m = k + 1  # self-match removed post-selection
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qvec"]])
            nsqrt = np.sqrt(pdf["qnorm2"].to_numpy(dtype=np.int64).astype(np.float64))
            vec_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            labels = pdf["label"].to_numpy()
            out = {"query_id": [], "neighbor_id": [], "neighbor_label": [], "cosine": []}
            # tile over query chunks: the cos block is B×Q_chunk doubles,
            # so per-task memory stays bounded no matter how large the
            # query set grows (a B×Q block at Q=2000 was ~160 MB per
            # task — the grown-Q 100× hybrid probe GC-thrashed on it,
            # catch #9). Per-query selection is column-independent, so
            # tiling changes nothing about the results.
            for q0 in range(0, qids.shape[0], MATMUL_Q_CHUNK):
                q1 = min(q0 + MATMUL_Q_CHUNK, qids.shape[0])
                cos = (
                    _exact_f64_matmul(x, qmat[q0:q1], np)
                    / qsqrt[None, q0:q1]
                    / nsqrt[:, None]
                )
                for jj in range(q1 - q0):
                    j = q0 + jj
                    order = np.lexsort((vec_ids, -cos[:, jj]))[:m]
                    keep = order[vec_ids[order] != qids[j]][:k]
                    out["query_id"].extend([int(qids[j])] * keep.shape[0])
                    out["neighbor_id"].extend(vec_ids[keep].tolist())
                    out["neighbor_label"].extend(labels[keep].tolist())
                    out["cosine"].extend(cos[keep, jj].tolist())
            yield pd.DataFrame(out)

    candidates = emb.select("vec_id", "label", "qvec", "qnorm2").mapInPandas(
        partial_topk,
        schema="query_id long, neighbor_id long, neighbor_label int, cosine double",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def knn_brute_force_sql(query_mod: int = 100, k: int = 5) -> str:
    cos = sql_qcos("a.qvec", "b.qvec", "a.qnorm2", "b.qnorm2")
    return f"""(
    WITH queries AS (
        SELECT vec_id AS query_id, qvec, qnorm2 FROM qnormed WHERE vec_id % {query_mod} = 0
    ),
    scored AS (
        SELECT a.query_id, b.vec_id AS neighbor_id, b.label AS neighbor_label,
            {cos} AS cosine
        FROM queries a
        CROSS JOIN qnormed b
        WHERE b.vec_id != a.query_id
    )
    SELECT query_id, neighbor_id, neighbor_label, cosine,
        CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    ) r
    WHERE rank <= {k}
) s"""


# -------------------------------------------------------------------- IVF

def cost_based_cell_assignments(
    emb: DataFrame, centroid_mod: int | None = None, n: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """The assignment pass every IVF consumer should call: picks the
    Catalyst HOF fold below MATMUL_ASSIGN_MIN_N vectors and the
    Arrow-batched matmul kernel above it (bit-identical rows — same
    exact int64 dots, same IEEE operation order; verified at 1× and
    30×). One count() supplies both the strategy pick and the adaptive
    centroid sizing — the same plan-time statistic; callers that hold a
    cached/ANALYZE-style count pass ``n`` to skip the job."""
    if n is None:
        n = emb.count()
    if centroid_mod is None:
        centroid_mod = adaptive_centroid_mod(n)
    assigner = (
        ivf_cell_assignments_matmul
        if n >= MATMUL_ASSIGN_MIN_N
        else ivf_cell_assignments
    )
    return assigner(emb, centroid_mod)


def ivf_index(
    spark: SparkSession, sf_dir: str, centroid_mod: int, assign: str = "hof"
) -> tuple[DataFrame, DataFrame]:
    """Session-cached IVF index build: (cell-assigned corpus, centroid
    table), materialized once per (sf_dir, centroid_mod, strategy) —
    the coarse-quantizer analog of ``quantized_corpus``'s
    build-once/serve-many contract (an IVF index is built by the add()
    pass, not per query). ``localCheckpoint`` keeps the assignment
    across ``catalog.clearCache()``; the derivation is deterministic so
    cold and warm caches agree bit-for-bit."""
    from ..sources.catalog import session_cache

    cache = session_cache(spark, "_sg_ivf_index_cache")
    key = (os.path.abspath(sf_dir), centroid_mod, assign)
    hit = cache.get(key)
    if hit is None:
        emb, _ = quantized_corpus(spark, sf_dir)
        assigner = (
            ivf_cell_assignments_matmul
            if assign == "matmul"
            else ivf_cell_assignments
        )
        assigned, cent = assigner(emb, centroid_mod)
        hit = (assigned.localCheckpoint(eager=True), cent)
        cache[key] = hit
    return hit


def ivf_cell_assignments(
    emb: DataFrame, centroid_mod: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Coarse quantizer: centroids are the vectors with vec_id % centroid_mod
    == 0 (deterministic stand-in for k-means — the assignment/search
    machinery is identical). Each vector joins its argmax-cosine centroid.

    centroid_mod=None sizes the centroid set adaptively to ~sqrt(N)
    (adaptive_centroid_mod); the count() is a plan-time statistic, like
    the CBO's row counts."""
    if centroid_mod is None:
        centroid_mod = adaptive_centroid_mod(emb.count())
    cent = emb.filter(F.col("vec_id") % centroid_mod == 0).select(
        F.col("vec_id").alias("cell_id"),
        F.col("qvec").alias("c_qvec"),
        F.col("qnorm2").alias("c_qnorm2"),
    )
    # Same degenerate-centroid guard as the matmul assigner (review r9):
    # a zero-norm centroid makes every cosine NaN, and max_by's struct
    # ordering treats NaN as greatest — every vector would silently
    # land in the degenerate cell. The two physical strategies must
    # fail identically, not diverge by corpus size. This path is the
    # small-N strategy by construction, so the probe scan is tiny.
    bad = cent.filter(F.col("c_qnorm2") == 0).select("cell_id").limit(1).collect()
    if bad:
        raise ValueError(
            f"zero-norm centroid(s) at cell_id(s) {[r['cell_id'] for r in bad]}:"
            " cosine cell assignment requires non-degenerate centroids"
        )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "qvec",
        "qnorm2",
        "cell_id",
        qcosine(
            F.col("qvec"), F.col("c_qvec"), F.col("qnorm2"), F.col("c_qnorm2")
        ).alias("c_cos"),
    )
    # argmax via max_by over a (c_cos, -cell_id) struct — lexicographic
    # struct ordering reproduces "highest cosine, ties to lowest cell".
    # Unlike the row_number window (full sort of C rows per vector),
    # max_by partial-aggregates map-side: the shuffle carries one row
    # per vector, not C — the difference between O(N·C) and O(N)
    # shuffled bytes at scale.
    best = F.max_by(
        F.struct("cell_id", "label", "qvec", "qnorm2"),
        F.struct(F.col("c_cos"), -F.col("cell_id")),
    ).alias("b")
    assigned = (
        scored.groupBy("vec_id")
        .agg(best)
        .select("vec_id", "b.label", "b.qvec", "b.qnorm2", "b.cell_id")
    )
    return assigned, cent


def ivf_cell_assignments_matmul(
    emb: DataFrame, centroid_mod: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Same argmax-cosine assignment as :func:`ivf_cell_assignments`,
    computed as ONE integer matmul per Arrow batch (mapInPandas with the
    centroid matrix broadcast) instead of a C-way crossJoin + max_by
    shuffle. This is the FAISS-style scale shape: the assignment pass is
    embarrassingly parallel per partition, ships zero shuffle bytes, and
    the N·C·dim inner loop runs in BLAS instead of one Catalyst
    higher-order fold per pair — the one hot spot where an Arrow-batched
    kernel beats the built-in expression path.

    Bit-parity with the HOF path: dot products and norms are exact int64
    (same quantized vectors), and the cosine applies the SAME operation
    order (dot / sqrt(n2_vec) / sqrt(n2_cent), all IEEE double), so
    scores are bit-identical. Ties break to the lowest cell_id: the
    centroid matrix is ordered by cell_id ascending and np.argmax takes
    the first maximum.
    """
    if centroid_mod is None:
        centroid_mod = adaptive_centroid_mod(emb.count())
    cent = emb.filter(F.col("vec_id") % centroid_mod == 0).select(
        F.col("vec_id").alias("cell_id"),
        F.col("qvec").alias("c_qvec"),
        F.col("qnorm2").alias("c_qnorm2"),
    )
    import numpy as np

    cent_rows = cent.orderBy("cell_id").collect()  # C ~ sqrt(N): tiny
    cmat = np.array([r["c_qvec"] for r in cent_rows], dtype=np.int64)
    csqrt = np.sqrt(np.array([r["c_qnorm2"] for r in cent_rows], dtype=np.int64).astype(np.float64))
    cell_ids = np.array([r["cell_id"] for r in cent_rows], dtype=np.int64)
    # Guard the tie-rule proof (ADVICE r8): a zero-norm centroid column
    # yields NaN cosines, which the chunked running-best's strict `>`
    # update skips while a whole-row np.argmax would return the first
    # NaN index — the two forms would diverge. Zero-norm centroids are
    # degenerate (a zero vector can't anchor a cosine cell), so fail
    # loudly at build time instead of silently mis-assigning.
    if not (csqrt > 0).all():
        raise ValueError(
            "zero-norm centroid(s) at cell_id(s) "
            f"{cell_ids[csqrt == 0].tolist()}: cosine cell assignment "
            "requires non-degenerate centroids"
        )
    bc = emb.sparkSession.sparkContext.broadcast((cmat, csqrt, cell_ids))

    def assign(batches):
        import numpy as np  # noqa: PLC0415 — worker-side import

        cmat, csqrt, cell_ids = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qvec"]])
            n2 = pdf["qnorm2"].to_numpy(dtype=np.int64)
            nsq = np.sqrt(n2.astype(np.float64))
            # exact integer dots, same values as the HOF fold (f64 BLAS
            # under the 2^53 bound — see _exact_f64_matmul). Tiled over
            # centroid chunks (catch #9: C grows as √N, so the B×C
            # block is unbounded at scale); the running best with a
            # STRICT > update replicates np.argmax's first-max-wins tie
            # rule exactly, because chunks are scanned in centroid
            # order and each chunk's argmax keeps its first maximum.
            best_val = np.full(x.shape[0], -np.inf)
            best_col = np.zeros(x.shape[0], dtype=np.int64)
            for c0 in range(0, cell_ids.shape[0], MATMUL_Q_CHUNK):
                c1 = min(c0 + MATMUL_Q_CHUNK, cell_ids.shape[0])
                dot = _exact_f64_matmul(x, cmat[c0:c1], np)
                cos = (dot / nsq[:, None]) / csqrt[None, c0:c1]
                loc = np.argmax(cos, axis=1)
                val = cos[np.arange(x.shape[0]), loc]
                upd = val > best_val
                best_val[upd] = val[upd]
                best_col[upd] = c0 + loc[upd]
            out = pdf[["vec_id", "label", "qvec", "qnorm2"]].copy()
            out["cell_id"] = cell_ids[best_col]
            yield out

    assigned = emb.select("vec_id", "label", "qvec", "qnorm2").mapInPandas(
        assign,
        schema="vec_id long, label int, qvec array<long>, qnorm2 long, cell_id long",
    )
    return assigned, cent


def knn_ivf(
    spark: SparkSession,
    sf_dir: str,
    query_mod: int = 100,
    centroid_mod: int | None = None,
    k: int = 5,
    n_probe: int = 3,
    assign: str = "auto",
) -> DataFrame:
    """IVF-flat search with multi-probe: each query searches its
    ``n_probe`` nearest cells (data vectors still live in exactly one
    cell, so probed cells are disjoint and no result dedup is needed).
    n_probe is THE recall/cost dial of an IVF index — probing 3 of
    ~sqrt(N) cells scans ~3/sqrt(N) of the data for a large recall@k
    jump over n_probe=1 (measured by the ann_recall_check query).

    ``assign`` picks the physical strategy for the assignment pass —
    both produce bit-identical rows (same exact int64 dots, same IEEE
    operation order; verified identical at 1× and 30×):

    - "hof": pure Catalyst crossJoin + max_by. No Python stage; wins
      while N·C is small.
    - "matmul": Arrow-batched BLAS kernel (ivf_cell_assignments_matmul).
      Zero-shuffle, embarrassingly parallel; 3× faster already at 90 k
      vectors and the only viable shape at 100 TB.
    - "auto" (default): cost-based on the corpus count — the same
      plan-time statistic that sizes the centroid set — switching to
      matmul above MATMUL_ASSIGN_MIN_N vectors.
    """
    emb, n = quantized_corpus(spark, sf_dir)
    if assign == "auto":
        assign = "matmul" if n >= MATMUL_ASSIGN_MIN_N else "hof"
    if centroid_mod is None:
        centroid_mod = adaptive_centroid_mod(n)
    assigned, cent = ivf_index(spark, sf_dir, centroid_mod, assign)
    q = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("qnorm2").alias("q_qnorm2"),
    )
    probe_scored = q.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "q_qvec",
        "q_qnorm2",
        "cell_id",
        qcosine(
            F.col("q_qvec"), F.col("c_qvec"), F.col("q_qnorm2"), F.col("c_qnorm2")
        ).alias("p_cos"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("p_cos").desc(), F.col("cell_id")
    )
    probes = (
        probe_scored.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "q_qvec", "q_qnorm2", F.col("cell_id").alias("q_cell"))
    )
    scored = (
        assigned.join(F.broadcast(probes), F.col("cell_id") == F.col("q_cell"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("cell_id"),
            F.col("vec_id").alias("neighbor_id"),
            qcosine(
                F.col("q_qvec"), F.col("qvec"), F.col("q_qnorm2"), F.col("qnorm2")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_sweep_topk(
    spark: SparkSession,
    sf_dir: str,
    probes: tuple[int, ...],
    query_mod: int = 100,
    centroid_mod: int | None = None,
    k: int = 5,
    assign: str = "auto",
) -> DataFrame:
    """Every n_probe sweep point from ONE probe pass (optimization
    r11): ``knn_ivf(n_probe=p)``'s candidate set at probe depth p is by
    construction a prefix (by cell rank) of the max(probes) candidate
    set, so the sweep searches ONCE at max(probes), keeps each
    candidate's probe rank, and derives every sweep point's top-k with
    per-p RUNNING conditional ranks — sum(probe_rank ≤ p) over the
    cosine-ordered running frame equals row_number restricted to the
    p-deep candidate subset whenever the current row is itself in that
    subset. All the ranks share one window spec (one exchange, one
    sort, a single Window operator), and the per-p selection is an
    array filter + explode in the same projection — so the old form's
    Σ probes (= 7 cells of probe work for (1,2,4)) and 3 separate
    window exchanges become max(probes) (= 4) cells and 1 exchange,
    with bit-identical rows per sweep point (same cosine ordering,
    same (cosine DESC, neighbor_id) tiebreak).

    Output: (n_probe, query_id, neighbor_id, cosine, rank ≤ k)."""
    p_max = max(probes)
    emb, n = quantized_corpus(spark, sf_dir)
    if assign == "auto":
        assign = "matmul" if n >= MATMUL_ASSIGN_MIN_N else "hof"
    if centroid_mod is None:
        centroid_mod = adaptive_centroid_mod(n)
    assigned, cent = ivf_index(spark, sf_dir, centroid_mod, assign)
    q = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("qnorm2").alias("q_qnorm2"),
    )
    probe_scored = q.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "q_qvec",
        "q_qnorm2",
        "cell_id",
        qcosine(
            F.col("q_qvec"), F.col("c_qvec"), F.col("q_qnorm2"), F.col("c_qnorm2")
        ).alias("p_cos"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("p_cos").desc(), F.col("cell_id")
    )
    probe_tbl = (
        probe_scored.withColumn("probe_rank", F.row_number().over(wp))
        .filter(F.col("probe_rank") <= p_max)
        .select(
            "query_id",
            "q_qvec",
            "q_qnorm2",
            "probe_rank",
            F.col("cell_id").alias("q_cell"),
        )
    )
    scored = (
        assigned.join(F.broadcast(probe_tbl), F.col("cell_id") == F.col("q_cell"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "probe_rank",
            F.col("vec_id").alias("neighbor_id"),
            qcosine(
                F.col("q_qvec"), F.col("qvec"), F.col("q_qnorm2"), F.col("qnorm2")
            ).alias("cosine"),
        )
    )
    w_run = (
        Window.partitionBy("query_id")
        .orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = scored.select(
        "query_id",
        "probe_rank",
        "neighbor_id",
        "cosine",
        *[
            F.sum(
                F.when(F.col("probe_rank") <= p, 1).otherwise(0)
            ).over(w_run).alias(f"r{p}")
            for p in probes
        ],
    )
    picks = F.filter(
        F.array(
            *[
                F.struct(
                    F.lit(p).cast("long").alias("n_probe"),
                    (
                        (F.col("probe_rank") <= p) & (F.col(f"r{p}") <= k)
                    ).alias("ok"),
                    F.col(f"r{p}").cast("long").alias("rank"),
                )
                for p in probes
            ]
        ),
        lambda s: s["ok"],
    )
    return (
        ranked.select(
            "query_id", "neighbor_id", "cosine", F.explode(picks).alias("pk")
        )
        .select(
            F.col("pk.n_probe").alias("n_probe"),
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("pk.rank").alias("rank"),
        )
    )


def knn_ivf_sql(
    query_mod: int = 100,
    centroid_mod: int | None = None,
    k: int = 5,
    n_probe: int = 3,
) -> str:
    assign_cos = sql_qcos("b.qvec", "a.qvec", "b.qnorm2", "a.qnorm2")
    probe_cos = sql_qcos("q.q_qvec", "a.qvec", "q.q_qnorm2", "a.qnorm2")
    search_cos = sql_qcos("q.q_qvec", "n.qvec", "q.q_qnorm2", "n.qnorm2")
    mod_sql = str(centroid_mod) if centroid_mod is not None else ADAPTIVE_MOD_SQL
    return f"""(
    WITH centroids AS (
        SELECT vec_id AS cell_id, qvec, qnorm2 FROM qnormed
        WHERE vec_id % {mod_sql} = 0
    ),
    cell_scored AS (
        SELECT b.vec_id, b.label, b.qvec, b.qnorm2, a.cell_id,
            {assign_cos} AS c_cos
        FROM qnormed b
        CROSS JOIN centroids a
    ),
    assigned AS (
        SELECT vec_id, label, qvec, qnorm2, cell_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY c_cos DESC, cell_id) AS rn
            FROM cell_scored
        ) t WHERE rn = 1
    ),
    queries_raw AS (
        SELECT vec_id AS query_id, qvec AS q_qvec, qnorm2 AS q_qnorm2
        FROM qnormed WHERE vec_id % {query_mod} = 0
    ),
    queries AS (
        SELECT query_id, q_qvec, q_qnorm2, cell_id AS q_cell FROM (
            SELECT q.query_id, q.q_qvec, q.q_qnorm2, a.cell_id,
                ROW_NUMBER() OVER (
                    PARTITION BY q.query_id
                    ORDER BY {probe_cos} DESC, a.cell_id) AS prn
            FROM queries_raw q
            CROSS JOIN centroids a
        ) p WHERE prn <= {n_probe}
    ),
    pair_scored AS (
        SELECT q.query_id, n.cell_id, n.vec_id AS neighbor_id,
            {search_cos} AS cosine
        FROM assigned n
        JOIN queries q ON n.cell_id = q.q_cell
        WHERE n.vec_id != q.query_id
    )
    SELECT query_id, cell_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM pair_scored
    ) r
    WHERE rank <= {k}
) s"""


# ------------------------------------- random-hyperplane LSH (the other ANN)

# IVF (above) partitions the corpus by nearest centroid; hyperplane LSH
# partitions it by sign pattern against random hyperplanes. Both are
# bucket-then-search: LSH needs no training pass (no centroid
# assignment), handles inserts without re-clustering, and its recall
# dial is (n_bits, n_tables) instead of n_probe. At 100 TB the bucket
# table is written partitioned by (table_id, bucket): a query reads
# n_tables buckets ~ n_tables/2^n_bits of the data.
#
# Hyperplane components are integers in [-HP_SCALE, HP_SCALE] derived
# from md5 in PYTHON and inlined as literals into BOTH the Spark plan
# and the oracle SQL — identical by construction, no float RNG to
# reconcile. Integer dot products make every sign decision exact.

LSH_N_TABLES = 4
LSH_N_BITS = 6
HP_SCALE = 1000
EMB_DIM = 64  # fixture contract (TESTDATA embeddings), verified in tests


def _hyperplane(table_id: int, plane: int, dim: int) -> list[int]:
    import hashlib

    comps = []
    for d in range(dim):
        h = int(
            hashlib.md5(f"hp:{table_id}:{plane}:{d}".encode()).hexdigest()[:8], 16
        )
        comps.append(h % (2 * HP_SCALE + 1) - HP_SCALE)
    return comps


def _lsh_planes(dim: int, n_tables: int, n_bits: int) -> list[tuple[int, int, list[int]]]:
    return [
        (t, p, _hyperplane(t, p, dim))
        for t in range(n_tables)
        for p in range(n_bits)
    ]


def lsh_buckets(
    spark: SparkSession,
    emb: DataFrame,
    dim: int,
    n_tables: int = LSH_N_TABLES,
    n_bits: int = LSH_N_BITS,
) -> DataFrame:
    """(vec_id, table_id, bucket): bucket = Σ_p 2^p·[qvec·hp_{t,p} ≥ 0].
    One broadcast of the (n_tables·n_bits)-row plane table, one
    map-side-combined agg — no shuffle of the vectors themselves."""
    planes = spark.createDataFrame(
        _lsh_planes(dim, n_tables, n_bits),
        "table_id int, plane int, hp array<bigint>",
    )
    dot = qdot(F.col("qvec"), F.col("hp"))
    return (
        emb.select("vec_id", "qvec")
        .crossJoin(F.broadcast(planes))
        .select(
            "vec_id",
            "table_id",
            F.when(dot >= 0, F.expr("shiftleft(cast(1 as bigint), plane)"))
            .otherwise(F.lit(0).cast("long"))
            .alias("bit"),
        )
        .groupBy("vec_id", "table_id")
        .agg(F.sum("bit").alias("bucket"))
    )


def knn_lsh(
    spark: SparkSession,
    sf_dir: str,
    query_mod: int = 100,
    k: int = 5,
    n_tables: int = LSH_N_TABLES,
    n_bits: int = LSH_N_BITS,
) -> DataFrame:
    """ANN top-k via hyperplane LSH: candidates = corpus vectors sharing
    ≥1 (table, bucket) with the query, then exact quantized cosine +
    rank over the candidate set only. Distinct-pair dedup collapses
    multi-table collisions before the (expensive) scoring join."""
    emb, _ = quantized_corpus(spark, sf_dir)
    buckets = lsh_buckets(spark, emb, EMB_DIM, n_tables, n_bits)
    qb = buckets.filter(F.col("vec_id") % query_mod == 0)
    cand = (
        qb.alias("q")
        .join(
            buckets.alias("c"),
            (F.col("q.table_id") == F.col("c.table_id"))
            & (F.col("q.bucket") == F.col("c.bucket"))
            & (F.col("c.vec_id") != F.col("q.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
        )
        .distinct()
    )
    # Filter to the actual query set BEFORE broadcasting — broadcasting
    # the full embedding table would carry query_mod× more data than the
    # join can ever use (the broadcast bound is |corpus|/query_mod rows,
    # same documented bound as knn_brute_force).
    q = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("qnorm2").alias("q_qnorm2"),
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(emb.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.col("label").alias("neighbor_label"),
            qcosine(
                F.col("q_qvec"), F.col("qvec"), F.col("q_qnorm2"), F.col("qnorm2")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def knn_lsh_sql(
    dim: int = EMB_DIM,
    query_mod: int = 100,
    k: int = 5,
    n_tables: int = LSH_N_TABLES,
    n_bits: int = LSH_N_BITS,
) -> str:
    """DuckDB twin: same inlined hyperplane literals, same bucket/candidate
    algebra, so misses at bucket boundaries reproduce exactly."""
    rows = ",\n        ".join(
        f"({t}, {p}, {comps})" for t, p, comps in _lsh_planes(dim, n_tables, n_bits)
    )
    cos = sql_qcos("a.qvec", "b.qvec", "a.qnorm2", "b.qnorm2")
    return f"""(
    WITH planes AS (
        SELECT * FROM (VALUES
        {rows}
        ) AS t(table_id, plane, hp)
    ),
    buckets AS (
        SELECT vec_id, table_id,
            SUM(CASE WHEN list_sum(list_transform(generate_series(1, len(hp)),
                        i -> qvec[i] * hp[i])) >= 0
                THEN (CAST(1 AS BIGINT) << plane) ELSE 0 END) AS bucket
        FROM qnormed CROSS JOIN planes
        GROUP BY vec_id, table_id
    ),
    cands AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM buckets q
        JOIN buckets c ON q.table_id = c.table_id AND q.bucket = c.bucket
            AND c.vec_id != q.vec_id
        WHERE q.vec_id % {query_mod} = 0
    ),
    scored AS (
        SELECT cand.query_id, cand.neighbor_id, b.label AS neighbor_label,
            {cos} AS cosine
        FROM cands cand
        JOIN qnormed a ON a.vec_id = cand.query_id
        JOIN qnormed b ON b.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, neighbor_label, cosine,
        CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    ) r
    WHERE rank <= {k}
) s"""


# ------------------------------------------------- embedding near-dup pairs

PERTURB_DELTA = 0.05  # added to dim 1 of every 5th vector's copy


def embedding_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ perturbed copies (vec_id+1_000_000, every 5th vector,
    +0.05 on dimension 1) — deterministic near-duplicates for the
    near-dup detector to find (the fixture's vectors are random with max
    pairwise cosine ≈ 0.48, so organic near-dups don't exist)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pert = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: F.when(i == 0, x + PERTURB_DELTA).otherwise(x),
        ).alias("embedding"),
        "label",
    )
    return emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    ).unionByName(pert)


def embedding_corpus_count(spark: SparkSession, sf_dir: str) -> int:
    """Session-cached row count of :func:`embedding_corpus` — the
    ANALYZE-style table statistic the cost-based assignment consumes.
    Only the COUNT is cached (the dedup operators' data passes stay
    fully measured); it is exact, not estimated, so the adaptive
    centroid sizing matches the oracle's COUNT(*)-derived mod."""
    from ..sources.catalog import session_cache

    cache = session_cache(spark, "_sg_emb_corpus_count")
    key = os.path.abspath(sf_dir)
    n = cache.get(key)
    if n is None:
        n = embedding_corpus(spark, sf_dir).count()
        cache[key] = n
    return n


EMB_CORPUS_SQL = f"""
emb_corpus AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding, label FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000,
        list_transform(generate_series(1, len(embedding)),
            i -> CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) + {PERTURB_DELTA}
                      ELSE CAST(embedding[i] AS DOUBLE) END),
        label
    FROM embeddings WHERE vec_id % 5 = 0
),
qembeddings AS (
    SELECT vec_id, label,
        list_transform(embedding, x -> CAST(ROUND(x * {QUANT_SCALE}) AS BIGINT)) AS qvec
    FROM emb_corpus
),
qnormed AS (
    SELECT vec_id, label, qvec,
        list_sum(list_transform(generate_series(1, len(qvec)), i -> qvec[i] * qvec[i]))
            AS qnorm2
    FROM qembeddings
)
"""


def embedding_near_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.98,
    centroid_mod: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold), blocked by IVF
    cell so the pairwise comparison is within-cell only — the O(N²/C)
    scale path instead of a full cross join. Oracle runs the identical
    algorithm, so blocking-boundary misses (inherent to n_probe=1) are
    reproduced exactly."""
    emb = _with_quantized(embedding_corpus(spark, sf_dir))
    assigned, _ = cost_based_cell_assignments(
        emb, centroid_mod, n=embedding_corpus_count(spark, sf_dir)
    )
    assigned = assigned.persist()  # feeds both sides of the self-join
    a = assigned.alias("a")
    b = assigned.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cell_id") == F.col("b.cell_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.cell_id").alias("cell_id"),
            qcosine(
                F.col("a.qvec"), F.col("b.qvec"), F.col("a.qnorm2"), F.col("b.qnorm2")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_pairs_sql(
    threshold: float = 0.98, centroid_mod: int | None = None
) -> str:
    assign_cos = sql_qcos("b.qvec", "a.qvec", "b.qnorm2", "a.qnorm2")
    pair_cos = sql_qcos("x.qvec", "y.qvec", "x.qnorm2", "y.qnorm2")
    mod_sql = str(centroid_mod) if centroid_mod is not None else ADAPTIVE_MOD_SQL
    return f"""(
    WITH centroids AS (
        SELECT vec_id AS cell_id, qvec, qnorm2 FROM qnormed
        WHERE vec_id % {mod_sql} = 0
    ),
    cell_scored AS (
        SELECT b.vec_id, b.qvec, b.qnorm2, a.cell_id, {assign_cos} AS c_cos
        FROM qnormed b CROSS JOIN centroids a
    ),
    assigned AS (
        SELECT vec_id, qvec, qnorm2, cell_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY c_cos DESC, cell_id) AS rn
            FROM cell_scored
        ) t WHERE rn = 1
    )
    SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.cell_id AS cell_id,
        {pair_cos} AS cosine
    FROM assigned x
    JOIN assigned y ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id
    WHERE {pair_cos} >= {threshold}
) s"""


def semdedup_cell_index(
    spark: SparkSession, sf_dir: str, centroid_mod: int | None = None
) -> DataFrame:
    """Session-cached IVF cell assignment of the DUP-INJECTED embedding
    corpus (embedding_corpus — embeddings ∪ perturbed copies), the
    blocking structure the semantic-dedup family reads. Separate cache
    from ``ivf_index`` because the base table differs (the ANN serve
    paths index the plain embeddings; dedup indexes the corpus that
    actually contains near-duplicates). Deterministic derivation —
    cold/warm identical, oracle rebuilt from scratch still matches."""
    import os as _os

    from ..sources.catalog import session_cache

    n = embedding_corpus_count(spark, sf_dir)
    mod = centroid_mod if centroid_mod is not None else adaptive_centroid_mod(n)
    cache = session_cache(spark, "_sg_semdedup_index")
    key = (_os.path.abspath(sf_dir), mod)
    hit = cache.get(key)
    if hit is None:
        emb = _with_quantized(embedding_corpus(spark, sf_dir))
        assigned, _ = cost_based_cell_assignments(emb, mod, n=n)
        hit = assigned.localCheckpoint(eager=True)
        cache[key] = hit
    return hit


def semantic_dedup(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.98,
    centroid_mod: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space coarsely, compare
    pairs ONLY within a cluster, and keep one representative per
    ε-neighborhood — the published recipe for pruning semantically
    redundant web data before LLM training.

    Keep rule (deterministic variant): a vector is DROPPED iff a
    lower-id member of its own cell lies within ``threshold`` cosine;
    the lowest id of every neighborhood therefore survives. This is the
    greedy-by-id form of the paper's keep-one rule — transitive chains
    are pruned link-by-link, and the oracle reproduces the exact same
    decision from the same quantized-integer cosines.

    Scale shape: identical to :func:`embedding_near_pairs` — the
    pairwise stage is blocked by IVF cell (~sqrt(N) cells of ~sqrt(N)
    vectors → O(N^1.5) comparisons, each cell a self-contained bucket),
    and the keep decision is one aggregation + one left join on vec_id.

    Output per corpus vector: (vec_id, cell_id, kept, dup_of = lowest
    in-cell duplicate id, n_dup_neighbors).

    Serves off the session-cached cell assignment of the dup-injected
    embedding corpus (semdedup_cell_index — the coarse quantizer is
    built by the index's add() pass, not per dedup run; r9, replacing
    a per-call assignment + private persist). The per-call work (r10)
    is ONE Arrow kernel per cell: applyInPandas(groupBy cell_id)
    computes the cell's pairwise cosines as a single exact-int64 GEMM
    (the FAISS shape — `_exact_f64_matmul`, same IEEE operation order
    as `qcosine`: (dot / √|a|²) / √|b|² with a the LOWER vec_id, rows
    pre-sorted by id so the upper triangle IS the a<b orientation) and
    aggregates the keep rule CELL-LOCALLY (duplicate edges never cross
    cells, so min/count per column of the masked triangle is the full
    answer). This replaces ~N^1.5 interpreted HOF dot-folds AND the
    post-join groupBy exchange with one bounded matmul per cell —
    cells are ~√N by the adaptive mod, so the per-task block is
    √N×√N doubles, the same quadratic the join form fanned out as
    rows. The assignment BUILD stays bench-measured via
    dedup_embedding_cosine (embedding_near_pairs), which assigns from
    scratch."""
    assigned = semdedup_cell_index(spark, sf_dir, centroid_mod)

    def cell_edges(pdf):
        import numpy as np  # noqa: PLC0415 — worker-side imports
        import pandas as pd  # noqa: PLC0415

        order = np.argsort(pdf["vec_id"].to_numpy(dtype=np.int64), kind="stable")
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)[order]
        if ids.shape[0] < 2:
            return pd.DataFrame(
                {"vec_id": [], "dup_of": [], "n_dup_neighbors": []},
                dtype="int64",
            )
        x = np.stack(
            [np.asarray(v, dtype=np.int64) for v in pdf["qvec"].iloc[order]]
        )
        s = np.sqrt(
            pdf["qnorm2"].to_numpy(dtype=np.int64)[order].astype(np.float64)
        )
        cos = _exact_f64_matmul(x, x, np) / s[:, None] / s[None, :]
        mask = (cos >= threshold) & np.tri(ids.shape[0], k=-1, dtype=bool).T
        n = mask.sum(axis=0)
        hit = n > 0
        first = mask.argmax(axis=0)  # row index of the FIRST (lowest-id) True
        return pd.DataFrame(
            {
                "vec_id": ids[hit],
                "dup_of": ids[first[hit]],
                "n_dup_neighbors": n[hit].astype(np.int64),
            }
        )

    dup_edges = assigned.select(
        "cell_id", "vec_id", "qvec", "qnorm2"
    ).groupBy("cell_id").applyInPandas(
        cell_edges, schema="vec_id long, dup_of long, n_dup_neighbors long"
    )
    return assigned.join(dup_edges, "vec_id", "left").select(
        "vec_id",
        "cell_id",
        F.col("dup_of").isNull().alias("kept"),
        "dup_of",
        F.coalesce(F.col("n_dup_neighbors"), F.lit(0)).alias("n_dup_neighbors"),
    )


def semantic_dedup_sql(
    threshold: float = 0.98, centroid_mod: int | None = None
) -> str:
    assign_cos = sql_qcos("b.qvec", "a.qvec", "b.qnorm2", "a.qnorm2")
    pair_cos = sql_qcos("x.qvec", "y.qvec", "x.qnorm2", "y.qnorm2")
    mod_sql = str(centroid_mod) if centroid_mod is not None else ADAPTIVE_MOD_SQL
    return f"""(
    WITH centroids AS (
        SELECT vec_id AS cell_id, qvec, qnorm2 FROM qnormed
        WHERE vec_id % {mod_sql} = 0
    ),
    cell_scored AS (
        SELECT b.vec_id, b.qvec, b.qnorm2, a.cell_id, {assign_cos} AS c_cos
        FROM qnormed b CROSS JOIN centroids a
    ),
    assigned AS (
        SELECT vec_id, qvec, qnorm2, cell_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY c_cos DESC, cell_id) AS rn
            FROM cell_scored
        ) t WHERE rn = 1
    ),
    dup_edges AS (
        SELECT y.vec_id, MIN(x.vec_id) AS dup_of, COUNT(*) AS n_dup_neighbors
        FROM assigned x
        JOIN assigned y ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id
        WHERE {pair_cos} >= {threshold}
        GROUP BY y.vec_id
    )
    SELECT s.vec_id, s.cell_id,
        d.dup_of IS NULL AS kept,
        d.dup_of,
        COALESCE(d.n_dup_neighbors, 0) AS n_dup_neighbors
    FROM assigned s LEFT JOIN dup_edges d ON s.vec_id = d.vec_id
) sd"""


# ------------------------------------------- contrastive pair mining

def _hnm_emit(np, out, cos, vec_ids, labels, qids, qlabels, q0, q1):
    """Per-chunk selection for :func:`_hnm_partial_matmul`: local best
    same-label and best different-label candidate per query, under the
    strict (cosine DESC, neighbor_id ASC) total order."""
    for jj in range(q1 - q0):
        qi = q0 + jj
        valid = vec_ids != qids[qi]
        for is_same in (True, False):
            mask = valid & ((labels == qlabels[qi]) == is_same)
            idx = np.flatnonzero(mask)
            if idx.size == 0:
                continue
            c = cos[idx, jj]
            best = idx[np.lexsort((vec_ids[idx], -c))[0]]
            out["query_id"].append(int(qids[qi]))
            out["q_label"].append(int(qlabels[qi]))
            out["neighbor_id"].append(int(vec_ids[best]))
            out["is_same"].append(is_same)
            out["cosine"].append(float(cos[best, jj]))


def _hnm_partial_matmul(emb, query_mod: int):
    """Distributive form of the mining scan: each Arrow batch emits only
    its local best same-label and best different-label candidate per
    query (2 rows per query per batch under the strict total order
    cosine DESC, neighbor_id ASC), so the final per-class window ranks
    #partitions·Q·2 rows instead of shuffling all N·Q scored pairs.
    Bit-identical to the Catalyst form: integer GEMM dots, the same
    IEEE operation order as qcosine, lossless partial selection."""
    import numpy as np

    q_rows = (
        emb.filter(F.col("vec_id") % query_mod == 0)
        .select("vec_id", "label", "qvec", "qnorm2")
        .collect()
    )
    if not q_rows:
        # Empty query set: mirror the Catalyst path's clean empty result
        # instead of building a (0,)-shaped GEMM operand.
        return emb.sparkSession.createDataFrame(
            [],
            schema="query_id long, q_label long, neighbor_id long,"
            " is_same boolean, cosine double",
        )
    qmat = np.array([r["qvec"] for r in q_rows], dtype=np.int64)
    qsqrt = np.sqrt(
        np.array([r["qnorm2"] for r in q_rows], dtype=np.int64).astype(np.float64)
    )
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    qlabels = np.array([r["label"] for r in q_rows], dtype=np.int64)
    bc = emb.sparkSession.sparkContext.broadcast((qmat, qsqrt, qids, qlabels))

    def partial(batches):
        import numpy as np  # noqa: PLC0415 — worker-side imports
        import pandas as pd  # noqa: PLC0415

        qmat, qsqrt, qids, qlabels = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qvec"]])
            nsqrt = np.sqrt(
                pdf["qnorm2"].to_numpy(dtype=np.int64).astype(np.float64)
            )
            vec_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            labels = pdf["label"].to_numpy(dtype=np.int64)
            out = {
                "query_id": [], "q_label": [], "neighbor_id": [],
                "is_same": [], "cosine": [],
            }
            # tiled over query chunks (catch #9) — see knn_brute_force
            for q0 in range(0, qids.shape[0], MATMUL_Q_CHUNK):
                q1 = min(q0 + MATMUL_Q_CHUNK, qids.shape[0])
                cos = (
                    _exact_f64_matmul(x, qmat[q0:q1], np)
                    / qsqrt[None, q0:q1]
                    / nsqrt[:, None]
                )
                _hnm_emit(
                    np, out, cos, vec_ids, labels, qids, qlabels, q0, q1
                )
            yield pd.DataFrame(out)

    return emb.select("vec_id", "label", "qvec", "qnorm2").mapInPandas(
        partial,
        schema="query_id long, q_label long, neighbor_id long,"
        " is_same boolean, cosine double",
    )


def hard_negative_mining(
    spark: SparkSession,
    sf_dir: str,
    query_mod: int = 100,
    strategy: str = "auto",
) -> DataFrame:
    """Contrastive-pair mining for embedding training (beyond-reference
    surface): for each query vector, the best SAME-label neighbor (the
    positive) and the best DIFFERENT-label neighbor (the hard negative)
    by exact quantized cosine, plus the margin between them — the
    triplet/contrastive batch-construction step of an embedding-model
    training pipeline. Scale shape = knn_brute_force's: broadcast
    query set over the streaming corpus; per-label top-1s come out of
    ONE window over (query, same-label flag). margin is a single IEEE
    subtraction of two deterministic doubles — oracle-exact."""
    emb, n = quantized_corpus(spark, sf_dir)
    if strategy == "auto":
        strategy = (
            "matmul"
            if n * (n // query_mod) >= BRUTE_MATMUL_MIN_PAIRS
            else "catalyst"
        )
    if strategy == "matmul":
        scored = _hnm_partial_matmul(emb, query_mod)
    else:
        q = emb.filter(F.col("vec_id") % query_mod == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("q_label"),
            F.col("qvec").alias("q_qvec"),
            F.col("qnorm2").alias("q_qnorm2"),
        )
        scored = (
            emb.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                "q_label",
                F.col("vec_id").alias("neighbor_id"),
                (F.col("label") == F.col("q_label")).alias("is_same"),
                qcosine(
                    F.col("q_qvec"), F.col("qvec"), F.col("q_qnorm2"), F.col("qnorm2")
                ).alias("cosine"),
            )
        )
    w = Window.partitionBy("query_id", "is_same").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    best = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.groupBy("query_id", F.col("q_label").alias("label"))
        .agg(
            F.max(F.when(F.col("is_same"), F.col("neighbor_id"))).alias("pos_id"),
            F.max(F.when(F.col("is_same"), F.col("cosine"))).alias("pos_cos"),
            F.max(F.when(~F.col("is_same"), F.col("neighbor_id"))).alias("neg_id"),
            F.max(F.when(~F.col("is_same"), F.col("cosine"))).alias("neg_cos"),
        )
        .withColumn("margin", F.col("pos_cos") - F.col("neg_cos"))
        .orderBy("query_id")
    )


def hard_negative_mining_sql(query_mod: int = 100) -> str:
    cos = sql_qcos("q.qvec", "n.qvec", "q.qnorm2", "n.qnorm2")
    return f"""(
    WITH hq AS (
        SELECT vec_id AS query_id, label AS q_label, qvec, qnorm2
        FROM qnormed WHERE vec_id % {query_mod} = 0
    ),
    hscored AS (
        SELECT q.query_id, q.q_label, n.vec_id AS neighbor_id,
               n.label = q.q_label AS is_same,
               {cos} AS cosine
        FROM hq q JOIN qnormed n ON n.vec_id <> q.query_id
    ),
    hbest AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id, is_same
                ORDER BY cosine DESC, neighbor_id) AS rn
            FROM hscored
        ) t WHERE rn = 1
    )
    SELECT query_id, q_label AS label,
           MAX(CASE WHEN is_same THEN neighbor_id END) AS pos_id,
           MAX(CASE WHEN is_same THEN cosine END) AS pos_cos,
           MAX(CASE WHEN NOT is_same THEN neighbor_id END) AS neg_id,
           MAX(CASE WHEN NOT is_same THEN cosine END) AS neg_cos,
           MAX(CASE WHEN is_same THEN cosine END)
             - MAX(CASE WHEN NOT is_same THEN cosine END) AS margin
    FROM hbest
    GROUP BY query_id, q_label
    ORDER BY query_id
) s"""


# ----------------------------------- Johnson–Lindenstrauss projection

JL_DIM = 16
JL_SEED_NS = "jl"


def _jl_sign(d: int, i: int) -> int:
    import hashlib

    h = int(hashlib.md5(f"{JL_SEED_NS}:{d}:{i}".encode()).hexdigest()[:8], 16)
    return 1 if h & 1 else -1


def jl_sign_matrix(dim_out: int = JL_DIM, dim_in: int = EMB_DIM) -> list[list[int]]:
    """Deterministic ±1 sign matrix (md5-derived, same scheme as the
    LSH hyperplanes) — the Achlioptas database-friendly JL variant."""
    return [[_jl_sign(d, i) for i in range(dim_in)] for d in range(dim_out)]


def jl_project(qvec: Column, signs: list[list[int]]) -> Column:
    """qvec (ints) → JL_DIM ints: p_d = Σ_i sign_{d,i}·qv_i — exact
    int64, a pure map-side projection against literal rows."""
    return F.array(
        *[
            qdot(qvec, F.array(*[F.lit(s).cast("long") for s in row]))
            for row in signs
        ]
    )


def jl_projection_recall(
    spark: SparkSession,
    sf_dir: str,
    query_mod: int = 100,
    k: int = 5,
    strategy: str = "auto",
) -> DataFrame:
    """Recall@5 of brute-force search in the JL-projected space (64 →
    16 dims) against full-space ground truth — the dimensionality-
    reduction quality gate (JL lemma in action: 4× cheaper scans at
    measurable recall cost). Both searches deterministic; the oracle
    recomputes the projection from the same literal sign matrix."""
    signs = jl_sign_matrix()
    emb, _ = quantized_corpus(spark, sf_dir)
    # The projected frame re-uses the brute-force machinery verbatim
    # (same column contract), so the search inherits its cost-based
    # physical strategy: Catalyst crossJoin at toy scale, per-partition
    # GEMM + distributive partial top-k once N·Q crosses the threshold.
    proj = emb.select(
        "vec_id",
        F.lit(0).alias("label"),
        jl_project(F.col("qvec"), signs).alias("qvec"),
    ).withColumn("qnorm2", qnorm2(F.col("qvec")))
    if strategy == "auto":
        n = proj.count()
        strategy = (
            "matmul"
            if n * (n // query_mod) >= BRUTE_MATMUL_MIN_PAIRS
            else "catalyst"
        )
    if strategy == "matmul":
        ranked = knn_brute_force_matmul(proj, query_mod, k)
    else:
        q = proj.filter(F.col("vec_id") % query_mod == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("qvec").alias("q_pvec"),
            F.col("qnorm2").alias("q_pnorm2"),
        )
        scored = (
            proj.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                qcosine(
                    F.col("q_pvec"),
                    F.col("qvec"),
                    F.col("q_pnorm2"),
                    F.col("qnorm2"),
                ).alias("pcos"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("pcos").desc(), F.col("neighbor_id")
        )
        ranked = scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )
    approx = ranked.select("query_id", "neighbor_id")
    bf = ground_truth_topk(spark, sf_dir, query_mod, k).select(
        "query_id", "neighbor_id"
    )
    # one left join + one aggregate (sum(hit)/count(*) == grouped
    # sum(h)/sum(k) exactly — same integer totals; see the recall evals
    # in plans/extensions.py)
    joined = bf.join(
        approx.withColumn("hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    return joined.agg(
        F.countDistinct("query_id").alias("n_queries"),
        (
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
            / F.count("*").cast("double")
        ).alias("mean_recall_at_5"),
    )


def jl_projection_recall_sql(query_mod: int = 100, k: int = 5) -> str:
    signs = jl_sign_matrix()
    rows = ",\n        ".join(
        f"({d}, [{', '.join(str(s) for s in row)}])"
        for d, row in enumerate(signs)
    )
    pcos = sql_qcos("q.pvec", "p.pvec", "q.pnorm2", "p.pnorm2")
    return f"""(
    WITH jl_signs(d, srow) AS (VALUES
        {rows}
    ),
    jproj AS (
        SELECT n.vec_id,
            list(CAST(list_sum(list_transform(
                generate_series(1, len(n.qvec)),
                i -> n.qvec[i] * s.srow[i])) AS BIGINT) ORDER BY s.d) AS pvec
        FROM qnormed n CROSS JOIN jl_signs s
        GROUP BY n.vec_id
    ),
    jnormed AS (
        SELECT vec_id, pvec,
            list_sum(list_transform(generate_series(1, len(pvec)),
                                    i -> pvec[i] * pvec[i])) AS pnorm2
        FROM jproj
    ),
    jq AS (
        SELECT vec_id AS query_id, pvec, pnorm2 FROM jnormed
        WHERE vec_id % {query_mod} = 0
    ),
    japprox AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, p.vec_id AS neighbor_id, ROW_NUMBER() OVER (
                PARTITION BY q.query_id
                ORDER BY {pcos} DESC, p.vec_id) AS rank
            FROM jq q JOIN jnormed p ON p.vec_id <> q.query_id
        ) t WHERE rank <= {k}
    ),
    jbf AS (
        SELECT query_id, neighbor_id FROM {knn_brute_force_sql(query_mod, k)}
    ),
    jper_q AS (
        SELECT jbf.query_id, COUNT(*) AS k,
            SUM(CASE WHEN japprox.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS h
        FROM jbf
        LEFT JOIN japprox ON jbf.query_id = japprox.query_id
                         AND jbf.neighbor_id = japprox.neighbor_id
        GROUP BY jbf.query_id
    )
    SELECT COUNT(*) AS n_queries,
        CAST(SUM(h) AS DOUBLE) / CAST(SUM(k) AS DOUBLE) AS mean_recall_at_5
    FROM jper_q
) s"""


# ------------------------------------------- MMR diverse top-k selection

MMR_QUERY_ID = 0
MMR_POOL = 20
MMR_K = 5
# λ = 0.7 as the exact literals 0.7/0.3 — both engines evaluate the same
# IEEE double expression 0.7·rel − 0.3·maxsim, so argmax ties are
# resolved identically (and broken by vec_id regardless)
MMR_LAMBDA = 0.7


def mmr_diverse_topk(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = MMR_QUERY_ID,
    pool_size: int = MMR_POOL,
    k: int = MMR_K,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking — the diversity-aware
    selection every retrieval-augmented pipeline ends with (pure
    relevance top-k returns near-duplicates; MMR greedily picks
    argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)).

    The scale split is explicit: candidate GENERATION is the
    distributed part (top-``pool_size`` by quantized cosine — here
    brute-force; at corpus scale the IVF/PQ paths produce the same
    pool), while the greedy re-rank runs on the pool only — O(pool²)
    similarities and k argmax rounds, each a 1-row digest (the kmeans
    convergence-digest pattern: tiny driver traffic, never data).
    Quantized-integer dots keep rel/sim bit-exact; the oracle unrolls
    the k greedy rounds as CTEs and reproduces every pick."""
    emb, _ = quantized_corpus(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == query_id).select(
        F.col("qvec").alias("q_qvec"), F.col("qnorm2").alias("q_qnorm2")
    )
    rel = (
        emb.filter(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "qvec",
            "qnorm2",
            qcosine(
                F.col("q_qvec"), F.col("qvec"), F.col("q_qnorm2"), F.col("qnorm2")
            ).alias("rel"),
        )
    )
    w = Window.orderBy(F.col("rel").desc(), F.col("vec_id"))
    pool = (
        rel.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= pool_size)
        .drop("rn")
        .persist()
    )
    a, b = pool.alias("a"), pool.alias("b")
    sims = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("cand_id"),
            F.col("b.vec_id").alias("sel_id"),
            qcosine(
                F.col("a.qvec"),
                F.col("b.qvec"),
                F.col("a.qnorm2"),
                F.col("b.qnorm2"),
            ).alias("sim"),
        )
        .persist()
    )
    lam = MMR_LAMBDA
    first = pool.orderBy(F.col("rel").desc(), F.col("vec_id")).select(
        "vec_id", "rel"
    ).first()
    selected = [(1, first["vec_id"], first["rel"], 0.0, lam * first["rel"])]
    chosen = [first["vec_id"]]
    for r in range(2, k + 1):
        ms = (
            sims.filter(F.col("sel_id").isin(chosen))
            .groupBy("cand_id")
            .agg(F.max("sim").alias("maxsim"))
        )
        pick = (
            pool.filter(~F.col("vec_id").isin(chosen))
            .join(ms, F.col("vec_id") == F.col("cand_id"))
            .select(
                "vec_id",
                "rel",
                "maxsim",
                (F.lit(lam) * F.col("rel") - F.lit(1 - lam) * F.col("maxsim")).alias(
                    "mmr"
                ),
            )
            .orderBy(F.col("mmr").desc(), F.col("vec_id"))
            .first()
        )
        selected.append((r, pick["vec_id"], pick["rel"], pick["maxsim"], pick["mmr"]))
        chosen.append(pick["vec_id"])
    return spark.createDataFrame(
        selected, "rank long, vec_id long, rel double, maxsim double, mmr double"
    ).orderBy("rank")


def mmr_diverse_topk_sql(
    query_id: int = MMR_QUERY_ID,
    pool_size: int = MMR_POOL,
    k: int = MMR_K,
) -> str:
    """DuckDB twin (expects QUANT_SQL prelude): the same pool, the same
    pairwise sims, and the k greedy rounds unrolled as CTEs — every
    round's argmax must reproduce the Spark pick bit-for-bit."""
    lam, mu = MMR_LAMBDA, 1 - MMR_LAMBDA
    cos_rel = sql_qcos("q.qvec", "b.qvec", "q.qnorm2", "b.qnorm2")
    cos_ab = sql_qcos("a.qvec", "b.qvec", "a.qnorm2", "b.qnorm2")
    parts = [
        f"""mpool AS (
        SELECT vec_id, qvec, qnorm2, rel FROM (
            SELECT b.vec_id, b.qvec, b.qnorm2, {cos_rel} AS rel,
                ROW_NUMBER() OVER (ORDER BY {cos_rel} DESC, b.vec_id) AS rn
            FROM qnormed q JOIN qnormed b ON b.vec_id != {query_id}
            WHERE q.vec_id = {query_id}
        ) WHERE rn <= {pool_size}
    ),
    msims AS (
        SELECT a.vec_id AS cand_id, b.vec_id AS sel_id, {cos_ab} AS sim
        FROM mpool a JOIN mpool b ON a.vec_id != b.vec_id
    ),
    msel1 AS (
        SELECT 1 AS rank, vec_id, rel, 0.0 AS maxsim, {lam} * rel AS mmr
        FROM mpool ORDER BY rel DESC, vec_id LIMIT 1
    )"""
    ]
    prev_union = "SELECT vec_id FROM msel1"
    prev_all = "SELECT * FROM msel1"
    for r in range(2, k + 1):
        parts.append(f"""msel{r} AS (
        SELECT {r} AS rank, p.vec_id, p.rel, m.maxsim,
            {lam} * p.rel - {mu} * m.maxsim AS mmr
        FROM mpool p
        JOIN (
            SELECT cand_id, MAX(sim) AS maxsim FROM msims
            WHERE sel_id IN ({prev_union})
            GROUP BY cand_id
        ) m ON p.vec_id = m.cand_id
        WHERE p.vec_id NOT IN ({prev_union})
        ORDER BY {lam} * p.rel - {mu} * m.maxsim DESC, p.vec_id LIMIT 1
    )""")
        prev_union += f" UNION ALL SELECT vec_id FROM msel{r}"
        prev_all += f" UNION ALL SELECT * FROM msel{r}"
    return (
        "(\n    WITH "
        + ",\n    ".join(parts)
        + f"\n    {prev_all}\n    ORDER BY rank\n) s"
    )


# --------------------------------------------- cluster-balanced sampling

CB_CAP = 8  # max vectors kept per coarse cluster


def cluster_balanced_sample(
    spark: SparkSession,
    sf_dir: str,
    cap: int = CB_CAP,
    centroid_mod: int | None = None,
) -> DataFrame:
    """Diversity-preserving subsampling: cap how many vectors survive
    per coarse embedding cluster — the curation step that keeps a
    training subsample from being dominated by the corpus's dense
    regions (the cluster-balanced selection used alongside SemDeDup in
    modern data-curation recipes; dedup removes near-twins, this caps
    whole neighborhoods). Within a cell the kept set is a deterministic
    pseudo-random draw: rank by (md5-derived 32-bit hash of vec_id,
    vec_id) — unbiased w.r.t. vec_id order, reshuffleable by seed, and
    exactly reproducible in the oracle.

    Scale shape: reuses the session-cached IVF index (one checkpointed
    scan), then ONE window partitioned by cell_id (parallel across
    ~√N cells, no global sort). Output is row-level (vec_id, cell_id,
    pick_order, kept) so downstream joins can filter kept=true."""
    emb, n = quantized_corpus(spark, sf_dir)
    if centroid_mod is None:
        centroid_mod = adaptive_centroid_mod(n)
    assign = "matmul" if n >= MATMUL_ASSIGN_MIN_N else "hof"
    assigned, _ = ivf_index(spark, sf_dir, centroid_mod, assign)
    from ..functions.hashing import portable_hash32

    h = portable_hash32(F.col("vec_id").cast("string"), seed=11)
    w = Window.partitionBy("cell_id").orderBy(h.asc(), F.col("vec_id").asc())
    return assigned.select("vec_id", "cell_id").select(
        "vec_id",
        "cell_id",
        F.row_number().over(w).cast("long").alias("pick_order"),
        (F.row_number().over(w) <= cap).alias("kept"),
    )


def cluster_balanced_sample_sql(
    cap: int = CB_CAP, centroid_mod: int | None = None
) -> str:
    from ..functions.hashing import portable_hash32_sql

    assign_cos = sql_qcos("b.qvec", "a.qvec", "b.qnorm2", "a.qnorm2")
    mod_sql = str(centroid_mod) if centroid_mod is not None else ADAPTIVE_MOD_SQL
    h = portable_hash32_sql("CAST(vec_id AS VARCHAR)", seed=11)
    return f"""(
    WITH centroids AS (
        SELECT vec_id AS cell_id, qvec, qnorm2 FROM qnormed
        WHERE vec_id % {mod_sql} = 0
    ),
    cell_scored AS (
        SELECT b.vec_id, b.qvec, b.qnorm2, a.cell_id, {assign_cos} AS c_cos
        FROM qnormed b CROSS JOIN centroids a
    ),
    assigned AS (
        SELECT vec_id, cell_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY c_cos DESC, cell_id) AS rn
            FROM cell_scored
        ) t WHERE rn = 1
    )
    SELECT vec_id, cell_id, CAST(pick_order AS BIGINT) AS pick_order,
        pick_order <= {cap} AS kept
    FROM (
        SELECT vec_id, cell_id, ROW_NUMBER() OVER (
            PARTITION BY cell_id ORDER BY {h} ASC, vec_id ASC) AS pick_order
        FROM assigned
    ) r
) s"""


# --------------------------------------- embedding-space diagnostics

def embedding_space_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row health report of the embedding space — the collapse /
    anisotropy gate an embedding-production pipeline runs before
    trusting similarity search over a new model's vectors: per-dimension
    variance spread (a collapsed dimension has ~0; a dominant one
    carries most of the energy) and the top dimension's share of total
    variance in exact ppm.

    Exactness: everything stays integer until four final fixed-order
    IEEE divisions — per-dim variance numerators are n·Σv² − (Σv)² on
    exact split-accumulator sums (functions/stats.exact_long_sum shape,
    decimal(38,0) ≡ DuckDB HUGEINT), the ppm share is an integer
    division of two exact decimals, and min/max/mean derive from those
    numerators without any float summation.

    Scale shape (r8, the stats-digest treatment — VERDICT r7 #3): ONE
    posexplode pass (corpus × 64 rows, map-side partial aggregation
    into ≤64 groups) — the only input-sized job; the ≤64-row per-dim
    moment digest is collected and the five report values are exact
    driver-side arithmetic over it (Python ints ≡ the decimal(38,0)/
    HUGEINT accumulators; float(int) and the final divisions round
    identically to both engines' casts), zero further Spark jobs where
    the second aggregate paid another fixed stage launch. The corpus
    is never shuffled on content."""
    from ..functions.stats import exact_long_sum
    from ..sources.catalog import session_cache

    # the ≤64-row moment digest is a TABLE STATISTIC of the quantized
    # corpus (the ANALYZE analog), so it is session-cached alongside it
    # — same lifecycle as the anomaly chain's GROUPING SETS digest
    cache = session_cache(spark, "_sg_embdiag_digest")
    ckey = os.path.abspath(sf_dir)
    per_dim = cache.get(ckey)
    if per_dim is None:
        emb, _ = quantized_corpus(spark, sf_dir)
        v = F.col("v")
        per_dim = (
            emb.select(F.posexplode(F.col("qvec")).alias("dim", "v"))
            .groupBy("dim")
            .agg(
                F.count("*").alias("n"),
                exact_long_sum(v).alias("s"),
                exact_long_sum(v * v).alias("s2"),
            )
        ).collect()
        cache[ckey] = per_dim

    # JVM-side literal projection, not a Python-list createDataFrame
    # (RDD-backed, one Python-worker roundtrip ≈ a scheduling floor)
    def _row(n_dims, mn, mx, mean, share):
        return spark.range(1).select(
            F.lit(n_dims).cast("long").alias("n_dims"),
            F.lit(mn).cast("double").alias("min_dim_var"),
            F.lit(mx).cast("double").alias("max_dim_var"),
            F.lit(mean).cast("double").alias("mean_dim_var"),
            F.lit(share).cast("long").alias("top_dim_var_share_ppm"),
        )

    if not per_dim:
        return _row(0, None, None, None, None)
    # var_num = n·Σv² − (Σv)² exact; var_den identical across dims
    # (every vector carries all 64 dims, so each group's n is the
    # corpus size)
    nums = []
    var_den = None
    for r in per_dim:
        n_i, s_i, s2_i = int(r["n"]), int(r["s"]), int(r["s2"])
        nums.append(n_i * s2_i - s_i * s_i)
        var_den = float(n_i * (n_i - 1))
    # floor `//`, not round-half-up: the pinned exact-integer-division
    # recipe (both operands non-negative, ≡ div()/DuckDB //)
    return _row(
        len(nums),
        min(float(m) / var_den for m in nums),
        max(float(m) / var_den for m in nums),
        float(sum(nums)) / (float(len(nums)) * var_den),
        (1_000_000 * max(nums)) // sum(nums),
    )


def embedding_space_diagnostics_sql() -> str:
    return """(
    WITH esd_per_dim AS (
        SELECT dim, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS s2
        FROM (
            SELECT i AS dim, qvec[i + 1] AS v
            FROM qnormed, unnest(generate_series(0, len(qvec) - 1)) AS u(i)
        )
        GROUP BY dim
    ),
    esd_nums AS (
        SELECT dim,
            CAST(n AS HUGEINT) * CAST(s2 AS HUGEINT)
                - CAST(s AS HUGEINT) * CAST(s AS HUGEINT) AS var_num,
            CAST(n * (n - 1) AS DOUBLE) AS var_den
        FROM esd_per_dim
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
        MIN(CAST(var_num AS DOUBLE) / var_den) AS min_dim_var,
        MAX(CAST(var_num AS DOUBLE) / var_den) AS max_dim_var,
        CAST(SUM(var_num) AS DOUBLE)
            / (CAST(COUNT(*) AS DOUBLE) * ANY_VALUE(var_den)) AS mean_dim_var,
        CAST((1000000 * MAX(var_num)) // SUM(var_num) AS BIGINT)
            AS top_dim_var_share_ppm
    FROM esd_nums
) s"""
