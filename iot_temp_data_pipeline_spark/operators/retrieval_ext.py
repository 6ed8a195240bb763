"""Round-8 retrieval extensions: late-interaction (MaxSim) scoring,
matryoshka prefix-dimension recall, and attribute-filtered vector
search.

Three retrieval shapes a production embedding stack adds on top of the
single-vector ANN family (similarity.py / pq.py / sq8.py):

- **Late interaction** (ColBERT-style MaxSim): documents and queries
  are *multi-vector* — one embedding per token/chunk — and the score is
  ``sum over query vectors of (max over doc vectors of cosine)``.
  Published as Khattab & Zaharia, "ColBERT: Efficient and Effective
  Passage Search via Contextualized Late Interaction" (SIGIR 2020).
- **Matryoshka truncation** (Kusupati et al., "Matryoshka
  Representation Learning", NeurIPS 2022): serving stacks truncate
  embeddings to a prefix of the trained dimension to cut index bytes;
  the recall sweep below measures exactly what that costs at this
  corpus, against the session-cached exact ground truth.
- **Filtered search**: top-k restricted to corpus vectors satisfying a
  metadata predicate (here: same ``label`` as the query). The classic
  vector-DB "filtered ANN" feature; expressed relationally the filter
  attribute *becomes the join key*, so Catalyst turns the O(N·Q) cross
  join into a hash join that only scores within-label pairs.

All scores derive from the exact integer-quantized dot products of
``similarity.quantized_corpus`` (every partial sum < 2^53 → the doubles
are bit-identical across engines), and every ranking/aggregation here
is over exact integers (micro-scaled floors of those bit-identical
doubles), so the DuckDB oracles pin results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import (
    ground_truth_topk,
    qcosine,
    qnorm2,
    quantized_corpus,
    sql_qcos,
)

# ---------------------------------------------------- late interaction

# Multi-vector layout over the embeddings fixture: consecutive groups of
# TOKENS_PER_DOC vectors form one "document" (the fixture has no native
# multi-vector column; a real corpus stores array<array<float>> or an
# exploded (doc_id, token_idx, vec) table — the layout below IS that
# exploded table, derived deterministically from vec_id).
MAXSIM_TOKENS_PER_DOC = 4
MAXSIM_QUERY_MOD = 25  # query docs: tdoc % 25 == 0
MAXSIM_K = 5
MAXSIM_MICROS = "1000000.0"  # micro-unit scale for the exact floor


def maxsim_topk(
    spark: SparkSession,
    sf_dir: str,
    tokens_per_doc: int = MAXSIM_TOKENS_PER_DOC,
    query_mod: int = MAXSIM_QUERY_MOD,
    k: int = MAXSIM_K,
) -> DataFrame:
    """Late-interaction top-k: score(q, d) = Σ_{qt∈q} max_{dt∈d}
    cos(qt, dt), computed over exact integers end to end.

    Per-pair cosines are floored to micro-units BEFORE the max/sum
    (floor of a bit-identical double is bit-identical; sums of longs
    are order-independent), so unlike a double-sum the score carries no
    summation-order risk and ranks identically in both engines.

    Physical shape: the query token set (|corpus|/query_mod docs ×
    tokens_per_doc vectors) is broadcast; the corpus token table is
    scanned ONCE; the MaxSim reduction is two hash aggregations with
    map-side combine — first keyed by (query_doc, corpus_doc,
    query_token) for the max, then by (query_doc, corpus_doc) for the
    sum — and a per-query top-k window. At 100 TB the corpus-token scan
    stays one pass, the shuffles are bounded by Q_docs·N_docs(·m) score
    rows, and the standard production composition routes through an
    IVF/PQ index on pooled (mean/[CLS]) vectors first so N_docs here is
    a shortlist, not the corpus — the same shortlist-then-refine
    lifecycle as sq8.knn_sq8_rerank."""
    emb, _ = quantized_corpus(spark, sf_dir)
    tok = emb.select(
        F.expr(f"vec_id div {tokens_per_doc}").alias("tdoc"),
        "vec_id",
        "qvec",
        "qnorm2",
    )
    q = tok.filter(F.col("tdoc") % query_mod == 0).select(
        F.col("tdoc").alias("q_tdoc"),
        F.col("vec_id").alias("q_vec"),
        F.col("qvec").alias("q_qvec"),
        F.col("qnorm2").alias("q_qnorm2"),
    )
    scored = (
        tok.crossJoin(F.broadcast(q))
        .filter(F.col("tdoc") != F.col("q_tdoc"))
        .select(
            "q_tdoc",
            "tdoc",
            "q_vec",
            F.floor(
                F.lit(float(MAXSIM_MICROS))
                * qcosine(
                    F.col("q_qvec"),
                    F.col("qvec"),
                    F.col("q_qnorm2"),
                    F.col("qnorm2"),
                )
            )
            .cast("long")
            .alias("ms"),
        )
    )
    tokmax = scored.groupBy("q_tdoc", "tdoc", "q_vec").agg(
        F.max("ms").alias("tok_ms")
    )
    sc = tokmax.groupBy("q_tdoc", "tdoc").agg(
        F.sum("tok_ms").alias("maxsim_micros")
    )
    w = Window.partitionBy("q_tdoc").orderBy(
        F.col("maxsim_micros").desc(), F.col("tdoc")
    )
    return sc.select(
        F.col("q_tdoc").alias("query_doc"),
        F.col("tdoc").alias("neighbor_doc"),
        "maxsim_micros",
        F.row_number().over(w).cast("long").alias("rank"),
    ).filter(F.col("rank") <= k)


def maxsim_topk_sql(
    tokens_per_doc: int = MAXSIM_TOKENS_PER_DOC,
    query_mod: int = MAXSIM_QUERY_MOD,
    k: int = MAXSIM_K,
) -> str:
    """DuckDB twin (expects the QUANT_SQL prelude): identical grouping,
    identical micro-floor, identical (score DESC, doc ASC) rank."""
    cos = sql_qcos("q.q_qvec", "t.qvec", "q.q_qnorm2", "t.qnorm2")
    return f"""(
    WITH li_tok AS (
        SELECT vec_id // {tokens_per_doc} AS tdoc, vec_id, qvec, qnorm2
        FROM qnormed
    ),
    li_q AS (
        SELECT tdoc AS q_tdoc, vec_id AS q_vec,
               qvec AS q_qvec, qnorm2 AS q_qnorm2
        FROM li_tok WHERE tdoc % {query_mod} = 0
    ),
    li_scored AS (
        SELECT q.q_tdoc, t.tdoc, q.q_vec,
            CAST(FLOOR({MAXSIM_MICROS} * ({cos})) AS BIGINT) AS ms
        FROM li_tok t CROSS JOIN li_q q
        WHERE t.tdoc != q.q_tdoc
    ),
    li_tokmax AS (
        SELECT q_tdoc, tdoc, q_vec, MAX(ms) AS tok_ms
        FROM li_scored GROUP BY 1, 2, 3
    ),
    li_sc AS (
        SELECT q_tdoc, tdoc, SUM(tok_ms) AS maxsim_micros
        FROM li_tokmax GROUP BY 1, 2
    )
    SELECT q_tdoc AS query_doc, tdoc AS neighbor_doc,
        CAST(maxsim_micros AS BIGINT) AS maxsim_micros,
        CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY q_tdoc ORDER BY maxsim_micros DESC, tdoc) AS rank
        FROM li_sc
    ) r
    WHERE rank <= {k}
) s"""


# ------------------------------------------- matryoshka recall sweep

MATRYOSHKA_DIMS = (16, 32, 64)  # fixture dim is 64; 64 anchors recall=1
MATRYOSHKA_QUERY_MOD = 100
MATRYOSHKA_K = 5


def matryoshka_recall(
    spark: SparkSession,
    sf_dir: str,
    dims: tuple[int, ...] = MATRYOSHKA_DIMS,
    query_mod: int = MATRYOSHKA_QUERY_MOD,
    k: int = MATRYOSHKA_K,
) -> DataFrame:
    """Recall@k of brute-force search over the first ``d`` embedding
    dimensions vs the full-dimension exact top-k, for each prefix d —
    the serving dial a matryoshka deployment tunes (half the index
    bytes ⇄ how much recall?). Ground truth is the session-cached
    exact top-k (ground_truth_topk — build once, serve every eval);
    each branch scans the corpus once with sliced vectors and recomputes
    prefix norms; the full-dimension branch doubles as a self-check
    (recall exactly 1). The mean is SUM(hits)/COUNT(*) in one division,
    so no summation-order risk."""
    bf = ground_truth_topk(spark, sf_dir, query_mod, k).select(
        "query_id", "neighbor_id"
    )
    out = None
    for d in dims:
        emb, _ = quantized_corpus(spark, sf_dir)
        tr = emb.select(
            "vec_id", F.slice("qvec", 1, d).alias("qvec")
        ).withColumn("qnorm2", qnorm2(F.col("qvec")))
        q = tr.filter(F.col("vec_id") % query_mod == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("qvec").alias("q_qvec"),
            F.col("qnorm2").alias("q_qnorm2"),
        )
        scored = (
            tr.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                qcosine(
                    F.col("q_qvec"),
                    F.col("qvec"),
                    F.col("q_qnorm2"),
                    F.col("qnorm2"),
                ).alias("cosine"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        approx = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id")
        )
        joined = bf.join(
            approx.withColumn("hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        r = joined.agg(
            F.countDistinct("query_id").alias("n_queries"),
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.count("*").cast("double")
            ).alias("mean_recall_at_k"),
        ).select(
            F.lit(d).cast("long").alias("prefix_dim"),
            "n_queries",
            "mean_recall_at_k",
        )
        out = r if out is None else out.unionByName(r)
    return out


def _matryoshka_branch_sql(d: int, query_mod: int, k: int) -> str:
    cos = sql_qcos("a.qvec", "b.qvec", "a.qnorm2", "b.qnorm2")
    return f"""(
    WITH tq{d} AS (
        SELECT vec_id, qvec[1:{d}] AS qvec,
            list_sum(list_transform(generate_series(1, {d}),
                     i -> qvec[i] * qvec[i])) AS qnorm2
        FROM qnormed
    ),
    qr{d} AS (
        SELECT vec_id AS query_id, qvec, qnorm2 FROM tq{d}
        WHERE vec_id % {query_mod} = 0
    ),
    ap{d} AS (
        SELECT query_id, neighbor_id FROM (
            SELECT a.query_id, b.vec_id AS neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY a.query_id
                    ORDER BY {cos} DESC, b.vec_id) AS rank
            FROM qr{d} a CROSS JOIN tq{d} b
            WHERE b.vec_id != a.query_id
        ) r WHERE rank <= {k}
    )
    SELECT CAST({d} AS BIGINT) AS prefix_dim,
        COUNT(DISTINCT bf.query_id) AS n_queries,
        CAST(SUM(CASE WHEN ap{d}.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_recall_at_k
    FROM mr_bf bf
    LEFT JOIN ap{d} ON bf.query_id = ap{d}.query_id
                   AND bf.neighbor_id = ap{d}.neighbor_id
) b{d}"""


def matryoshka_recall_sql(
    dims: tuple[int, ...] = MATRYOSHKA_DIMS,
    query_mod: int = MATRYOSHKA_QUERY_MOD,
    k: int = MATRYOSHKA_K,
) -> str:
    """Sweep oracle body (expects QUANT_SQL + an ``mr_bf`` CTE holding
    the exact full-dimension top-k pairs)."""
    return (
        "(\n    "
        + "\n    UNION ALL\n    ".join(
            f"SELECT * FROM {_matryoshka_branch_sql(d, query_mod, k)}"
            for d in dims
        )
        + "\n) mr"
    )


# ------------------------------------------------- filtered search

FILTERED_QUERY_MOD = 50
FILTERED_K = 5


def knn_label_filtered(
    spark: SparkSession,
    sf_dir: str,
    query_mod: int = FILTERED_QUERY_MOD,
    k: int = FILTERED_K,
) -> DataFrame:
    """Attribute-filtered exact top-k: neighbors restricted to corpus
    vectors sharing the query's ``label`` (the vector-DB "filtered
    ANN" / same-category retrieval feature). Relationally the metadata
    predicate IS the join key: instead of crossJoin-then-filter, the
    corpus joins the broadcast query set ON label, so only within-label
    pairs are ever scored — the selectivity of the filter prunes the
    score work, exactly like partition pruning prunes a scan. At 100 TB
    the same shape holds with the corpus bucketed by the filter
    attribute (or the label routed into per-label IVF cells), keeping
    filtered search a partition-local scan instead of a post-filter
    over an unfiltered candidate list."""
    emb, _ = quantized_corpus(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("qvec").alias("q_qvec"),
        F.col("qnorm2").alias("q_qnorm2"),
    )
    scored = (
        emb.join(
            F.broadcast(q),
            (F.col("label") == F.col("q_label"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").cast("long").alias("label"),
            qcosine(
                F.col("q_qvec"),
                F.col("qvec"),
                F.col("q_qnorm2"),
                F.col("qnorm2"),
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def knn_label_filtered_sql(
    query_mod: int = FILTERED_QUERY_MOD, k: int = FILTERED_K
) -> str:
    cos = sql_qcos("a.qvec", "b.qvec", "a.qnorm2", "b.qnorm2")
    return f"""(
    WITH fq AS (
        SELECT vec_id AS query_id, label AS q_label, qvec, qnorm2
        FROM qnormed WHERE vec_id % {query_mod} = 0
    ),
    fscored AS (
        SELECT a.query_id, b.vec_id AS neighbor_id,
            CAST(b.label AS BIGINT) AS label, {cos} AS cosine
        FROM fq a JOIN qnormed b
          ON b.label = a.q_label AND b.vec_id != a.query_id
    )
    SELECT query_id, neighbor_id, label, cosine, CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM fscored
    ) r
    WHERE rank <= {k}
) s"""
