"""Round-11 query specs: the delta-crawl corpus-refresh composition
(VERDICT r10 #4) — the end-to-end admission pipeline over this crawl's
increment (exact dedup + winnowing near-dup + history-LM surprisal
gate + co-batch contamination audit), batch form here; the streamed
twin lives in plans/streaming_specs.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import refresh as rf
from .registry import ColSpec, QuerySpec, shape, sql_select

EXTENSIONS_R11: dict[str, QuerySpec] = {}


REFRESH_SPEC: ColSpec = [
    ("doc_id", "long"),
    ("n_exact", "long"),
    ("n_fp", "long"),
    ("best_overlap_permille", "long"),
    ("n_bigrams", "long"),
    ("n_oov", "long"),
    ("mean_centibits", "long"),
    ("action", ""),
    ("co_batch_dup", "long"),
]


def _corpus_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per increment document with all three admission gates
    and the post-admission contamination flag. The history artifacts
    are frozen session tables (their builds carry their own measured
    registry rows: doc_fingerprints_winnowing for the fingerprint
    index, dedup_winnowing_pair_index for the pair table); the row's
    own work is the increment-proportional probe cost — the thing a
    crawl pays daily."""
    return shape(rf.corpus_refresh_report(spark, sf_dir), REFRESH_SPEC)


def _corpus_refresh_oracle() -> str:
    from ..operators.dedup import CORPUS_SQL

    return "WITH " + CORPUS_SQL.strip() + sql_select(
        REFRESH_SPEC, rf.corpus_refresh_sql()
    )


EXTENSIONS_R11["corpus_refresh_report"] = QuerySpec(
    _corpus_refresh, _corpus_refresh_oracle()
)


# ---------------- add-one-smoothed trigram LM gate (VERDICT r10 #5)

TRIGRAM_SPEC: ColSpec = [
    ("doc_id", "long"),
    ("n_trigrams", "long"),
    ("n_unseen", "long"),
    ("total_bits", "long"),
    ("mean_centibits", "long"),
]


def _trigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet-shaped gate: score the increment (doc_id % 3 == 0 of
    the documents table) under the add-one-smoothed trigram model of
    the HISTORY side — the split that actually exercises the smoothing
    (self-scoring never sees an unseen n-gram)."""
    from ..operators import text_analysis as ta
    from ..sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    inc = docs.filter(F.col("doc_id") % ta.WINNOW_INC_MOD == 0)
    hist = docs.filter(F.col("doc_id") % ta.WINNOW_INC_MOD != 0)
    return shape(ta.trigram_surprisal_per_doc(inc, hist), TRIGRAM_SPEC)


def _trigram_oracle() -> str:
    from ..operators.text_analysis import trigram_surprisal_sql

    return sql_select(TRIGRAM_SPEC, trigram_surprisal_sql("documents"))


EXTENSIONS_R11["quality_trigram_surprisal"] = QuerySpec(
    _trigram_surprisal, _trigram_oracle()
)


# ---------------- residual IVF-PQ (FAISS IVFADC, VERDICT r10 #6)

IVFPQ_RES_SPEC: ColSpec = [
    ("query_id", "long"),
    ("neighbor_id", "long"),
    ("adc_dist", "long"),
    ("rank", "long"),
]


def _knn_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-encoded IVF-PQ (operators/pq.knn_ivfpq_residual): codes
    quantize ``uvec − ucent(cell)`` — the actual FAISS IVFADC coupling
    — with a per-(query, probed cell) residual LUT. The oracle
    re-derives cells, residuals, and the residual codebook in SQL;
    exact int64 distances match bit-for-bit. Accuracy posture: on the
    ISOTROPIC fixture the coupling's premise fails (residual norms
    exceed raw norms — see residual_pq_index's measured finding), so
    ivfpq_residual_recall shows parity/noise here; the coupling's
    benefit is pinned on clustered data in tests/test_r11_ops.py."""
    from ..operators import pq

    return shape(pq.knn_ivfpq_residual(spark, sf_dir), IVFPQ_RES_SPEC)


def _ivfpq_residual_oracle() -> str:
    from ..operators import pq, similarity as sim

    return (
        "WITH "
        + sim.QUANT_SQL.strip()
        + ",\n"
        + pq.pq_cte_sql().strip()
        + ",\n"
        + pq.ivfpq_cte_sql().strip()
        + ",\n"
        + pq.residual_cte_sql().strip()
        + "\n"
        + sql_select(IVFPQ_RES_SPEC, pq.knn_ivfpq_residual_sql())
    )


EXTENSIONS_R11["knn_ivfpq_residual"] = QuerySpec(
    _knn_ivfpq_residual, _ivfpq_residual_oracle()
)


# -------- residual-vs-flat IVFADC recall dial (driver-witnessed form
# of the tests/test_r11_ops.py acceptance bar)

IVFPQ_RECALL_SPEC: ColSpec = [
    ("variant", ""),
    ("n_queries", "long"),
    ("hits", "long"),
    ("possible", "long"),
    ("recall_permille", "long"),
]


def _ivfpq_residual_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of BOTH IVFADC variants against the shared brute-force
    ground truth, one row each — the dial that justifies the residual
    coupling (the ann_recall_check / bm25_impact_recall pattern:
    deterministic pipelines, so recall is a fixed exact-integer number
    the oracle recomputes). All three inputs serve from session caches;
    the comparison itself is two ground-truth-sized left joins + 1-row
    digests."""
    from ..operators import pq
    from ..operators import similarity as sim

    bf = sim.ground_truth_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )

    def leg(approx: DataFrame, name: str) -> DataFrame:
        joined = bf.join(
            approx.select("query_id", "neighbor_id").withColumn(
                "hit", F.lit(1)
            ),
            ["query_id", "neighbor_id"],
            "left",
        )
        return joined.agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("hits"),
            F.count("*").alias("possible"),
        ).select(
            F.lit(name).alias("variant"),
            "n_queries",
            "hits",
            "possible",
            F.expr("div(1000 * hits, possible)").alias("recall_permille"),
        )

    out = leg(pq.knn_ivfpq(spark, sf_dir), "flat").unionByName(
        leg(pq.knn_ivfpq_residual(spark, sf_dir), "residual")
    )
    return shape(out.orderBy("variant"), IVFPQ_RECALL_SPEC)


def _ivfpq_residual_recall_oracle() -> str:
    from ..operators import pq, similarity as sim

    def leg_sql(approx_sql: str, name: str) -> str:
        return f"""
    SELECT '{name}' AS variant,
        COUNT(DISTINCT bf.query_id) AS n_queries,
        SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS hits,
        COUNT(*) AS possible,
        (1000 * SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END))
            // COUNT(*) AS recall_permille
    FROM (SELECT query_id, neighbor_id FROM {sim.knn_brute_force_sql()}) bf
    LEFT JOIN (SELECT query_id, neighbor_id FROM {approx_sql}) a
        ON bf.query_id = a.query_id AND bf.neighbor_id = a.neighbor_id"""

    body = f"""(
    SELECT * FROM (
        {leg_sql(pq.knn_ivfpq_sql(), "flat")}
        UNION ALL
        {leg_sql(pq.knn_ivfpq_residual_sql(), "residual")}
    ) u ORDER BY variant
) s"""
    return (
        "WITH "
        + sim.QUANT_SQL.strip()
        + ",\n"
        + pq.pq_cte_sql().strip()
        + ",\n"
        + pq.ivfpq_cte_sql().strip()
        + ",\n"
        + pq.residual_cte_sql().strip()
        + "\n"
        + sql_select(IVFPQ_RECALL_SPEC, body)
    )


EXTENSIONS_R11["ivfpq_residual_recall"] = QuerySpec(
    _ivfpq_residual_recall, _ivfpq_residual_recall_oracle()
)


# -------- residual IVFADC + exact refine (the full production serve)

IVFPQ_RERANK_SPEC: ColSpec = [
    ("query_id", "long"),
    ("neighbor_id", "long"),
    ("cosine", ""),
    ("rank", "long"),
]


def _knn_ivfpq_residual_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAISS IndexIVFPQ+refine: residual-ADC top-R shortlist → exact
    quantized-cosine rerank of only the shortlisted vectors (Q·R raw
    rows regardless of corpus size). The refine stage is how
    production neutralizes code-quality sensitivity — including the
    isotropy effect measured on the plain residual serve."""
    from ..operators import pq

    return shape(
        pq.knn_ivfpq_residual_rerank(spark, sf_dir), IVFPQ_RERANK_SPEC
    )


def _ivfpq_residual_rerank_oracle() -> str:
    from ..operators import pq, similarity as sim

    return (
        "WITH "
        + sim.QUANT_SQL.strip()
        + ",\n"
        + pq.pq_cte_sql().strip()
        + ",\n"
        + pq.ivfpq_cte_sql().strip()
        + ",\n"
        + pq.residual_cte_sql().strip()
        + "\n"
        + sql_select(IVFPQ_RERANK_SPEC, pq.knn_ivfpq_residual_rerank_sql())
    )


EXTENSIONS_R11["knn_ivfpq_residual_rerank"] = QuerySpec(
    _knn_ivfpq_residual_rerank, _ivfpq_residual_rerank_oracle()
)


# -------- DPR-style BM25 hard-negative mining with near-dup exclusion

HN_SPEC: ColSpec = [
    ("query_id", "long"),
    ("doc_id", "long"),
    ("score_scaled", "long"),
    ("rank", "long"),
]


def _bm25_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negative mining (Karpukhin et al. 2020):
    top-k BM25 candidates per query doc with verified near-duplicates
    excluded via the winnowing pair index — the false-negative cut
    applied at mining time. Composes two session artifacts (BM25
    postings, near-dup pair table); both builds carry their own
    measured rows."""
    from ..operators.retrieval_ext import bm25_hard_negatives

    return shape(bm25_hard_negatives(spark, sf_dir), HN_SPEC)


def _bm25_hard_negatives_oracle() -> str:
    from ..operators.dedup import CORPUS_SQL
    from ..operators.retrieval_ext import bm25_hard_negatives_sql

    return "WITH " + CORPUS_SQL.strip() + sql_select(
        HN_SPEC, bm25_hard_negatives_sql()
    )


EXTENSIONS_R11["bm25_hard_negatives"] = QuerySpec(
    _bm25_hard_negatives, _bm25_hard_negatives_oracle()
)
