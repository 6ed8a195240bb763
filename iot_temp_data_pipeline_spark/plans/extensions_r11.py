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
    exact int64 distances match bit-for-bit. Recall ≥ the residual-free
    knn_ivfpq_adc on the shared exact ground truth is pinned in
    tests/test_r11_ops.py."""
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
